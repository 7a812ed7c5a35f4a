package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Dev scratch: q34 kmeans mean-computation variants — posexplode vs
  * 64 decimal column sums vs 64 long sums (overflow-unsafe straw man).
  */
object ProfileQ34 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val pow52 = 4503599627370496.0
    val base = Tables.embeddings(spark, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    println("rows = " + base.count())
    val assigned = base.select(pmod(col("vec_id"), lit(37)).as("centroid"),
      col("emb")).persist()
    assigned.count()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: DataFrame): Unit = {
      noop(df) // warm: codegen+JIT
      val t0 = System.nanoTime()
      noop(df)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    time("posexplode (centroid,dim)")(
      assigned.select(col("centroid"), posexplode(col("emb")))
        .toDF("centroid", "pos", "v")
        .groupBy(col("centroid"), (col("pos") + 1).cast("long").as("dim"))
        .agg(((sum(floor(col("v") * pow52).cast("decimal(38,0)"))
          .cast("double") / pow52) / count(lit(1))).as("mean")))

    time("64 decimal col sums")(
      assigned.groupBy(col("centroid"))
        .agg(count(lit(1)).as("n"), (0 until 64).map(i =>
          sum(floor(element_at(col("emb"), i + 1) * pow52)
            .cast("decimal(38,0)")).as(s"s$i")): _*))

    time("64 long col sums (unsafe)")(
      assigned.groupBy(col("centroid"))
        .agg(count(lit(1)).as("n"), (0 until 64).map(i =>
          sum(floor(element_at(col("emb"), i + 1) * pow52).cast("long"))
            .as(s"s$i")): _*))

    time("proj then 64 decimal sums")(
      assigned.select(Seq(col("centroid")) ++ (0 until 64).map(i =>
          floor(element_at(col("emb"), i + 1) * pow52)
            .cast("decimal(38,0)").as(s"v$i")): _*)
        .groupBy(col("centroid"))
        .agg(count(lit(1)).as("n"), (0 until 64).map(i =>
          sum(col(s"v$i")).as(s"s$i")): _*))
    spark.stop()
  }
}
