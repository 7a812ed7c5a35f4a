package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Dev scratch: why does exploding the shingle array cost 50x the
  * array construction? Tests generate-codegen and evaluation-
  * duplication hypotheses.
  */
object ProfileQ83C {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(name: String, warm: Int = 1)(f: => DataFrame): Unit = {
      (1 to warm).foreach(_ => noop(f))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-40s ${times.min}%7.2f s")
    }

    val sh = docs.select(col("doc_id"), col("source"),
      shingles(words(col("text")), 2).as("sg"))
    // 1: current shape
    val ex1 = sh.select(col("doc_id"), explode(col("sg")).as("bg"))
    time("explode (collapsed projection)")(ex1)
    println(ex1.queryExecution.executedPlan.toString.take(1500))
    // 2: checkpointed array column (true materialization barrier)
    val mat = sh.localCheckpoint(true)
    time("explode (materialized input)")(
      mat.select(col("doc_id"), explode(col("sg")).as("bg")))
    // 3: plain split words explode (q20 shape) for baseline
    time("explode words (no shingles)")(
      docs.select(col("doc_id"), explode(words(col("text"))).as("w")))
    // 4: shingles without the when() guard
    val shNoWhen = docs.select(col("doc_id"),
      transform(sequence(lit(0), greatest(size(words(col("text"))) - 2, lit(-1))),
        i => concat(element_at(words(col("text")), i + 1), lit(" "),
          element_at(words(col("text")), i + 2))).as("sg"))
    time("explode (no when guard)")(
      shNoWhen.select(col("doc_id"), explode(col("sg")).as("bg")))
    mat.unpersist()
    spark.stop()
  }
}
