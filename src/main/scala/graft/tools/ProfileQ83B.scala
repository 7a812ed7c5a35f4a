package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Dev scratch: isolate the q83 bigram-pass cost — scan parallelism,
  * explode, md5, and the per-piece timings at tighter grain.
  */
object ProfileQ83B {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    println("docs=" + docs.count() + " scanParts=" + docs.rdd.getNumPartitions)

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(name: String, warm: Int = 1)(f: => DataFrame): Unit = {
      (1 to warm).foreach(_ => noop(f))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-36s ${times.min}%7.2f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("scan+count only")(docs.select(col("doc_id")))
    val w = docs.select(col("doc_id"), col("source"), words(col("text")).as("w"))
    time("words only")(w)
    time("words size")(w.select(col("doc_id"), size(col("w")).as("n")))
    val sh = w.select(col("doc_id"), col("source"), shingles(col("w"), 2).as("sg"))
    time("shingles array")(sh)
    val ex = sh.select(col("doc_id"), col("source"), explode(col("sg")).as("bg"))
    time("explode")(ex)
    time("explode repartitioned")(
      docs.repartition(32).select(col("doc_id"), col("source"),
        explode(shingles(words(col("text")), 2)).as("bg")))
    time("+ md5 hash")(ex.select(col("doc_id"),
      pmod(hash60(col("bg")), lit(4096L)).as("b")))
    spark.stop()
  }
}
