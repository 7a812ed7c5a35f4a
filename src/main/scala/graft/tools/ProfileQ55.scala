package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._
import graft.operators.TextOps

/** Dev scratch: where do q55's seconds go? */
object ProfileQ55 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => DataFrame): Unit = {
      noop(f)
      val t0 = System.nanoTime()
      noop(f)
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val ws = docs.select(col("doc_id"), words(col("text")).as("ws"))
    time("a: words")(ws)
    val sh = ws.select(col("doc_id"), shingles(col("ws"), 5).as("gs"))
    time("b: shingles array")(sh.select(col("doc_id"), size(col("gs")).as("n")))
    val dis = ws.select(col("doc_id"), array_distinct(shingles(col("ws"), 5)).as("gs"))
    time("c: + array_distinct")(dis.select(col("doc_id"), size(col("gs")).as("n")))
    time("d: + size AND explode")(dis
      .select(col("doc_id"), size(col("gs")).as("n_grams"), explode(col("gs")).as("g")))
    time("e: + hash60")(dis
      .select(col("doc_id"), size(col("gs")).as("n_grams"), explode(col("gs")).as("g"))
      .select(col("doc_id"), col("n_grams"), hash60(col("g")).as("gh")))
    time("f: full q55")(TextOps.contamination(docs))

    dis.select(col("doc_id"), size(col("gs")).as("n_grams"), explode(col("gs")).as("g"))
      .explain("formatted")
    spark.stop()
  }
}
