package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._
import graft.operators.TextOps

/** Dev scratch: where do q83's seconds go — the tokenize/explode
  * pass, the doc_id repartition, the model fits, or the scoring
  * join?
  */
object ProfileQ83 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    println("docs=" + docs.count())

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(name: String, warm: Int = 1)(f: => DataFrame): Unit = {
      (1 to warm).foreach(_ => noop(f))
      val t0 = System.nanoTime()
      noop(f)
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val buckets = 4096
    val bigr = docs
      .select(col("doc_id"), col("source"),
        explode(shingles(words(col("text")), 2)).as("bg"))
    time("bigram explode only")(bigr)
    val hashed = bigr.select(col("doc_id"), col("source"),
      pmod(hash60(col("bg")), lit(buckets.toLong)).as("b"))
    time("+ hash60 bucket")(hashed)
    val perDoc = hashed.repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("n"))
    time("perDoc agg (repartition)")(perDoc)
    val perDocNoRep = hashed
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("n"))
    time("perDoc agg (plain groupBy)")(perDocNoRep)
    time("q83 full (current)")(TextOps.dsirSelect(docs))
    val p = TextOps.dsirSelect(docs).queryExecution.executedPlan.toString
    println("ReusedExchange=" + "ReusedExchange".r.findAllIn(p).size +
      " Exchange=" + "Exchange".r.findAllIn(p).size +
      " FileScan=" + "FileScan".r.findAllIn(p).size)
    spark.stop()
  }
}
