package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Aggregators, Portable}
import graft.functions.Portable._
import graft.operators.Corpus

/** Dev scratch: where do q58's seconds go? */
object ProfileQ58 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => DataFrame): Unit = {
      noop(f)
      val t0 = System.nanoTime()
      noop(f)
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // ws in its own projection — inlining words() into the shingle
    // lambda re-runs the regex split per element (measured 6.3 s for
    // this stage alone vs 0.5 s materialized)
    val grams = docs.select(col("source"), words(col("text")).as("ws"))
      .select(col("source"), explode_outer(shingles(col("ws"), 2)).as("g"))
      .filter(col("g").isNotNull)
    time("a: bigrams")(grams)
    val hashed = grams.select(col("source"), hash60(col("g")).as("h"))
    time("b: + hash60")(hashed)
    time("c: + groupBy count (no sketch)")(
      hashed.groupBy("source").agg(count(lit(1))))
    time("d: + bottomKDistinct")(
      hashed.groupBy("source").agg(
        Aggregators.bottomKDistinct(16)(col("h"))))
    time("e: full q58")(Corpus.vocabSketch(docs))
  }
}
