package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Round-14 optimization scratch harness: section per experiment,
  * bench discipline (min-of-2 noop after a warm run). Findings land
  * in OPTIMIZATION_r14.md; sections stay runnable to reproduce.
  */
object Profile14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.configure(spark)
    val sections: Map[String, SparkSession => Unit] = Map(
      "hash" -> hash, "words" -> wordsSection, "stages" -> stages,
      "q125" -> q125, "q11" -> q11, "probe" -> probe)
    val run = if (args.isEmpty) sections.keys.toSeq.sorted else args.toSeq
    run.foreach { s =>
      println(s"== section $s")
      sections.getOrElse(s, (_: SparkSession) => sys.error(
        s"unknown section $s (have ${sections.keys.toSeq.sorted})"))(spark)
    }
    spark.stop()
  }

  private val d = "/root/testdata/sf0.1"

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def time(name: String, warm: Int = 1)(f: => DataFrame): Unit = {
    (1 to warm).foreach(_ => noop(f))
    val times = (1 to 2).map { _ =>
      System.gc()
      val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9 }
    println(f"$name%-52s ${times.min}%7.2f s (runs: ${
      times.map(t => f"$t%.2f").mkString(", ")})")
  }

  /** Old composite md5-prefix spelling, kept here verbatim for the
    * A/B against [[graft.functions.Md5PrefixLong]]. */
  private def oldH60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  private def oldH32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Cost of the hash spelling alone, on the real corpus gram stream:
    * same explode, same downstream xor-agg, only the hash node swaps. */
  private def hash(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    def grams = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode_outer(shingles(col("w"), 3)).as("s"))
      .filter(col("s").isNotNull)
    time("grams only (no hash)")(grams)
    time("grams + OLD h60 composite")(
      grams.select(col("doc_id"), oldH60(col("s")).as("h")))
    time("grams + NEW h60 Md5PrefixLong")(
      grams.select(col("doc_id"),
        graft.functions.HashExpressions.md5Prefix(col("s"), 15).as("h")))
    time("grams + OLD h32 composite")(
      grams.select(col("doc_id"), oldH32(col("s")).as("h")))
    time("grams + NEW h32 Md5PrefixLong")(
      grams.select(col("doc_id"),
        graft.functions.HashExpressions.md5Prefix(col("s"), 8).as("h")))
  }

  /** Where does the tokenize step spend: regex normalize, split, or
    * the shingle assembly? */
  private def wordsSection(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    time("scan only (text)")(docs.select(length(col("text")).as("n")))
    time("lower only")(docs.select(length(lower(col("text"))).as("n")))
    time("normText (regex collapse)")(
      docs.select(length(normText(col("text"))).as("n")))
    time("words (normText + split)")(
      docs.select(size(words(col("text"))).as("n")))
    time("words + shingles3")(
      docs.select(size(shingles(words(col("text")), 3)).as("n")))
  }

  /** Per-stage decomposition of the slowest queries (q87 family). */
  private def stages(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    time("q87 whole")(graft.SparkEntry.queries("q87_minhash_recall")(spark, d))
    time("q87 cand arm (minhashPairs)")(
      graft.operators.Dedup.minhashPairs(docs))
    time("q87 truth arm (ngramJaccardPairs)")(
      graft.operators.Dedup.ngramJaccardPairs(docs, 0.8))
  }

  /** q125 decontaminate: gram-explode + index join (the default)
    * vs the fused frozen-index map-only probe — re-measured on the
    * round-14 tree (the fused path's shingle+hash cost just dropped
    * 3-4× with the fused expression nodes; the round-8 A/B that made
    * the join path the default predates them). */
  private def q125(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    time("q125 join path")(
      graft.operators.TextOps.decontaminate(docs, fusedProbe = Some(false)))
    time("q125 fused frozen-index probe (default, r14)")(
      graft.operators.TextOps.decontaminate(docs, fusedProbe = Some(true)))
    time("q55 contamination join path (default)")(
      graft.operators.TextOps.contamination(docs, fusedProbe = Some(false)))
    time("q55 contamination fused probe")(
      graft.operators.TextOps.contamination(docs, fusedProbe = Some(true)))
  }

  /** q11 hot users: rank-window vs bounded TopK aggregate. */
  private def q11(spark: SparkSession): Unit = {
    val ev = Tables.events(spark, d)
    ev.count()
    time("q11 current")(graft.SparkEntry.queries("q11_hot_users")(spark, d))
  }

  /** probe/BPE family: where do the driver-loop seconds go —
    * feature extraction+checkpoint, or the per-iteration jobs? */
  private def probe(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    time("q102 probe_train whole")(
      graft.SparkEntry.queries("q102_probe_train")(spark, d))
    time("q110 probe_auc whole")(
      graft.SparkEntry.queries("q110_probe_auc")(spark, d))
    time("q101 bpe_train whole")(
      graft.SparkEntry.queries("q101_bpe_train")(spark, d))
    time("q103 bpe_encode whole")(
      graft.SparkEntry.queries("q103_bpe_encode")(spark, d))
  }
}
