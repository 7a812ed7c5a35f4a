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
      "q125" -> q125, "q11" -> q11, "probe" -> probe, "q83" -> q83,
      "scanpar" -> scanpar)
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

  /** q83 dsir_select: the explicit token-scale repartition(doc_id)
    * (one raw exchange both consumers reuse) vs letting the
    * (doc_id, source, b) groupBy exchange PARTIAL-AGGREGATED rows
    * (smaller shuffle, still one reused exchange). */
  private def q83(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    time("q83 current (repartition doc_id)")(
      graft.SparkEntry.queries("q83_dsir_select")(spark, d))
    def flog2(c: Column): Column = length(bin(c)) - 1
    def variant(): DataFrame = {
      val buckets = 4096; val topN = 100; val targetSource = "src0"
      val perDoc = docs
        .select(col("doc_id"), col("source"),
          explode(shingles(words(col("text")), 2)).as("bg"))
        .select(col("doc_id"), col("source"),
          pmod(hash60(col("bg")), lit(buckets.toLong)).as("b"))
        .groupBy(col("doc_id"), col("source"), col("b"))
        .agg(count(lit(1)).as("n"))
      val marginals = perDoc.groupBy(col("b"))
        .agg(sum(col("n")).as("cr"),
          sum(when(col("source") === targetSource, col("n"))).as("ct"))
      val model = marginals
        .select(col("b"),
          (flog2(coalesce(col("ct"), lit(0L)) + 1) -
            flog2(col("cr") + 1)).as("lam"))
      val shift = marginals.agg(
        (flog2(sum(col("cr")) + buckets) -
          flog2(coalesce(sum(col("ct")), lit(0L)) + buckets)).as("c0"))
      val scored = perDoc
        .join(broadcast(model), "b")
        .crossJoin(broadcast(shift))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_feats"),
          sum(col("n") * (col("lam") + col("c0"))).as("logw"))
      val top = scored.groupBy()
        .agg(graft.functions.Aggregators.topK(topN)(
          col("logw").cast("double"), col("doc_id")).as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("doc_id"),
          (col("pos") + 1).cast("int").as("rn"))
      scored.join(broadcast(top), "doc_id")
        .select(col("doc_id"), col("n_feats"), col("logw"), col("rn"))
    }
    time("q83 variant (natural partial-agg exchange)")(variant())
  }

  /** Scan parallelism: every sf parquet is ONE row group, so the
    * scan-side map work (tokenize/shingle/hash — the expensive part of
    * every text query) runs in ONE task no matter the core count.
    * Measure representative shapes with and without a round-robin
    * repartition right after the scan. */
  private def scanpar(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    val par = spark.sparkContext.defaultParallelism
    def gramAgg(src: DataFrame): DataFrame = src
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode_outer(shingles(col("w"), 3)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), hash60(col("s")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
    time("gram+hash+agg, scan-parallel (1 task)")(gramAgg(docs))
    time(s"gram+hash+agg, repartition($par) first")(
      gramAgg(docs.repartition(par)))
    def mapOnly(src: DataFrame): DataFrame = src
      .select(col("doc_id"),
        size(shingles(words(col("text")), 3)).as("n"),
        length(normText(col("text"))).as("len"))
    time("map-only normalize pass, scan-parallel")(mapOnly(docs))
    time(s"map-only normalize pass, repartition($par)")(
      mapOnly(docs.repartition(par)))
    time("q27 simhash whole, as-is")(
      graft.SparkEntry.queries("q27_simhash")(spark, d))
    time("q29 jaccard whole, as-is")(
      graft.SparkEntry.queries("q29_jaccard_pairs")(spark, d))
  }
}
