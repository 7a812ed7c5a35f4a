package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._
import graft.operators.Dedup

/** Round-13 optimization scratch harness: section per experiment,
  * bench discipline (min-of-2 noop after a warm run). Findings land
  * in OPTIMIZATION_r13.md; sections stay runnable to reproduce.
  */
object Profile13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sections: Map[String, SparkSession => Unit] = Map(
      "q29cand" -> q29cand, "minpart" -> minpart)
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
      System.gc() // Bench discipline: drain cleanup outside the window
      val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9 }
    println(f"$name%-44s ${times.min}%7.2f s (runs: ${
      times.map(t => f"$t%.2f").mkString(", ")})")
  }

  /** AQE coalescing strangles CPU-heavy small-byte stages locally
    * (q29cand finding). minPartitionSize=64k keeps local parallelism
    * at the core count while leaving ≫1 MB production partitions
    * untouched — A/B the heavy CPU queries under both settings. */
  private def minpart(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    val qs = Seq("q29_jaccard_pairs", "q66_containment",
      "q128_jaccard_profile", "q113_winnow_pairs",
      "q53_dedup_keep", "q64_dup_sources")
    for (sz <- Seq("256k", "128k", "512k")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", sz)
      for (q <- qs)
        time(s"$q @minPartitionSize=$sz")(graft.SparkEntry.queries(q)(spark, d))
    }
  }

  /** Where does q29's dominant "candidates" stage spend its time —
    * bucket agg, codegen pair explode, or the pair distinct? */
  private def q29cand(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, d)
    docs.count()
    val inv = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode_outer(shingles(col("w"), 3)).as("shingle"))
      .filter(col("shingle").isNotNull)
      .select(col("doc_id"), hash60(col("shingle")).as("sh"))
    val buckets = inv
      .groupBy(col("sh"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 100))
    val exploded = buckets
      .select(explode_outer(graft.functions.VectorExpressions.sortedArrayPairs(col("ids"))).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.a").as("a"), col("p.b").as("b"))
    time("bucket agg only")(buckets.select(size(col("ids")).as("n")))
    time("+ codegen pair explode")(exploded)
    time("+ distinct (current q29 cands)")(exploded.distinct())
    // repartition the exploded pairs before distinct: does the skew
    // rebalance claim hold, or is the distinct itself the cost?
    time("+ distinct w/ 128 parts")(
      exploded.repartition(128, col("a"), col("b"))
        .dropDuplicates("a", "b"))
    // collect_set dedups (doc,sh) repeats; LIST + array_distinct after?
    val bucketsList = inv
      .groupBy(col("sh"))
      .agg(array_sort(array_distinct(collect_list(col("doc_id")))).as("ids"))
      .filter(size(col("ids")).between(2, 100))
    time("bucket agg via collect_list+distinct")(
      bucketsList.select(size(col("ids")).as("n")))
    // Is AQE byte-based coalescing strangling the CPU-heavy pair
    // stages (tiny bytes, big compute)?
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    time("distinct, AQE coalesce OFF")(exploded.distinct())
    time("q29 full, AQE coalesce OFF")(Dedup.ngramJaccardPairs(docs, 0.8))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    time("q29 full, AQE coalesce ON")(Dedup.ngramJaccardPairs(docs, 0.8))
    // parallelism floor instead of full disable: keep coalescing but
    // never below the cluster's core count
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("q29 full, parallelismFirst")(Dedup.ngramJaccardPairs(docs, 0.8))
  }
}
