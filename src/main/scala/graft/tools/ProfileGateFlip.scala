package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Gate-flip evidence (SCALE.md): the 1 GiB broadcast gates must flip
  * to the shuffled plan AUTOMATICALLY from real scan stats — through
  * round 5 the flip was only ever forced with `Some(false)` overrides;
  * below-threshold runs observed the broadcast side only.
  *
  * Method: pad every sf0.1 document with a unique ~230 KB
  * incompressible hex blob carried in a SEPARATE `pad` column. The
  * parquet BYTES cross the 1 GiB gate (the gate reads the source
  * scan's stats = file size, before the op's own projections prune
  * columns), while the text/token geometry stays bench-sized so the
  * shuffled parity runs finish in seconds. The blob must NOT ride
  * inside `text`: as one extra token it enters every word set, and
  * the shuffled fallback's second join re-shuffles join #1's output —
  * ~1M candidate pairs each dragging a 230 KB word array ≈ a 230 GB
  * shuffle write (measured: filled the disk). At real scale that
  * width is the true document width and is ProfileScale's concern;
  * this tool isolates the gate DECISION and result parity. Then for
  * each gated op (q29 jaccard, q43 apply, q53 keepers, q55
  * contamination):
  *
  *   1. `Dedup.wouldBroadcastSource` must report false (gate flipped
  *      by stats alone);
  *   2. the un-overridden plan must carry the shuffled fallback join —
  *      checked with AQE's small-table auto-broadcast neutralized
  *      (autoBroadcastJoinThreshold=-1, the PlanSpec discipline) so
  *      the assertion sees OUR gate, not Spark's;
  *   3. the un-overridden RESULT must row-hash equal to the
  *      forced-broadcast override's on the same data — the path every
  *      below-gate oracle run has proven. The hash is an
  *      order-independent sum of md5 prefixes over all columns.
  */
object ProfileGateFlip {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gatePath = "/tmp/graft_gate/documents.parquet"
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"),
        // 7200 md5s = ~230 KB of hex per doc with no repeats for
        // snappy to bite on (sf0.1 is 5k docs -> ~1.15 GB total);
        // md5(doc_id|i) makes every blob unique across docs
        concat_ws("", transform(sequence(lit(1), lit(7200)),
          i => md5(concat(col("doc_id"), lit("|"), i)))).as("pad"))
      .write.mode("overwrite").parquet(gatePath)

    val docs = spark.read.parquet(gatePath)
    val stats = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val gate = BigInt(1L << 30)
    println(s"padded corpus scan stats: $stats bytes (gate $gate)")
    require(stats > gate, s"corpus did not cross the gate: $stats")
    require(!Dedup.wouldBroadcastSource(docs),
      "gate probe still says broadcast above 1 GiB")
    // control: the unpadded corpus sits below the gate
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    require(Dedup.wouldBroadcastSource(base),
      "gate probe says shuffled below 1 GiB")

    val ops: Seq[(String, Option[Boolean] => DataFrame)] = Seq(
      "q29_jaccard_pairs" ->
        (o => Dedup.ngramJaccardPairs(docs, 0.8, broadcastLookup = o)),
      "q53_dedup_keep" ->
        (o => Dedup.dedupKeepers(docs, broadcastGroups = o)),
      "q43_dedup_apply" ->
        (o => Dedup.dedupApply(docs, broadcastGroups = o)),
      "q55_contamination" ->
        (o => TextOps.contamination(docs, broadcastIndex = o)),
      "q97_subword" ->
        (o => TextOps.subwordEncode(docs, broadcastEncodings = o)))

    // 2. plan shape: the auto plan shows the shuffled fallback
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try for ((name, op) <- ops) {
      val plan = op(None).queryExecution.executedPlan.toString
      val shuffled = plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin")
      println(s"$name: auto plan has shuffled join = $shuffled")
      require(shuffled, s"$name did not flip to the shuffled plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // order-independent content hash over every column
    def rowHash(df: DataFrame): (java.math.BigDecimal, Long) = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      val r = df
        .select(md5(concat_ws("|", cols.toIndexedSeq: _*)).as("h"))
        .agg(sum(conv(substring(col("h"), 1, 15), 16, 10)
          .cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
        .collect()(0)
      (r.getDecimal(0), r.getLong(1))
    }

    // 3. result parity: automatic (shuffled) vs forced broadcast
    for ((name, op) <- ops) {
      val t0 = System.nanoTime()
      val auto = rowHash(op(None))
      val tAuto = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val forced = rowHash(op(Some(true)))
      val tForced = (System.nanoTime() - t1) / 1e9
      println(f"$name%-20s rows=${auto._2}%6d auto=$tAuto%6.1fs " +
        f"forced=$tForced%6.1fs hashesMatch=${auto == forced}")
      require(auto == forced, s"$name: shuffled result diverged " +
        s"(auto=$auto forced=$forced)")
    }
    println("gate flip: ALL CHECKS PASSED")
    spark.stop()
    // reclaim the ~1.1 GB padded corpus — it exists only for this run
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File("/tmp/graft_gate"))
  }
}
