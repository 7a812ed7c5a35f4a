package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Aggregators
import graft.operators.Corpus

/** Corpus-assembly operators: sequence packing, KMV vocabulary
  * sketch, histogram quantiles, deterministic global shuffle. */
class CorpusSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("epochRepeat materializes floor+Bernoulli copies per doc, exact vs a driver twin") {
    import spark.implicits._
    import graft.functions.Portable.h60Scala
    // "small" upsamples (rate > 1 -> whole-corpus epochs), "big"
    // subsamples (rate < 1 -> some docs drop) under an equal share
    val rows = (1L to 4L).map(i => (i, "small", 40L)) ++
      (11L to 30L).map(i => (i, "big", 400L))
    val d = rows.toDF("doc_id", "source", "n_chars")
    val budget = 800L
    val out = Corpus.epochRepeat(d, budgetTokens = budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // driver twin of the integer micro-rate + seeded Bernoulli
    val tok = rows.groupBy(_._2).view
      .mapValues(_.map(t => math.ceil(t._3 / 4.0).toLong).sum).toMap
    val micro = 1L << 20
    def copies(id: Long, src: String): Long = {
      val rm = micro * budget / (2 * tok(src))
      rm / micro +
        (if (java.lang.Long.remainderUnsigned(
          h60Scala(s"epoch|$id"), micro) < rm % micro) 1L else 0L)
    }
    val want = rows.flatMap { case (id, src, _) =>
      (1L to copies(id, src)).map(c => (id, src, c)) }
    assert(out.sorted.toSeq == want.sorted)
    // the upsampled source repeats: every small doc appears >= 2x
    assert((1L to 4L).forall(id => out.count(_._1 == id) >= 2))
    // and the oversized source drops some docs entirely
    assert((11L to 30L).exists(id => !out.exists(_._1 == id)))
  }

  test("topicOrder emits a cluster-contiguous permutation, reshuffle-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two repeated text families + noise; centroidMod=127 picks doc 0
    // and doc 127 as centroids (one from each family)
    val rows = (0L until 200L).map { i =>
      val t = if (i % 2 == 0) s"alpha beta gamma delta word$i"
              else s"zeta eta theta iota word$i"
      (i, t)
    }
    val d = rows.toDF("doc_id", "text")
    val out = Corpus.topicOrder(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a permutation of 1..N
    assert(out.map(_._3).sorted.toSeq == (1L to 200L))
    // cluster-major: every cluster's positions form a contiguous block
    val blocks = out.groupBy(_._2).view
      .mapValues(g => (g.map(_._3).min, g.map(_._3).max, g.size)).toMap
    blocks.foreach { case (c, (lo, hi, n)) =>
      assert(hi - lo + 1 == n, s"cluster $c positions not contiguous") }
    // identical feature vectors agree on the cluster: the two text
    // families (minus the unique wordN token, which spreads buckets —
    // so just check the two centroid docs anchor different clusters)
    assert(out.map(_._2).distinct.length == 2)
    // reshuffle-stable
    val out2 = Corpus.topicOrder(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.toSeq == out2.sorted.toSeq)
  }

  test("releaseAssembly composes dedup, epoch expansion, and the manifest consistently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3 exact-norm variants of one text (only id 1 survives), plus
    // distinct docs across two sources sized to force both an
    // upsampled and a subsampled source
    val rows = Seq(
      (1L, "shared body text", "small", 40L),
      (2L, "Shared, Body; Text!", "small", 40L),
      (3L, "shared  body  text", "small", 40L),
      (4L, "alpha beta", "small", 40L)) ++
      (11L to 30L).map(i => (i, s"doc body $i", "big", 400L))
    val d = rows.toDF("doc_id", "text", "source", "n_chars")
    val out = Corpus.releaseAssembly(d, budgetTokens = 800L, shardBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // survivors = min doc_id per aggressive-norm group
    val surv = d.withColumn("nm",
        md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))))
      .groupBy("nm").agg(min("doc_id").as("doc_id"))
      .join(d, "doc_id").select("doc_id", "source", "n_chars")
    assert(!surv.as[(Long, String, Long)].collect().map(_._1).toSet
      .exists(Set(2L, 3L)), "variants 2/3 must not survive")
    // the release row/token totals equal the q116 expansion of the
    // survivors (same budget, same hash) summed independently
    val rep = Corpus.epochRepeat(
      surv.toDF("doc_id", "source", "n_chars"), budgetTokens = 800L)
    val nTok = rep.join(d.select("doc_id", "n_chars"), "doc_id")
      .agg(sum(ceil(col("n_chars") / 4.0).cast("long"))).as[Long].head()
    assert(out.map(_._2).sum == rep.count(), "release row total")
    assert(out.map(_._3).sum == nTok, "release token total")
    // composition adds no corpus exchange beyond the constituents:
    // the only hashpartitioning keys are the dedup's nm (group + join
    // reuse), the tiny source agg, and the final shard rollup
    val plan = Corpus.releaseAssembly(d, budgetTokens = 800L, shardBits = 4)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val keys = """Exchange hashpartitioning\((\w+)#"""
      .r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.subsetOf(Set("nm", "source", "shard")), s"keys $keys:\n$plan")
  }

  test("shardManifest is layout-independent and pinpoints a corrupted shard") {
    import spark.implicits._
    val d = (1L to 200L)
      .map(i => (i, s"doc $i body ${"w " * (i % 7).toInt}", 20L + i % 13))
      .toDF("doc_id", "text", "n_chars")
    val a = Corpus.shardManifest(d.repartition(1), shardBits = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val b = Corpus.shardManifest(d.repartition(7), shardBits = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(a == b)
    assert(a.values.map(_._1).sum == 200L)
    // flip one document's text: exactly that doc's shard row changes,
    // and only its checksum (counts/tokens intact)
    val mut = d.withColumn("text",
      when(col("doc_id") === 42L, lit("corrupted")).otherwise(col("text")))
    val c = Corpus.shardManifest(mut, shardBits = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val diff = a.keySet.filter(k => a(k) != c(k))
    assert(diff.size == 1)
    val k = diff.head
    assert(a(k)._1 == c(k)._1 && a(k)._2 == c(k)._2 && a(k)._3 != c(k)._3)
  }

  test("seqPack chunks a shard's running token stream at the budget") {
    // one source, one shard: token counts 4,4,4,4 at budget 10 lay
    // end-to-end as starts 0,4,8,12 -> seqs 0,0,0,1 offsets 0,4,8,2
    val d = docs((1L to 4L).map(i => (i, "a b c d", "s0")))
    val out = Corpus.seqPack(d, budget = 10, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 4, 0L, 0), (2L, 4, 0L, 4),
      (3L, 4, 0L, 8), (4L, 4, 1L, 2)))
  }

  test("packStats reports the per-source fill rate of the packed sequences") {
    // same fixture as the packing test: 4 docs × 4 tokens at budget
    // 10, one shard → 2 sequences, 16 tokens, fill 16/(2·10) = 0.8
    val d = docs((1L to 4L).map(i => (i, "a b c d", "s0")))
    val got = Corpus.packStats(d, budget = 10, shards = 1)
      .select("source", "n_seqs", "n_docs", "n_tokens", "fill_rate")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("s0", 2L, 4L, 16L, 0.8)))
  }

  test("seqPack never splits across (source, shard) streams") {
    val d = Tables.documents(spark, sf)
    val packed = Corpus.seqPack(d)
    // within every (source, shard): offsets restart exactly where the
    // previous doc ended, mod budget — i.e. the packing is a single
    // contiguous token stream per shard
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
    val bad = packed
      .withColumn("prev_end",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("seq_offset") =!= pmod(col("prev_end"), lit(256)) ||
        col("seq_id") =!= floor(col("prev_end") / 256))
      .count()
    assert(bad == 0)
  }

  test("streaming preprocess keep-filter feeding seqPack matches the batch frame") {
    // the corpus-assembly pipeline end-to-end on a stream: the fused
    // preprocess decides, its keep verdict filters, and the survivors
    // pack. preprocess is stateless and streams natively (tested
    // above); packing needs the per-shard running sum, so it runs per
    // micro-batch in foreachBatch — each batch packs independently,
    // and a batch holding the whole fixture must reproduce the batch
    // frame bit-for-bit.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val fixture = Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSeq
    val batchDocs = fixture.toDF("doc_id", "text", "source")
    val keepIds = Corpus.preprocess(batchDocs)
      .filter(col("keep")).select("doc_id")
    val wantPack = Corpus.seqPack(batchDocs.join(keepIds, "doc_id"),
      shards = 4).collect().map(_.toSeq).toSet
    assert(wantPack.nonEmpty)

    val packed = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val keep = Corpus.preprocess(batch)
            .filter(col("keep")).select("doc_id")
          packed ++= Corpus.seqPack(batch.join(keep, "doc_id"), shards = 4)
            .collect().map(_.toSeq)
          ()
      }.start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      assert(packed.toSet == wantPack)
    } finally q.stop()
  }

  test("bottomKDistinct keeps the k smallest distinct values") {
    val agg = new Aggregators.BottomKDistinct(3)
    val fed = Seq(9L, 5L, 5L, 7L, 1L, 9L, 3L, 1L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(fed == Seq(1L, 3L, 5L))
    // merge unions and trims; duplicates collapse across partials
    assert(agg.merge(Seq(1L, 3L, 5L), Seq(1L, 2L, 9L)) == Seq(1L, 2L, 3L))
  }

  test("vocabSketch estimates each source's bigram cardinality") {
    val d = Tables.documents(spark, sf)
    val k = 16
    val out = Corpus.vocabSketch(d, k).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(3))).toMap
    // ground truth: exact distinct bigram count per source
    val exact = d
      .select(col("source"), explode(graft.functions.Portable.shingles(
        graft.functions.Portable.words(col("text")), 2)).as("g"))
      .groupBy("source").agg(countDistinct(col("g")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == exact.keySet)
    for ((src, (nKept, est)) <- out) {
      assert(nKept == math.min(k, exact(src)).toInt)
      if (nKept < k) assert(est == exact(src).toDouble)
      // KMV with k=16 has ~1/sqrt(k-2) ≈ 27% relative error at one
      // sigma; 3x that bounds the deterministic fixture comfortably
      else assert(math.abs(est - exact(src)) / exact(src) < 0.8,
        s"$src: est $est vs exact ${exact(src)}")
    }
  }

  test("profileTable: null sentinel never pollutes the distinct sketch") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None),
      (4L, Some("b"))).toDF("id", "v")
    val got = Corpus.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val idRow = got("id")
    assert(idRow.getLong(1) == 4 && idRow.getLong(2) == 0)
    assert(idRow.getString(3) == "1" && idRow.getString(4) == "4")
    assert(idRow.getInt(5) == 4 && idRow.getDouble(7) == 4.0)
    val vRow = got("v")
    assert(vRow.getLong(1) == 4 && vRow.getLong(2) == 1, "one null counted")
    assert(vRow.getString(3) == "a" && vRow.getString(4) == "b")
    // the null rode the sketch as the MaxValue sentinel and was
    // dropped after the merge: only the two real values remain
    assert(vRow.getInt(5) == 2 && vRow.getDouble(7) == 2.0)
    // saturated sketch: k = 2 over 4 distinct ids → KMV estimator
    val sat = Corpus.profileTable(df, columns = Seq("id"), k = 2)
      .collect().head
    assert(sat.getInt(5) == 2)
    assert(sat.getDouble(7) ==
      1.0 * 1152921504606846976.0 / sat.getLong(6))
  }

  test("lenQuantiles reads percentiles off the cumulative histogram") {
    // lengths 1..10, width 1: p50 -> 5, p90 -> 9, p99 -> 10
    val d = docs((1L to 10L).map(i => (i, ("w " * i.toInt).trim, "s0")))
    val out = Corpus.lenQuantiles(d, width = 1, ps = Seq(50, 90, 99))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(50 -> 5L, 90 -> 9L, 99 -> 10L))
  }

  test("shuffleOrder equals the global rank formulation") {
    val d = Tables.documents(spark, sf)
    val out = Corpus.shuffleOrder(d)
    val n = d.count()
    // a permutation of 1..N ...
    assert(out.count() == n)
    assert(out.agg(min("pos"), max("pos"), countDistinct("pos"))
      .collect().head.toSeq == Seq(1L, n, n))
    // ... identical to the single-window global row_number (viable
    // here because the fixture is small; the operator never does this)
    val k = graft.functions.Portable.hash60(
      concat(lit("shuffle|"), col("doc_id")))
    val ref = d.select(col("doc_id"),
      row_number().over(Window.orderBy(k, col("doc_id")))
        .cast("long").as("pos"))
    assert(out.except(ref).isEmpty && ref.except(out).isEmpty)
  }

  test("curriculumOrder: tiers are contiguous, within-tier order is the seeded hash") {
    val d = Tables.documents(spark, sf)
    val out = Corpus.curriculumOrder(d)
    val n = d.count()
    // a permutation of 1..N
    assert(out.agg(min("pos"), max("pos"), countDistinct("pos"))
      .collect().head.toSeq == Seq(1L, n, n))
    // identical to the single-window global formulation (viable on the
    // small fixture; the operator itself never does a global sort)
    val k = graft.functions.Portable.hash60(
      concat(lit("curriculum|"), col("doc_id")))
    val ref = out.select(col("doc_id"), col("bucket"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("bucket").desc, k, col("doc_id"))).cast("long"))
    assert(out.except(ref).isEmpty && ref.except(out).isEmpty)
    // every doc of a higher tier precedes every doc of a lower tier
    val tiers = out.groupBy("bucket")
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("c"))
      .orderBy(col("bucket").desc).collect()
    assert(tiers.forall(r => r.getLong(2) - r.getLong(1) + 1 == r.getLong(3)))
    tiers.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) + 1 == b.getLong(1))
      case _ =>
    }
    // reshuffle-stable: the position depends on content, not layout
    val re = Corpus.curriculumOrder(d.repartition(7))
    assert(out.except(re).isEmpty && re.except(out).isEmpty)
  }

  test("mixRebalance clips small sources at 100% and samples large ones") {
    val d = Tables.documents(spark, sf)
    val out = Corpus.mixRebalance(d, budgetTokens = 4000L)
    val rates = out.select("source", "rate_pct").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSrc = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.values.forall(r => r >= 1 && r <= 100))
    // a clipped source keeps every document; a sampled one keeps fewer
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, rate) <- rates) {
      if (rate == 100L) assert(kept(src) == perSrc(src))
      else assert(kept(src) < perSrc(src))
    }
    // deterministic: a re-run selects the identical doc set
    val again = Corpus.mixRebalance(d, budgetTokens = 4000L)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("preprocess fuses the whole decision surface into one scan") {
    val d = Tables.documents(spark, sf)
    val out = Corpus.preprocess(d)
    assert(out.count() == d.count())
    // both keep verdicts occur, and keep matches its definition
    val bad = out.filter(col("keep") =!=
      (col("n_tokens") >= 50 && col("n_hits") === 0)).count()
    assert(bad == 0)
    assert(out.filter(col("keep")).count() > 0)
    assert(out.filter(!col("keep")).count() > 0)
    // fused: zero exchanges — one scan computes everything
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"preprocess shuffled:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"preprocess scans more than once:\n$plan")
  }

  test("chunk emits strided windows and keeps the short-doc tail") {
    val d = docs(Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" "), "s0"),
      (2L, "a b", "s0")))
    val out = Corpus.chunk(d, size = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    def m(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(
      (1L, 0, 4, m("t1 t2 t3 t4")),
      (1L, 1, 4, m("t4 t5 t6 t7")),
      (1L, 2, 4, m("t7 t8 t9 t10")),
      (2L, 0, 2, m("a b"))))
  }

  test("preprocess and chunk run unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchRows = Seq(
      (1L, ("spark stream batch " * 20).trim, "s0"),
      (2L, "the a small", "s1"))
    val in = MemoryStream[(Long, String, String)]
    in.addData(batchRows: _*)
    val streamDocs = in.toDF.toDF("doc_id", "text", "source")
    // map-only ops are streaming-compatible as-is: same operator, no
    // rewrite, append mode, no state
    val q = Corpus.preprocess(streamDocs).writeStream
      .format("memory").queryName("pp_stream").outputMode("append").start()
    val c = Corpus.chunk(streamDocs).writeStream
      .format("memory").queryName("chunk_stream").outputMode("append").start()
    try { q.processAllAvailable(); c.processAllAvailable() }
    finally { q.stop(); c.stop() }
    val batchDocs = batchRows.toDF("doc_id", "text", "source")
    val ppBatch = Corpus.preprocess(batchDocs)
    val ppStream = spark.table("pp_stream")
    assert(ppStream.except(ppBatch).isEmpty && ppBatch.except(ppStream).isEmpty)
    val chBatch = Corpus.chunk(batchDocs)
    val chStream = spark.table("chunk_stream")
    assert(chStream.except(chBatch).isEmpty && chBatch.except(chStream).isEmpty)
  }

  test("corpus queries keep their scale shapes") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r.findAllIn(plan(df)).size
    val d = Tables.documents(spark, sf)
    // q57: one shard shuffle, windows keyed per (source, shard) —
    // never an empty-partition global window
    val packPlan = plan(Corpus.seqPack(d))
    assert(exchanges(Corpus.seqPack(d)) == 1, s"want 1 exchange:\n$packPlan")
    assert(!packPlan.contains("Exchange SinglePartition"),
      s"global window crept in:\n$packPlan")
    // q58: ONE partial-aggregated sketch exchange — no exact-distinct
    // expand/exchange anywhere
    val skPlan = plan(Corpus.vocabSketch(d))
    assert(exchanges(Corpus.vocabSketch(d)) == 1, s"want 1 exchange:\n$skPlan")
    assert(!skPlan.contains("Expand"), s"distinct expand crept in:\n$skPlan")
    // q60: no global range sort; per-shard rank + broadcast offsets
    val shPlan = plan(Corpus.shuffleOrder(d))
    assert(!shPlan.contains("rangepartitioning"),
      s"global sort crept in:\n$shPlan")
    assert(shPlan.contains("BroadcastHashJoin"), s"no broadcast:\n$shPlan")
    // q61: rate table broadcast back; the corpus side never shuffles —
    // the broadcast join sits DIRECTLY over the documents scan, and
    // the only exchanges are the tiny per-source totals agg (planned
    // twice — rates + nsrc — and exchange-reused at runtime)
    val mixPlan = plan(Corpus.mixRebalance(d))
    assert(mixPlan.contains("BroadcastHashJoin"), s"no broadcast:\n$mixPlan")
    assert(exchanges(Corpus.mixRebalance(d)) == 2,
      s"want only the per-source totals exchanges:\n$mixPlan")
    assert("""BroadcastHashJoin[\s\S]{0,400}?FileScan parquet""".r
      .findFirstIn(mixPlan).isDefined,
      s"corpus scan should feed the join with no exchange:\n$mixPlan")
    // q63: map-only — the window explode shuffles nothing
    assert(exchanges(Corpus.chunk(d)) == 0,
      s"chunk shuffled:\n${plan(Corpus.chunk(d))}")
  }

  test("source drift equals hand-computed total-variation distance") {
    // source a: {x:3, y:1} T_a=4; source b: {x:1, z:3} T_b=4; T=8
    // p  = {x:.5, y:.125, z:.375}; p_a = {x:.75, y:.25}; p_b = {x:.25, z:.75}
    // TV_a = ½(|.75−.5| + |.25−.125| + .375) = 0.375
    // TV_b = ½(|.25−.5| + |.75−.375| + .125) = 0.375
    val d = docs(Seq((1L, "x x x y", "a"), (2L, "x z z z", "b")))
    val got = Corpus.sourceDrift(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    // replicate the closed form exactly: num_sum/(T_s·T) + (T−cw_sum)/T
    def tv(numSum: Long, ts: Long, cwSum: Long, t: Long): Double =
      (numSum.toDouble / (ts.toDouble * t.toDouble) +
        (t.toDouble - cwSum.toDouble) / t.toDouble) * 0.5
    // a: Σ|c_sw·T − c_w·T_s| = |3·8−4·4| + |1·8−1·4| = 12; cw_sum = 5
    // b: |1·8−4·4| + |3·8−3·4| = 8+12 = 20; cw_sum = 7
    assert(got == Seq(("a", 2L, tv(12, 4, 5, 8)), ("b", 2L, tv(20, 4, 7, 8))),
      s"got $got")
    assert(got.forall(_._3 == 0.375), s"hand value: $got")
    // a source identical to the corpus mix drifts 0
    val same = docs(Seq((1L, "x x y", "a"), (2L, "x x y", "b")))
    val zero = Corpus.sourceDrift(same).collect()
    assert(zero.forall(_.getDouble(2) == 0.0), zero.mkString(","))
    // scale shape: no rank window, no sort-merge join, no cartesian —
    // marginals re-aggregate the (source, word) table; totals broadcast
    val plan = Corpus.sourceDrift(d)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("sourceCap keeps exactly cap docs per source, by hash priority") {
    val d = Tables.documents(spark, sf)
    val cap = 7
    val got = Corpus.sourceCap(d, cap = cap)
    val perSource = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 has 25 docs in every source — the cap binds everywhere
    assert(perSource.values.forall(_ == cap.toLong), perSource)
    // equals the rank-window formulation (the oracle's spelling,
    // computed independently here with DataFrame windows)
    val pri = graft.functions.Portable.hash32(
      col("doc_id").cast("string"), "cap")
    val byWindow = d
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(pri.asc, col("doc_id").asc)))
      .filter(col("rn") <= cap).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet
      == byWindow)
    // scale shape: bounded aggregator + broadcast payload join — no
    // rank window over the corpus
    val p = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ObjectHashAggregate") && !p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("curation pipeline composes filter, mixture, and packing without new shuffles") {
    val d = Tables.documents(spark, sf)
    val out = Corpus.curationPipeline(d)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // fill rate is a true packing ratio and the report reconciles
    rows.foreach { r =>
      val (nSeqs, nDocs, nToks, fill) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nSeqs >= 1 && nDocs >= 1 && nToks >= nDocs * 50,
        s"filter floor violated: $r")
      assert(fill > 0.0 && fill <= 1.0 &&
        fill == nToks.toDouble / (nSeqs * 256), r.toString)
    }
    // composing stages must not invent shuffles: every exchange keys
    // on source or the pack's (source, shard); no global sort/window
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val keys = """Exchange hashpartitioning\((\w+)#"""
      .r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys.subsetOf(Set("source", "shard")), s"keys $keys:\n$p")
    // a SinglePartition exchange exists but only under the mixture's
    // one-row totals aggregate (model-sized); the corpus-scale
    // hazards — a global sort or an unpartitioned window — must not
    assert(!p.contains("rangepartitioning"), p)
    assert(!"""Window .*\n.*Exchange SinglePartition""".r
      .findFirstIn(p).isDefined, s"unpartitioned window:\n$p")
  }

  test("tempMixture splits the budget by sqrt share and keeps by integer Bernoulli") {
    // s0: 9 docs × 4 tokens (t_s=36), s1: 1 doc × 4 tokens (t_s=4);
    // t=40, budget = 40 div 4 = 10
    // wq0 = floor(6·2^20) = 6291456, wq1 = floor(2·2^20) = 2097152
    // planned0 = floor(10·wq0/(wq0+wq1)) = floor(7.5) = 7
    // planned1 = floor(10·wq1/8388608)   = floor(2.5) = 2
    val d = docs((1L to 9L).map(i => (i, "a b c d", "s0")) :+
      (10L, "a b c d", "s1"))
    val got = Corpus.tempMixture(d)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((s, tS, wq, pl) <- Seq(("s0", 36L, 6291456L, 7L),
                                ("s1", 4L, 2097152L, 2L))) {
      got.get(s).foreach { r =>
        assert(r.getLong(1) == tS && r.getLong(2) == wq &&
          r.getLong(3) == pl, s"$s: $r")
      }
    }
    // the α=0.5 temperature property: the small source's planned
    // share (2/10) exceeds its proportional token share (4/40)
    assert(2.0 / 10.0 > 4.0 / 40.0)
    // kept counts equal an independent recomputation of the integer
    // Bernoulli rule h32("mix|"+id)·t_s < planned·2^32
    import spark.implicits._
    val h = graft.functions.Portable.hash32(
      col("doc_id").cast("string"), "mix")
    val expect = d.select(col("doc_id"), col("source"), h.as("h"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._2)
      .view.mapValues { rows =>
        val (tS, pl) = if (rows.head._2 == "s0") (36L, 7L) else (4L, 2L)
        rows.count(r => BigInt(r._3) * tS < BigInt(pl) * 4294967296L)
      }.toMap
    val keptGot = got.view.mapValues(_.getLong(4)).toMap
    assert(got.keySet == expect.filter(_._2 > 0).keySet,
      s"sources with ≥1 kept doc: got ${got.keySet}, want $expect")
    for ((s, n) <- expect if n > 0)
      assert(keptGot.get(s).contains(n.toLong), s"$s: got $keptGot want $expect")
    // scale shape: the corpus never shuffles — only the two tiny-key
    // aggregates exchange, the plan table broadcasts back
    val p = Corpus.tempMixture(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin") && !p.contains("Window") &&
      !p.contains("SortMergeJoin"), p)
  }

  test("filterFunnel counts survivors of each sequential stage") {
    import spark.implicits._
    // doc 1: passes everything; doc 2: too short (n_chars); doc 3:
    // long enough but < 30 words; doc 4: 30 words of length 1 (mean
    // word length below 3); doc 5: 30 words, one repeated (distinct
    // ratio 1/30 < 40%)
    val pass = (1 to 30).map(i => s"word$i").mkString(" ")
    val short = (1 to 30).map(_ => "a").mkString(" ")
    val rep = (1 to 30).map(_ => "same").mkString(" ")
    val d = Seq(
      (1L, pass, "s", 250L), (2L, pass, "s", 100L),
      (3L, "one two three", "s", 250L), (4L, short, "s", 250L),
      (5L, rep, "s", 250L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val r = Corpus.filterFunnel(d).collect().head
    // total=5, after_len drops doc2 → 4, after_words drops doc3 → 3,
    // after_wordlen drops doc4 → 2, after_distinct drops doc5 → 1
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((5L, 4L, 3L, 2L, 1L)), r)
    // monotone by construction on real data, in one exchange
    val full = Corpus.filterFunnel(
      Tables.documents(spark, sf).withColumn("n_chars",
        col("n_chars").cast("long")))
    val rows = full.collect()
    assert(rows.forall(x => x.getLong(1) >= x.getLong(2) &&
      x.getLong(2) >= x.getLong(3) && x.getLong(3) >= x.getLong(4) &&
      x.getLong(4) >= x.getLong(5)))
    val p = full.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("sourceOverlap: KMV estimate is exact when the union fits the sketch") {
    // identical sources → 1.0; disjoint → 0.0; half-overlap → exact
    // jaccard because every pair's union is far below k=128
    val t1 = "a b c d e f g h i j"   // 8 3-shingles
    val t2 = "a b c d e f q r s t"   // shares the 4 shingles inside "a b c d e f"
    val t3 = "z y x w v u t2 s2 r2 q2"
    val d = docs(Seq((1L, t1, "sA"), (2L, t1, "sB"), (3L, t2, "sC"),
      (4L, t3, "sD")))
    val got = Corpus.sourceOverlap(d)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // sA/sB identical: union 8, all common
    assert(got(("sA", "sB")) == ((8L, 8L, 1.0)), got(("sA", "sB")))
    // sA/sD disjoint
    assert(got(("sA", "sD"))._3 == 0.0)
    // sA/sC: shingle sets overlap in the 4 shingles of "a b c d e f";
    // union 12 → exact jaccard 4/12
    assert(got(("sA", "sC")) == ((12L, 4L, 4.0 / 12.0)), got(("sA", "sC")))
    // scale shape: the static AQE tree replicates the ONE sketch
    // exchange under the stream and broadcast sides (they dedupe at
    // runtime via stage reuse — the q65 pattern): the only DISTINCT
    // partitioning key is `source`, carrying ≤ k longs per source per
    // map task; the pairwise stage is broadcast
    val p = Corpus.sourceOverlap(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val keys = """Exchange hashpartitioning\((\w+)#"""
      .r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys == Set("source"), s"extra exchange keys $keys:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }
}
