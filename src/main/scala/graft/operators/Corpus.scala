package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Aggregators
import graft.functions.Portable._

/** Corpus-assembly operators — the last mile of a training-data
  * pipeline, after filtering/dedup: packing documents into fixed
  * token-budget training sequences, deterministic global shuffling,
  * and the cheap distribution sketches (cardinality, quantiles) a
  * 100 TB run computes before committing to a mixture.
  *
  * Every op is built from [[graft.functions.Portable]] primitives so
  * the DuckDB oracle checks it bit-for-bit, and every shuffle is
  * either per-shard (bounded by construction) or carries only partial
  * aggregates / sketch state.
  */
object Corpus extends graft.QueryModule {

  /** 0 = derive from the cluster: one independently-packable shard
    * per core floor, never fewer than 4. Explicit values pass
    * through (the driver oracle pins 4 for reproducibility). */
  private def resolveShards(spark: SparkSession, shards: Int): Int = {
    require(shards >= 0, s"shards must be >= 0, got $shards")
    if (shards > 0) shards
    else math.max(4, spark.sparkContext.defaultParallelism)
  }

  /** Concat-and-chunk sequence packing: lay documents end-to-end in
    * (source, shard, doc_id) order and cut every `budget` tokens —
    * the standard way LLM training data is packed into fixed-length
    * sequences. Emits each document's sequence id and offset within
    * its sequence.
    *
    * SCALE SHAPE: the running sum is windowed per (source, shard),
    * never global — `shards` hash-splits each source so a shard is a
    * bounded, independently-packable stream (1000 executors pack 1000
    * shards concurrently; no global sort, no single-partition window).
    * Each shard's docs shuffle once to their shard and sort locally.
    *
    * `shards = 0` (the default) derives the count from the cluster:
    * max(4, defaultParallelism), so a 1000-core cluster packs ≥1000
    * independent shards out of the box instead of four giant
    * per-partition sorts. Pass an explicit count when the output must
    * be reproducible across differently-sized clusters (the driver
    * oracle pins 4).
    */
  def seqPack(documents: DataFrame, budget: Int = 256,
              shards: Int = 0): DataFrame = {
    val nShards = resolveShards(documents.sparkSession, shards)
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).as("n_tokens"),
        pmod(hash60(concat(lit("pack|"), col("doc_id"))), lit(nShards))
          .cast("int").as("shard"))
      .withColumn("st", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        floor(col("st") / budget).as("seq_id"),
        pmod(col("st"), lit(budget)).cast("int").as("seq_offset"))
  }

  /** Packing-efficiency report over [[seqPack]]'s sequences — the
    * telemetry a pipeline publishes after packing: per source, the
    * sequence count, packed document/token totals, and the fill rate
    * (tokens ÷ sequences·budget — how much of the fixed token budget
    * actual sequences use; low fill means the budget or sharding is
    * mis-sized for the corpus length profile). Fill rate is one
    * bigint/bigint-derived double division.
    *
    * SCALE SHAPE: rides q57's one shard-key exchange, then the
    * per-sequence rollup reuses the same (source, shard)-compatible
    * clustering before collapsing to a #sources-row report — the only
    * new exchange is the tiny final group key.
    */
  def packStats(documents: DataFrame, budget: Int = 256,
                shards: Int = 0): DataFrame =
    seqPack(documents, budget, shards)
      .groupBy(col("source"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("toks")).as("n_tokens"))
      .select(col("source"), col("n_seqs"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / (col("n_seqs") * budget))
          .as("fill_rate"))

  /** KMV (k-minimum-values) distinct-cardinality sketch of each
    * source's bigram vocabulary: keep the k smallest distinct 60-bit
    * gram hashes; the k-th smallest estimates the cardinality as
    * (k-1) * 2^60 / h_k. The before-training "how diverse is this
    * source" screen that exact COUNT(DISTINCT) can't afford at scale.
    *
    * SCALE SHAPE: [[Aggregators.bottomKDistinct]] is a mergeable
    * bounded sketch — each map task carries ≤ k longs per source and
    * duplicates collapse in the buffer, so the shuffle moves sketch
    * state, not the vocabulary. Exact and deterministic for any
    * partition/merge order; when a source has < k distinct grams the
    * estimate IS the exact count.
    *
    * Portability: (k-1) * 2^60 is a 6-significant-bit double (exact);
    * the estimate is that constant in one IEEE division by an exact
    * integer — bit-identical in any engine.
    */
  def vocabSketch(documents: DataFrame, k: Int = 16): DataFrame =
    documents
      // token array in its OWN projection: inlined into the shingle
      // lambda, every element_at re-runs the regex split (the q55
      // trap — measured 6.3 s -> 0.5 s here)
      .select(col("source"), words(col("text")).as("ws"))
      .select(col("source"), explode_outer(shingles(col("ws"), 2)).as("g"))
      .filter(col("g").isNotNull)
      .select(col("source"), hash60(col("g")).as("h"))
      .groupBy(col("source"))
      .agg(Aggregators.bottomKDistinct(k)(col("h")).as("ks"))
      .select(col("source"), size(col("ks")).as("n_kept"),
        element_at(col("ks"), size(col("ks"))).as("kth_min"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0d) /
            col("kth_min").cast("double")))

  /** Document-length quantiles from a fixed-width histogram — the
    * curriculum/batch-sizing distribution report. Exact histogram, then
    * each percentile p resolves to the first bucket whose cumulative
    * count covers p% of documents (integer cross-multiplication, no
    * float thresholds).
    *
    * SCALE SHAPE: this is how quantiles are actually computed at
    * 100 TB — one partial-aggregated histogram shuffle (key space =
    * length/width, a few hundred buckets), then the percentile scan
    * runs on the bucket table, which is model-sized. Never a global
    * sort, never percentile_disc over the corpus.
    */
  def lenQuantiles(documents: DataFrame, width: Int = 8,
                   ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val hist = documents
      .select(floor(size(words(col("text"))) / width).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("total"))))
      .select(col("bucket"), col("cum"), col("total"),
        explode(array(ps.map(p => lit(p)): _*)).as("p"))
      .filter(col("cum") * 100 >= col("total") * col("p"))
      .groupBy(col("p"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("p"), col("bucket"), (col("bucket") * width).as("lo"),
        (col("bucket") * width + (width - 1)).as("hi"))
  }

  /** Deterministic global training shuffle: every document's position
    * in the seeded-hash global order — reproducible across re-runs
    * and reshuffles, which `ORDER BY random()` is not.
    *
    * SCALE SHAPE: a global row_number without a global window. The
    * shard is the hash's HIGH bits, so shards are contiguous ranges
    * of the global order: per-shard counts (one tiny agg) prefix-sum
    * into shard offsets on 2^shardBits rows, and each shard ranks
    * locally after one hash-range shuffle — the two-pass distributed
    * rank. Equals `row_number() OVER (ORDER BY k, doc_id)` exactly.
    */
  def shuffleOrder(documents: DataFrame, shardBits: Int = 8): DataFrame = {
    val keyed = documents.select(col("doc_id"),
      hash60(concat(lit("shuffle|"), col("doc_id"))).as("k"))
      .withColumn("shard", shiftright(col("k"), 60 - shardBits))
    val offs = keyed.groupBy(col("shard")).agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    val wr = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    keyed.withColumn("rn", row_number().over(wr))
      .join(broadcast(offs), "shard")
      .select(col("doc_id"), (col("off") + col("rn")).as("pos"))
  }

  /** Corpus snapshot diff (q112): per-source added / removed /
    * changed / unchanged document counts between two corpus versions
    * — the ingest-ops report run when crawl N+1 lands ("did a source
    * silently vanish? did half its documents mutate?") before any
    * re-processing is scheduled. Identity is doc_id; change is
    * content md5 inequality.
    *
    * SCALE SHAPE: both sides collapse to (doc_id, source, md5)
    * projections — 16-byte hashes ride the ONE doc_id-keyed shuffle
    * of the full-outer join, document payloads never move — then the
    * status rollup is a #sources-key exchange. At 100 TB this is the
    * cheapest possible membership+equality pass: two scans, one
    * hash-only join.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def keyed(d: DataFrame) = d.select(col("doc_id"), col("source"),
      md5(col("text")).as("h"))
    val o = keyed(oldDocs).withColumnRenamed("source", "o_src")
      .withColumnRenamed("h", "o_h")
    val n = keyed(newDocs).withColumnRenamed("source", "n_src")
      .withColumnRenamed("h", "n_h")
    o.join(n, Seq("doc_id"), "full_outer")
      .select(coalesce(col("n_src"), col("o_src")).as("source"),
        when(col("o_h").isNull, "added")
          .when(col("n_h").isNull, "removed")
          .when(col("o_h") =!= col("n_h"), "changed")
          .otherwise("same").as("status"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("status") === "same", 1L).otherwise(0L)).as("n_same"))
  }

  /** Curriculum ordering: a deterministic global training order that
    * feeds documents quality-tier first — all of bucket B before any
    * of bucket B−1 — with a seeded pseudo-random order INSIDE each
    * tier (curriculum learning's standard data schedule: order by
    * difficulty tier, shuffle within tier so the model never sees a
    * correlated run). The tier is the per-mille stopword-ratio score
    * (q96's integer signal) in 100-per-mille buckets; any integer
    * score plugs in.
    *
    * Same machinery as q60's deterministic shuffle: the within-tier
    * rank is computed per (bucket, shard) where shard = the hash key's
    * own high bits — so ordering by (bucket desc, shard, k) IS
    * ordering by (bucket desc, k) — and global positions come from
    * prefix-summed (bucket, shard) counts. Reshuffle-stable: the
    * position depends only on doc_id and text, never on layout.
    *
    * SCALE SHAPE: one map-only scoring pass, ONE exchange on
    * (bucket, shard) with a per-shard sort (each of ≤11·2^shardBits
    * shards sorts independently — 1000 executors sort 1000 shards),
    * and a broadcast of the tiny offsets table. Never a global sort:
    * the q60 rule with a curriculum prefix on the key.
    */
  def curriculumOrder(documents: DataFrame, shardBits: Int = 8): DataFrame = {
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    val scored = documents
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tok"),
        size(filter(col("ws"), w => array_contains(stopArr, w)))
          .cast("long").as("n_stop"))
      .select(col("doc_id"),
        expr("((n_stop * 1000) div n_tok) div 100").as("bucket"))
    val keyed = scored
      .withColumn("k", hash60(concat(lit("curriculum|"), col("doc_id"))))
      .withColumn("shard", shiftright(col("k"), 60 - shardBits))
      // explicit (not inferred) null-key filter: the inner join below
      // drops null keys anyway, but making the constraint explicit
      // keeps BOTH consumers' subtrees identical so the exchange is
      // reused — otherwise only the join side gets an inferred
      // isnotnull pushed into its scan and the reuse breaks
      .filter(col("bucket").isNotNull && col("shard").isNotNull)
    val wr = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("k"), col("doc_id"))
    val ranked = keyed.withColumn("rn", row_number().over(wr))
    // per-(bucket, shard) counts come from the RANK WINDOW'S OWN
    // exchange (max rank == count), not a second aggregate over the
    // scoring scan — the tokenize+score pass runs ONCE and the counts
    // branch shows up as a ReusedExchange (plan-asserted). At bench
    // scale the saving hides inside run variance; at corpus scale it
    // is one full tokenize+score pass.
    val offs = ranked.groupBy(col("bucket"), col("shard"))
      .agg(max(col("rn")).cast("long").as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bucket").desc, col("shard").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("shard"), col("off"))
    ranked
      .join(broadcast(offs), Seq("bucket", "shard"))
      .select(col("doc_id"), col("bucket"), (col("off") + col("rn")).as("pos"))
  }

  /** Topic-clustered training order — related documents ADJACENT in
    * the stream (the in-context-pretraining recipe: packing a
    * sequence from one topic beats random neighbors), with a seeded
    * shuffle inside each topic. Topics are coarse clusters in a
    * 16-bucket hashed-word count space against modulo-sampled literal
    * centroids; the metric is exact INTEGER squared L2 (counts are
    * small integers, no norm, no doubles anywhere — ties go to the
    * smallest centroid id). Ordering is q109's machinery keyed by
    * (cluster, shard): positions are cluster-major, per-shard
    * independent, reshuffle-stable.
    *
    * SCALE SHAPE: the feature map and literal-centroid assignment
    * fuse into the corpus scan (the hashed-bucket array materializes
    * once per row — never per lambda element); centroids are a
    * model-sized driver collect; then exactly one (cluster, shard)
    * exchange whose rank window sorts each shard independently (the
    * rank's own exchange is reused for the offsets — no second scan),
    * tiny offsets broadcast back.
    */
  def topicOrder(documents: DataFrame, centroidMod: Int = 127,
                 buckets: Int = 16, shardBits: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // bucket-hash array in its OWN projection so the md5 runs once
    // per word, not once per (word, bucket) lambda reference
    val feats = documents
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        transform(col("ws"), w =>
          pmod(hash60(concat(lit("topic|"), w)), lit(buckets.toLong)))
          .as("bh"))
      .select(Seq(col("doc_id")) ++ (0 until buckets).map(j =>
        size(filter(col("bh"), h => h === j)).cast("long").as(s"x$j")): _*)
    val xarr = array((0 until buckets).map(j => col(s"x$j")): _*)
    val cents = feats
      .filter(pmod(col("doc_id"), lit(centroidMod.toLong)) === 0)
      .select(col("doc_id"),
        array((0 until buckets).map(j => col(s"x$j")): _*))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    require(cents.nonEmpty, s"no centroid docs with doc_id % $centroidMod = 0")
    // one fused codegen node for all per-centroid integer L2
    // distances — the zip_with+aggregate HOF pair per centroid is
    // interpreted and loop-shaped (the many-literal-loops cliff,
    // VectorExpressions.LongSqDistances); exact integers, identical
    val dists = graft.functions.VectorExpressions.longSqDistances(
      xarr, cents.map(_._2))
    // first min = smallest centroid id (cents id-sorted) — the same
    // tie-break as the oracle's ORDER BY d2 ASC, c_id ASC
    val cluster = element_at(typedlit(cents.map(_._1)), coalesce(
      nullif(array_position(dists, array_min(dists)), lit(0L)),
      lit(1L)).cast("int"))
    val keyed = feats
      .select(col("doc_id"), cluster.as("cluster"))
      .withColumn("k", hash60(concat(lit("topicord|"), col("doc_id"))))
      .withColumn("shard", shiftright(col("k"), 60 - shardBits))
      .filter(col("cluster").isNotNull && col("shard").isNotNull)
    val wr = Window.partitionBy(col("cluster"), col("shard"))
      .orderBy(col("k"), col("doc_id"))
    val ranked = keyed.withColumn("rn", row_number().over(wr))
    val offs = ranked.groupBy(col("cluster"), col("shard"))
      .agg(max(col("rn")).cast("long").as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("cluster").asc, col("shard").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("cluster"), col("shard"), col("off"))
    ranked
      .join(broadcast(offs), Seq("cluster", "shard"))
      .select(col("doc_id"), col("cluster"), (col("off") + col("rn")).as("pos"))
  }

  /** Mixture rebalancing to a token budget: give every source an
    * equal share of `budgetTokens` and derive its integer keep-rate
    * from its measured token total (clipped at 100% — a source
    * smaller than its share is kept whole). Selection is the same
    * seeded-hash bucket as [[TextOps.trainSplit]], so the sample is
    * reshuffle-stable, re-run-stable, and independent of the split /
    * strata hashes (distinct seed prefix).
    *
    * SCALE SHAPE: per-source token totals are one partial-aggregated
    * exchange on a tiny key; the rate table (#sources rows) broadcasts
    * back and the keep filter fuses into the corpus scan — the corpus
    * itself never shuffles.
    */
  def mixRebalance(documents: DataFrame,
                   budgetTokens: Long = 40000L): DataFrame = {
    val perSrc = documents
      .select(col("source"), ceil(col("n_chars") / 4.0).cast("long").as("et"))
      .groupBy(col("source")).agg(sum(col("et")).as("tok"))
    val rates = perSrc
      .crossJoin(broadcast(perSrc.agg(count(lit(1)).as("nsrc"))))
      .select(col("source"),
        least(lit(100L),
          floor(lit(100L * budgetTokens) / (col("nsrc") * col("tok"))))
          .as("rate_pct"))
    documents
      .join(broadcast(rates), "source")
      .filter(pmod(hash60(concat(lit("mix|"), col("doc_id"))), lit(100)) <
        col("rate_pct"))
      .select(col("doc_id"), col("source"), col("rate_pct"))
  }

  /** Multi-epoch repeat-factor materialization — the upsampling half
    * [[mixRebalance]] clips away: give every source an equal share of
    * `budgetTokens` and emit each document `copies` times so the
    * materialized stream hits the budget IN EXPECTATION, where
    * copies = ⌊rate⌋ + Bernoulli(frac(rate)) per document. Small
    * high-quality sources repeat across epochs (rate > 1), oversized
    * sources subsample (rate < 1 drops docs) — the "repeat factors"
    * of a mixed multi-epoch training recipe. The rate is carried as
    * an exact integer micro-rate (units of 2⁻²⁰) and the Bernoulli
    * draw is the integer comparison h₂₀ < rate_micro mod 2²⁰ on a
    * seeded 60-bit doc hash — no float thresholds near the
    * corpus-sized decision, reshuffle- and re-run-stable, and
    * independent of the split/strata/mix hashes (distinct seed).
    *
    * SCALE SHAPE: per-source token totals are one partial-aggregated
    * exchange on a tiny key; the #sources-row micro-rate table
    * broadcasts back; copies + the sequence explode fuse into the
    * corpus scan (the corpus itself never shuffles), and the output
    * is exactly the epoch plan a downstream pack/shuffle pass
    * consumes.
    */
  def epochRepeat(documents: DataFrame,
                  budgetTokens: Long = 120000L): DataFrame = {
    val perSrc = documents
      .select(col("source"), ceil(col("n_chars") / 4.0).cast("long").as("et"))
      .groupBy(col("source")).agg(sum(col("et")).as("tok"))
    val micro = 1L << 20
    val rates = perSrc
      .crossJoin(broadcast(perSrc.agg(count(lit(1)).as("nsrc"))))
      .select(col("source"),
        floor(lit(micro) * lit(budgetTokens) / (col("nsrc") * col("tok")))
          .cast("long").as("rate_micro"))
    documents
      .join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"),
        (expr(s"rate_micro div $micro") +
          when(pmod(hash60(concat(lit("epoch|"), col("doc_id"))),
            lit(micro)) < pmod(col("rate_micro"), lit(micro)), 1L)
            .otherwise(0L)).as("copies"))
      .filter(col("copies") >= 1)
      // Spark's sequence(1, 0) would yield the DESCENDING [1, 0] —
      // zero-copy docs must be filtered before the explode, not
      // handed an empty range
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("copies"))).as("copy"))
  }

  /** Shard manifest with content checksums — the integrity ledger a
    * 100 TB export writes next to its shards: per shard (the q60
    * seeded-hash layout), document count, estimated token total, and
    * an order-independent content checksum (the DECIMAL sum of each
    * doc's 60-bit normalized-text hash, mod 2⁶⁰). A re-read of any
    * shard recomputes its row and a mismatch pinpoints silent
    * corruption/truncation to one shard without touching the rest —
    * sum-based so the checksum is independent of row order and
    * partition layout.
    *
    * SCALE SHAPE: one map-only hash pass fused into the scan, one
    * partial-aggregated exchange on ≤2^shardBits keys; text never
    * outlives its hash.
    */
  def shardManifest(documents: DataFrame, shardBits: Int = 8): DataFrame =
    documents
      .select(
        shiftright(hash60(concat(lit("shuffle|"), col("doc_id"))),
          60 - shardBits).as("shard"),
        ceil(col("n_chars") / 4.0).cast("long").as("et"),
        hash60(normText(col("text"))).as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("et")).as("n_tokens"),
        pmod(sum(col("h").cast("decimal(38,0)")),
          lit(1L << 60).cast("decimal(38,0)"))
          .cast("long").as("checksum"))

  /** Release assembly — the "cut the release" capstone composing the
    * round-9 family into ONE declarative plan: drop aggressive-norm
    * duplicate variants (q117's tier, min-id keeper), expand the
    * survivors to their multi-epoch repeat factors (q116's exact
    * micro-rates over the DEDUPED token mass), and emit the q119
    * integrity manifest of the materialized release — per shard (the
    * copy-aware seeded hash, so a doc's epochs spread across shards):
    * row count, token total, and the order-independent content
    * checksum with copy multiplicity. The output IS the release
    * ledger a downstream trainer verifies against.
    *
    * SCALE SHAPE: composing adds nothing beyond the constituents —
    * one corpus-scale exchange on the norm hash (the dedup's own key,
    * REUSED by the keeper join: groupBy and join share partitioning),
    * one tiny per-source token aggregate broadcast back, the copies
    * explode fused into the scan, and the final ≤2^bits-key rollup.
    * Text never outlives its 60-bit hash.
    */
  def releaseAssembly(documents: DataFrame, budgetTokens: Long = 120000L,
                      shardBits: Int = 8): DataFrame = {
    val aggNorm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val keyed = documents.select(col("doc_id"), col("source"),
      col("n_chars"), md5(aggNorm).as("nm"), hash60(normText(col("text"))).as("h"))
    val keep = keyed.groupBy(col("nm")).agg(min(col("doc_id")).as("keep_id"))
    val surv = keyed.join(keep, "nm").filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("h"))
    val perSrc = surv
      .select(col("source"), ceil(col("n_chars") / 4.0).cast("long").as("et"))
      .groupBy(col("source")).agg(sum(col("et")).as("tok"))
    val micro = 1L << 20
    val rates = perSrc
      .crossJoin(broadcast(perSrc.agg(count(lit(1)).as("nsrc"))))
      .select(col("source"),
        floor(lit(micro) * lit(budgetTokens) / (col("nsrc") * col("tok")))
          .cast("long").as("rate_micro"))
    surv
      .join(broadcast(rates), "source")
      .select(col("doc_id"), col("h"),
        ceil(col("n_chars") / 4.0).cast("long").as("et"),
        (expr(s"rate_micro div $micro") +
          when(pmod(hash60(concat(lit("epoch|"), col("doc_id"))),
            lit(micro)) < pmod(col("rate_micro"), lit(micro)), 1L)
            .otherwise(0L)).as("copies"))
      .filter(col("copies") >= 1)
      .select(col("h"), col("et"),
        explode(sequence(lit(1L), col("copies"))).as("copy"),
        col("doc_id"))
      .select(
        shiftright(hash60(concat(lit("shuffle|"), col("doc_id"),
          lit("#"), col("copy"))), 60 - shardBits).as("shard"),
        col("et"), col("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("et")).as("n_tokens"),
        pmod(sum(col("h").cast("decimal(38,0)")),
          lit(1L << 60).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }

  /** One-pass fused preprocessing — the whole per-document decision
    * surface (quality gate, language route, PII scrub, split
    * assignment, keep verdict) computed in a SINGLE scan of the
    * corpus. At 100 TB the difference between running q22/q23/q44/q46
    * as four passes and this one fused pass is three full corpus
    * reads; Spark fuses every expression here into one
    * whole-stage-codegen stage over the scan (zero exchanges,
    * CorpusSpec-asserted).
    *
    * Semantics are exactly the standalone operators': the language
    * pick is [[TextOps.languageId]]'s argmax (dictionary-order ties),
    * the scrub is [[TextOps.scrub]]'s pattern, the split is
    * [[TextOps.trainSplit]]'s seeded buckets.
    */
  def preprocess(documents: DataFrame, minTokens: Int = 50,
                 trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val pat = TextOps.scrubPat(TextOps.scrubTerms)
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    val scored = documents
      .select(col("doc_id"), col("source"), col("text"),
        words(col("text")).as("ws"))
      .select(Seq(col("doc_id"), col("source"),
        size(col("ws")).as("n_tokens"),
        (size(filter(col("ws"), w => array_contains(stopArr, w)))
          .cast("double") / size(col("ws"))).as("stopword_ratio"),
        size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
          .as("n_hits"),
        md5(regexp_replace(lower(col("text")), pat, "<X>"))
          .as("scrubbed_md5"),
        pmod(hash60(concat(lit("split|"), col("doc_id"))), lit(100))
          .as("bucket")) ++
        TextOps.dicts.map { case (name, dict) =>
          val arr = array(dict.map(lit): _*)
          size(filter(col("ws"), w => array_contains(arr, w)))
            .as(s"score_$name")
        }: _*)
    val best = TextOps.dicts.map { case (n, _) => col(s"score_$n") }
      .reduceLeft(greatest(_, _))
    val pred = TextOps.dicts.foldRight(lit("und"): Column) {
      case ((n, _), acc) => when(col(s"score_$n") === best, lit(n))
        .otherwise(acc)
    }
    scored
      .withColumn("predicted", pred)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .withColumn("keep",
        col("n_tokens") >= minTokens && col("n_hits") === 0)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("stopword_ratio"), col("predicted"), col("split"),
        col("n_hits"), col("scrubbed_md5"), col("keep"))
  }

  /** Token-window chunking: split every document into fixed-size
    * windows of `size` tokens advancing by `stride` (overlap =
    * size - stride) — how long documents become training/retrieval
    * chunks. Emits per chunk its index, token count, and content
    * address (md5 of the joined tokens). The final partial window is
    * kept iff it starts inside the document (standard tail rule).
    *
    * SCALE SHAPE: map-only — the window arithmetic is a per-row
    * sequence + transform fused into the scan; the explode multiplies
    * rows by ~len/stride but shuffles nothing.
    */
  def chunk(documents: DataFrame, size: Int = 32,
            stride: Int = 24): DataFrame = {
    require(stride >= 1 && size >= stride,
      "need 1 <= stride <= size (overlap = size - stride)")
    val nChunksMinus1 = greatest(
      ceil((org.apache.spark.sql.functions.size(col("ws")) - lit(size))
        .cast("double") / stride).cast("long"), lit(0L))
    documents
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        explode_outer(sequence(lit(0L), nChunksMinus1)).as("ci"))
      .filter(col("ci").isNotNull)
      .select(col("doc_id"), col("ci").cast("int").as("chunk_id"),
        slice(col("ws"), (col("ci") * stride + 1).cast("int"), lit(size))
          .as("cw"))
      .select(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("cw")).as("chunk_tokens"),
        md5(concat_ws(" ", col("cw"))).as("chunk_md5"))
  }

  /** Per-document duplicate-chunk fraction (q114): chunk every
    * document into NON-overlapping content-addressed windows (the
    * q63 chunker with stride = size), count each chunk hash across
    * the corpus, and report per document how much of it also appears
    * elsewhere — the RefinedWeb-style "what share of this page is
    * boilerplate" signal that feeds a drop-or-trim decision where
    * whole-document dedup (q25/q26) would either keep or kill the
    * page outright.
    *
    * SCALE SHAPE: chunks reduce to (doc_id, chunk_md5, token count)
    * — chunk TEXT never materializes past its md5; the frequency
    * table is corpus-vocabulary-scale so it never broadcasts — the
    * rejoin is a chunk-hash-keyed shuffled join of ids+hashes, then
    * one doc_id rollup. Three hash-scale exchanges, zero payload
    * movement.
    */
  def chunkDupFraction(documents: DataFrame, size: Int = 32): DataFrame = {
    val ch = chunk(documents, size, size)
      .select(col("doc_id"), col("chunk_tokens"), col("chunk_md5"))
    val freq = ch.groupBy(col("chunk_md5")).agg(count(lit(1)).as("cf"))
    ch.join(freq, "chunk_md5")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cf") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("chunk_tokens").cast("long")).as("n_tokens"),
        sum(when(col("cf") > 1, col("chunk_tokens").cast("long"))
          .otherwise(0L)).as("dup_tokens"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        col("n_tokens"),
        expr("(dup_tokens * 1000) div n_tokens").as("dup_permille"))
  }

  // ---- driver bindings -------------------------------------------------

  /** Per-column data-quality profile of ANY table in one pass — the
    * screen a pipeline runs over a new delivery before training: row
    * and null counts, lexicographic min/max of the string rendering,
    * and a KMV distinct-cardinality estimate (the q58 estimator,
    * bit-portable) per column.
    *
    * SCALE SHAPE: the unpivot multiplies rows by #columns but every
    * aggregate here (count, conditional count, min, max, the bounded
    * bottom-k sketch) partial-aggregates, so the single exchange on
    * the #columns-sized key space moves per-partition sketch state,
    * never data — the 5-reducer key space is safe BECAUSE map-side
    * combine has already collapsed each partition to #columns rows.
    *
    * Nulls ride the sketch as a Long.MaxValue sentinel (no 60-bit
    * hash can reach it, so it occupies a bottom-k slot only when the
    * column has fewer than k real distinct values and is dropped
    * after the merge) — n_kept counts real distinct values only.
    */
  def profileTable(df: DataFrame, columns: Seq[String] = Nil,
                   k: Int = 16): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val sentinel = Long.MaxValue
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.c").as("col_name"), col("p.v").as("v"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("v").isNull, lit(1))).as("n_nulls"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        Aggregators.bottomKDistinct(k)(
          coalesce(hash60(col("v")), lit(sentinel))).as("ks0"))
      .withColumn("ks", filter(col("ks0"), _ =!= lit(sentinel)))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        size(col("ks")).as("n_kept"),
        when(size(col("ks")) > 0,
          element_at(col("ks"), size(col("ks")))).as("kth_min"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0d) /
            col("kth_min").cast("double")))
  }

  /** Per-source document cap (q85): keep at most `cap` documents per
    * source, chosen by a seeded-hash priority — the FineWeb-style
    * per-domain cap that stops one giant crawl domain from dominating
    * the mixture. The selection is a deterministic uniform sample
    * (smallest `cap` values of md5-based priority, ties by doc_id),
    * so reruns and engines agree bit-for-bit.
    *
    * SCALE SHAPE: the cap rides the bounded
    * [[graft.functions.Aggregators.topK]] aggregator keyed by source
    * — each map task keeps ≤ cap candidates per source, so the one
    * exchange moves (source, priority, id) partials, never documents,
    * and there is no rank window over the corpus. The kept-id set
    * (cap × |sources| rows) then joins the payload back — small
    * enough to broadcast at any corpus size where the cap itself is
    * sane. The source key space is low-cardinality by nature; the
    * per-source merge holds ≤ cap entries, fine for caps into the
    * 10⁵ range — beyond that, switch to a two-pass histogram
    * threshold on the priority (the q59 machinery).
    */
  def sourceCap(documents: DataFrame, cap: Int = 10,
                seed: String = "cap"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    // priority = seeded 32-bit md5 hash of the id (Portable.hash32
    // spelling: md5(seed || '|' || id)); negated because topK keeps
    // the LARGEST sims — so smallest priorities survive, ties by id.
    val pri = hash32(col("doc_id").cast("string"), seed)
    val kept = documents
      .groupBy(col("source"))
      .agg(Aggregators.topK(cap)(
        -pri.cast("double"), col("doc_id")).as("ks"))
      .select(explode(col("ks")).as("k"))
      .select(col("k.id").as("doc_id"))
    documents.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"))
      .join(broadcast(kept), Seq("doc_id"))
  }

  /** Per-source distribution drift (q90): exact total-variation
    * distance between each source's unigram distribution and the
    * corpus-wide distribution —
    * TV_s = ½ Σ_w |c_sw/T_s − c_w/T|. The mixture-QA number a
    * pipeline publishes per ingest batch: a source whose TV jumps is
    * a source whose content changed (new boilerplate, crawl drift,
    * encoding breakage) before any downstream metric notices. Words
    * absent from the source contribute their full corpus mass, folded
    * in closed form as (T − Σ_{w∈s} c_w)/T — no vocabulary
    * densification join.
    *
    * Exactness: per-word numerators are |c_sw·T − c_w·T_s| in
    * DECIMAL(38,0) (≤10²⁴ at a trillion tokens — HUGEINT on the
    * oracle side), summed order-free; the final doubles are one fixed
    * IEEE op sequence over exact sums.
    *
    * SCALE SHAPE: same skeleton as the q89 PMI report — corpus
    * collapses to (source, word) counts through ONE token-scale
    * map-side-combined exchange; the word marginal re-aggregates on
    * vocab keys and joins back hash-partitioned; source totals
    * broadcast; output is #sources rows.
    */
  def sourceDrift(documents: DataFrame): DataFrame = {
    // explicit not-null filters keep every consumer branch of sw on
    // the identical scan subtree so the token-scale (source, w)
    // exchange is plan-reused, not recomputed (see distinctiveTokens)
    val sw = documents
      .select(col("source"), explode(words(col("text"))).as("w"))
      .filter(col("source").isNotNull && col("w").isNotNull)
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c_sw"))
    val cw = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val ts = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("t_s"))
    val tot = ts.agg(sum(col("t_s")).as("t"))
    val num = abs(
      col("c_sw").cast("decimal(19,0)") * col("t").cast("decimal(19,0)") -
        col("c_w").cast("decimal(19,0)") * col("t_s").cast("decimal(19,0)"))
    sw.join(cw, "w")
      .join(broadcast(ts), "source")
      .crossJoin(broadcast(tot))
      .groupBy(col("source"), col("t_s"), col("t"))
      .agg(count(lit(1)).as("n_words"),
        sum(num).as("num_sum"),
        sum(col("c_w")).as("cw_sum"))
      .select(col("source"), col("n_words"),
        ((col("num_sum").cast("double") /
          (col("t_s").cast("double") * col("t").cast("double")) +
          (col("t").cast("double") - col("cw_sum").cast("double")) /
            col("t").cast("double")) * 0.5).as("tv_dist"))
  }

  /** Temperature-scaled mixture sampling (α = 0.5): per-source keep
    * rates ∝ sqrt of the source's token share, so small sources are
    * upsampled relative to proportional mixing — the standard
    * multilingual/multi-domain rebalance (reference has no analog;
    * complements q61's waterfill with the smooth-α policy used when
    * no per-source token budget is dictated). A global token budget
    * (`budgetNum/budgetDen` of all tokens) is split across sources
    * ∝ floor(sqrt(t_s)·2²⁰); each doc keeps iff
    * h32(doc) · t_s < planned_s · 2³², an exact integer Bernoulli
    * with rate planned_s/t_s — no float thresholds anywhere near the
    * corpus-sized decision.
    *
    * SCALE SHAPE: per-source token totals through one tiny-key
    * exchange; the #sources-row plan table broadcasts back; the keep
    * decision and the kept-token rollup are map-side against that
    * broadcast (one more tiny-key exchange for the report). The
    * corpus never shuffles. All cross-source arithmetic is integer /
    * DECIMAL(38,0) (exact at 100 TB token counts: products stay
    * below 2⁸⁰ « 10³⁸); the only double op is a single sqrt per
    * SOURCE, bit-identical across engines on identical operands.
    */
  /** The α=0.5 plan table (source, t_s, wq, planned) for a
    * (source, n_tok) frame — the budget-split math shared by q91 and
    * the q100 pipeline. planned_s = floor(floor(t·num/den)·wq_s/wsum),
    * spelled as remainder-subtract-then-divide so the decimal division
    * is exact (no dependence on either engine's quotient rounding). */
  private[operators] def mixturePlan(toks: DataFrame, budgetNum: Int,
                                     budgetDen: Int): DataFrame = {
    require(budgetNum >= 1 && budgetDen >= budgetNum,
      s"budget fraction must be in (0,1]: $budgetNum/$budgetDen")
    val ts = toks.groupBy(col("source")).agg(sum(col("n_tok")).as("t_s"))
      .withColumn("wq",
        floor(sqrt(col("t_s").cast("double")) * lit(1048576.0d))
          .cast("long"))
    val tot = ts.agg(sum(col("t_s")).as("t"), sum(col("wq")).as("wsum"))
    val q = expr(s"(t * $budgetNum) div $budgetDen").cast("decimal(38,0)") *
      col("wq").cast("decimal(38,0)")
    ts.crossJoin(broadcast(tot))
      .withColumn("planned",
        ((q - pmod(q, col("wsum").cast("decimal(38,0)"))) /
          col("wsum").cast("decimal(38,0)")).cast("decimal(38,0)"))
      .select(col("source"), col("t_s"), col("wq"), col("planned"))
  }

  /** The exact integer Bernoulli keep rule h32·t_s < planned·2³²,
    * evaluated against [[mixturePlan]] columns. */
  private[operators] def mixtureKeep: Column =
    hash32(col("doc_id").cast("string"), "mix")
      .cast("decimal(38,0)") * col("t_s").cast("decimal(38,0)") <
      col("planned") * lit(4294967296L).cast("decimal(38,0)")

  def tempMixture(documents: DataFrame, budgetNum: Int = 1,
                  budgetDen: Int = 4): DataFrame = {
    val toks = documents
      .filter(col("source").isNotNull)
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("long").as("n_tok"))
    val st = mixturePlan(toks, budgetNum, budgetDen)
    val kept = toks.join(broadcast(st), "source").filter(mixtureKeep)
    kept.groupBy(col("source"), col("t_s"), col("wq"), col("planned"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens"))
      .select(col("source"), col("t_s"), col("wq"),
        col("planned").cast("long").as("planned"),
        col("kept_docs"), col("kept_tokens"))
  }

  /** q100: the composed curation pipeline — quality/PII filter (the
    * q62 keep rule) → α=0.5 temperature subsample over the SURVIVORS
    * (the q91 plan + Bernoulli keep) → sequence packing → the q70
    * per-source packing report, all as ONE declarative plan. This is
    * the capstone composition check: every stage is the same operator
    * a user calls standalone, and Catalyst still fuses the filter and
    * sampling decisions into the scans — the corpus is read for the
    * mixture totals and the pack, but never shuffled except by the
    * pack's own shard exchange.
    *
    * SCALE SHAPE: stage exchanges only — the survivors' per-source
    * token totals (tiny key), the pack's (source, shard) exchange,
    * and the report rollups. The filter + keep predicates are
    * map-side against the broadcast plan table; no new shuffle
    * appears from composing.
    */
  def curationPipeline(documents: DataFrame, minTokens: Int = 50,
                       budgetNum: Int = 1, budgetDen: Int = 2,
                       budget: Int = 256, shards: Int = 4): DataFrame = {
    val pat = graft.operators.TextOps.scrubPat(
      graft.operators.TextOps.scrubTerms)
    val kept = documents
      .filter(col("source").isNotNull)
      .select(col("doc_id"), col("source"), col("text"),
        size(words(col("text"))).cast("long").as("n_tok"),
        size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
          .as("n_hits"))
      .filter(col("n_tok") >= minTokens && col("n_hits") === 0)
    val st = mixturePlan(
      kept.select(col("doc_id"), col("source"), col("n_tok")),
      budgetNum, budgetDen)
    val sampled = kept.join(broadcast(st), "source").filter(mixtureKeep)
      .select(col("doc_id"), col("source"), col("text"))
    packStats(sampled, budget, shards)
  }

  /** Per-source filter-funnel report: how many documents survive each
    * stage of a sequential quality pipeline (length bounds → minimum
    * word count → mean-word-length band → distinct-word ratio). The
    * per-stage attrition table is the first thing a corpus curation
    * run looks at before committing filter thresholds (FineWeb-style
    * ablation reporting); every predicate is integer-only
    * (cross-multiplied ratios, no float thresholds).
    *
    * SCALE SHAPE: the whole decision surface computes in ONE fused
    * map-only scan (the q62 pattern — stage booleans are cheap column
    * expressions over the token array), then the report is a single
    * tiny-key (#sources) partial-aggregated exchange. Nothing else
    * moves.
    */
  def filterFunnel(documents: DataFrame,
                   minChars: Int = 200, maxChars: Int = 100000,
                   minWords: Int = 30): DataFrame = {
    val ws = documents
      .filter(col("source").isNotNull)
      .select(col("source"), col("n_chars"), words(col("text")).as("ws"))
    val m = ws.select(col("source"), col("n_chars"),
      size(col("ws")).cast("long").as("n_w"),
      size(array_distinct(col("ws"))).cast("long").as("n_d"),
      aggregate(transform(col("ws"), w => length(w).cast("long")),
        lit(0L), (a, x) => a + x).as("wchars"))
    val s1 = col("n_chars") >= minChars && col("n_chars") <= maxChars
    val s2 = s1 && col("n_w") >= minWords
    // mean word length in [3, 10] as integer cross-multiplication
    val s3 = s2 && col("wchars") >= col("n_w") * 3 &&
      col("wchars") <= col("n_w") * 10
    // ≥ 40% distinct words: n_d / n_w ≥ 2/5
    val s4 = s3 && col("n_d") * 5 >= col("n_w") * 2
    m.groupBy(col("source")).agg(
      count(lit(1)).as("total"),
      sum(when(s1, 1L).otherwise(0L)).as("after_len"),
      sum(when(s2, 1L).otherwise(0L)).as("after_words"),
      sum(when(s3, 1L).otherwise(0L)).as("after_wordlen"),
      sum(when(s4, 1L).otherwise(0L)).as("after_distinct"))
  }

  /** Cross-source content overlap WITHOUT a cross-source join: each
    * source folds its distinct 3-shingle 60-bit hashes into a KMV
    * bottom-k sketch (the q58 aggregator, bigger k), and every
    * pairwise Jaccard estimate is computed from the two sketches
    * alone — |bottom-k(A∪B) ∩ A ∩ B| / |bottom-k(A∪B)|, the standard
    * KMV coincidence estimator. This is how "which sources duplicate
    * each other?" is answered at 100 TB: the full pairwise shingle
    * join (q29 between every source pair) is quadratic in sources
    * and corpus-sized per pair; the sketch pass is one corpus scan
    * and a #sources²-row tail.
    *
    * SCALE SHAPE: one exchange carrying only ≤ k longs per source per
    * map task (the mergeable sketch state); the pairwise stage is a
    * broadcast self-join of the #sources-row sketch table — model-
    * sized no matter the corpus. Deterministic: md5-based hashes,
    * integer counts, one final double division on exact operands.
    */
  def sourceOverlap(documents: DataFrame, k: Int = 128): DataFrame = {
    val sk = documents
      .select(col("source"), words(col("text")).as("ws"))
      .select(col("source"), explode_outer(shingles(col("ws"), 3)).as("g"))
      .filter(col("source").isNotNull && col("g").isNotNull)
      .select(col("source"), hash60(col("g")).as("h"))
      .groupBy(col("source"))
      .agg(Aggregators.bottomKDistinct(k)(col("h")).as("ks"))
    val a = sk.select(col("source").as("s1"), col("ks").as("ka"))
    val b = sk.select(col("source").as("s2"), col("ks").as("kb"))
    a.join(broadcast(b), col("s1") < col("s2"))
      // bottom-k of the union: both inputs are distinct+sorted, so
      // array_union dedups and array_sort re-establishes order
      .withColumn("u",
        slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
      .withColumn("common", size(array_intersect(col("u"),
        array_intersect(col("ka"), col("kb")))))
      .select(col("s1"), col("s2"),
        size(col("u")).cast("long").as("k_used"),
        col("common").cast("long").as("n_common"),
        (col("common").cast("double") / size(col("u")).cast("double"))
          .as("jaccard_est"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_source_drift"  -> ((s, d) => sourceDrift(Tables.documents(s, d))),
    "q85_source_cap"    -> ((s, d) => sourceCap(Tables.documents(s, d))),
    "q75_profile"       -> ((s, d) => profileTable(Tables.documents(s, d))),
    // shards pinned to the oracle's `% 4` — the operator default is
    // cluster-derived and would drift with local[32]'s parallelism
    "q57_seq_pack"      -> ((s, d) => seqPack(Tables.documents(s, d),
                                              shards = 4)),
    "q58_vocab_sketch"  -> ((s, d) => vocabSketch(Tables.documents(s, d))),
    "q59_len_quantiles" -> ((s, d) => lenQuantiles(Tables.documents(s, d))),
    "q60_shuffle_order" -> ((s, d) => shuffleOrder(Tables.documents(s, d))),
    "q109_curriculum"   -> ((s, d) => curriculumOrder(Tables.documents(s, d))),
    // two deterministic snapshot views of the same table: "old" drops
    // the %10==9 ids, "new" drops %10==0 and mutates %4==0 texts
    "q114_chunk_dup"    -> ((s, d) => chunkDupFraction(Tables.documents(s, d))),
    "q112_corpus_diff"  -> ((s, d) => {
      val docs = Tables.documents(s, d)
      corpusDiff(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 9),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(4)) === 0,
              concat(col("text"), lit(" updated"))).otherwise(col("text"))))
    }),
    "q61_mix_rebalance" -> ((s, d) => mixRebalance(Tables.documents(s, d))),
    "q116_epoch_repeat" -> ((s, d) => epochRepeat(Tables.documents(s, d))),
    "q124_release" -> ((s, d) => releaseAssembly(Tables.documents(s, d))),
    "q126_topic_order" -> ((s, d) => topicOrder(Tables.documents(s, d))),
    "q119_shard_manifest" -> ((s, d) => shardManifest(Tables.documents(s, d))),
    "q62_preprocess"    -> ((s, d) => preprocess(Tables.documents(s, d))),
    "q63_chunk"         -> ((s, d) => chunk(Tables.documents(s, d))),
    "q70_pack_stats"    -> ((s, d) => packStats(Tables.documents(s, d),
                                                shards = 4)),
    "q91_temp_mix"       -> ((s, d) => tempMixture(Tables.documents(s, d))),
    "q92_filter_funnel"  -> ((s, d) => filterFunnel(Tables.documents(s, d))),
    "q93_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d))),
    // shards pinned to 4 like q57/q70 so the oracle's `% 4` matches
    "q100_pipeline"      -> ((s, d) => curationPipeline(Tables.documents(s, d)))
  )

  private val wsSql =
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  def oracle: Map[String, String] = Map(
    /* q100: the q62 keep rule, the q91 mixture CTEs over the
     * survivors, and the q57/q70 pack report, chained verbatim. */
    "q100_pipeline" -> {
      val pat = graft.operators.TextOps.scrubPat(
        graft.operators.TextOps.scrubTerms)
      s"""
      WITH k AS (
        SELECT doc_id, source, text, CAST(len(ws) AS BIGINT) AS n_tok
        FROM (SELECT doc_id, source, text, $wsSql AS ws
              FROM documents WHERE source IS NOT NULL)
        WHERE len(ws) >= 50
          AND len(regexp_extract_all(lower(text), '$pat')) = 0),
      ts AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS t_s
             FROM k GROUP BY 1),
      wq AS (SELECT source, t_s,
               CAST(floor(sqrt(CAST(t_s AS DOUBLE)) * 1048576.0)
                 AS BIGINT) AS wq
             FROM ts),
      tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS t,
                     CAST(sum(wq) AS BIGINT) AS wsum FROM wq),
      st AS (SELECT source, t_s, wq,
               (((t * 1) // 2) * CAST(wq AS HUGEINT))
                 // CAST(wsum AS HUGEINT) AS planned
             FROM wq CROSS JOIN tot),
      samp AS (
        SELECT k.doc_id, k.source, k.n_tok
        FROM k JOIN st USING (source)
        WHERE ('0x' || substr(md5('mix|' || CAST(k.doc_id AS VARCHAR)),
                 1, 8))::BIGINT * CAST(st.t_s AS HUGEINT)
              < st.planned * 4294967296),
      p AS (
        SELECT doc_id, source, n_tok AS n_tokens,
               ('0x' || substr(md5('pack|' || doc_id), 1, 15))::BIGINT % 4
                 AS shard
        FROM samp),
      s AS (
        SELECT doc_id, source, shard, n_tokens,
               COALESCE(sum(n_tokens) OVER (PARTITION BY source, shard
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS st
        FROM p),
      seqs AS (
        SELECT source, shard, CAST(floor(st / 256) AS BIGINT) AS seq_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS toks
        FROM s GROUP BY 1, 2, 3)
      SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             CAST(sum(toks) AS DOUBLE) / (count(*) * 256) AS fill_rate
      FROM seqs GROUP BY source"""
    },
    /* q91: all mixture arithmetic in BIGINT/HUGEINT (// is exact
     * integer division, mirroring Spark's remainder-subtract decimal
     * spelling); the only double op is the per-source sqrt — IEEE
     * correctly-rounded in both engines. */
    "q91_temp_mix" -> s"""
      WITH toks AS (
        SELECT doc_id, source, CAST(len($wsSql) AS BIGINT) AS n_tok
        FROM documents WHERE source IS NOT NULL),
      ts AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS t_s
             FROM toks GROUP BY 1),
      wq AS (SELECT source, t_s,
               CAST(floor(sqrt(CAST(t_s AS DOUBLE)) * 1048576.0)
                 AS BIGINT) AS wq
             FROM ts),
      tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS t,
                     CAST(sum(wq) AS BIGINT) AS wsum FROM wq),
      st AS (SELECT source, t_s, wq,
               (((t * 1) // 4) * CAST(wq AS HUGEINT))
                 // CAST(wsum AS HUGEINT) AS planned
             FROM wq CROSS JOIN tot),
      kept AS (
        SELECT k.source, s.t_s, s.wq, s.planned, k.n_tok
        FROM toks k JOIN st s USING (source)
        WHERE ('0x' || substr(md5('mix|' || CAST(k.doc_id AS VARCHAR)),
                 1, 8))::BIGINT * CAST(s.t_s AS HUGEINT)
              < s.planned * 4294967296)
      SELECT source, t_s, wq, CAST(planned AS BIGINT) AS planned,
             count(*) AS kept_docs,
             CAST(sum(n_tok) AS BIGINT) AS kept_tokens
      FROM kept GROUP BY 1, 2, 3, 4""",
    /* q92: stage predicates are integer-only (cross-multiplied
     * ratios), list_* mirrors the Spark array lambdas. */
    "q92_filter_funnel" -> s"""
      WITH m AS (
        SELECT source, n_chars,
               CAST(len(ws) AS BIGINT) AS n_w,
               CAST(len(list_distinct(ws)) AS BIGINT) AS n_d,
               CAST(list_sum(list_transform(ws, w -> strlen(w)))
                 AS BIGINT) AS wchars
        FROM (SELECT source, n_chars, $wsSql AS ws
              FROM documents WHERE source IS NOT NULL)),
      f AS (
        SELECT source,
               (n_chars >= 200 AND n_chars <= 100000) AS s1,
               (n_chars >= 200 AND n_chars <= 100000
                 AND n_w >= 30) AS s2,
               (n_chars >= 200 AND n_chars <= 100000 AND n_w >= 30
                 AND wchars >= n_w * 3 AND wchars <= n_w * 10) AS s3,
               (n_chars >= 200 AND n_chars <= 100000 AND n_w >= 30
                 AND wchars >= n_w * 3 AND wchars <= n_w * 10
                 AND n_d * 5 >= n_w * 2) AS s4
        FROM m)
      SELECT source, count(*) AS total,
             CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT)
               AS after_len,
             CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT)
               AS after_words,
             CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT)
               AS after_wordlen,
             CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT)
               AS after_distinct
      FROM f GROUP BY 1""",
    /* q93: the sketch is the bottom-128 distinct 60-bit 3-shingle
     * hashes per source (row_number mirror of the KMV aggregator);
     * the pairwise estimator re-ranks the union of the two sketches
     * and counts coincidences inside its bottom-k. */
    "q93_source_overlap" -> s"""
      WITH t AS (
        SELECT source, $wsSql AS ws
        FROM documents WHERE source IS NOT NULL),
      g AS (
        SELECT source,
               unnest(CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(ws) - 2),
                   i -> array_to_string(list_slice(ws, i, i + 2), ' '))
                 END) AS g
        FROM t),
      h AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
        FROM g),
      r AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h),
      sk AS (SELECT source, h FROM r WHERE rn <= 128),
      pr AS (
        SELECT a.source AS s1, b.source AS s2
        FROM (SELECT DISTINCT source FROM sk) a
        JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
      uh AS (
        SELECT p.s1, p.s2, s.h,
               max(CASE WHEN s.source = p.s1 THEN 1 ELSE 0 END) AS i1,
               max(CASE WHEN s.source = p.s2 THEN 1 ELSE 0 END) AS i2
        FROM pr p JOIN sk s ON s.source = p.s1 OR s.source = p.s2
        GROUP BY 1, 2, 3),
      rk AS (
        SELECT s1, s2, h, i1, i2,
               row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
        FROM uh)
      SELECT s1, s2, count(*) AS k_used,
             CAST(sum(CASE WHEN i1 = 1 AND i2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_common,
             CAST(sum(CASE WHEN i1 = 1 AND i2 = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS jaccard_est
      FROM rk WHERE rn <= 128 GROUP BY 1, 2""",
    /* q90: HUGEINT numerators mirror the Spark DECIMAL(38,0) sums;
     * the closing double expression is the same IEEE op sequence. */
    "q90_source_drift" -> """
      WITH w AS (
        SELECT source,
               unnest(string_split(trim(regexp_replace(lower(text),
                 '\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      sw AS (SELECT source, w, count(*) AS c_sw FROM w GROUP BY 1, 2),
      cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w
             FROM sw GROUP BY 1),
      ts AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS t_s
             FROM sw GROUP BY 1),
      tot AS (SELECT CAST(sum(c_sw) AS BIGINT) AS t FROM sw),
      g AS (
        SELECT source, t_s, t,
               count(*) AS n_words,
               sum(abs(CAST(c_sw AS HUGEINT) * t
                 - CAST(c_w AS HUGEINT) * t_s)) AS num_sum,
               CAST(sum(c_w) AS BIGINT) AS cw_sum
        FROM sw JOIN cw USING (w) JOIN ts USING (source) CROSS JOIN tot
        GROUP BY source, t_s, t)
      SELECT source, n_words,
             (CAST(num_sum AS DOUBLE)
                / (CAST(t_s AS DOUBLE) * CAST(t AS DOUBLE))
              + (CAST(t AS DOUBLE) - CAST(cw_sum AS DOUBLE))
                / CAST(t AS DOUBLE)) * 0.5 AS tv_dist
      FROM g""",
    "q85_source_cap" -> """
      WITH pri AS (
        SELECT doc_id, source,
               ('0x' || substr(md5('cap|' || CAST(doc_id AS VARCHAR)),
                 1, 8))::BIGINT AS h
        FROM documents),
      keep AS (
        SELECT doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY h ASC, doc_id ASC) AS rn
          FROM pri)
        WHERE rn <= 10)
      SELECT d.doc_id, d.source, d.lang, d.n_chars
      FROM documents d JOIN keep USING (doc_id)""",
    /* q75: unpivot the documents columns to (col_name, string value),
     * then the base stats + the q58 KMV estimator per column. No
     * sentinel needed here — the h CTE just excludes NULLs, which is
     * what the Spark side's filtered sketch computes. */
    "q75_profile" -> """
      WITH u AS (
        SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
        UNION ALL SELECT 'text', text FROM documents
        UNION ALL SELECT 'lang', lang FROM documents
        UNION ALL SELECT 'source', source FROM documents
        UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents),
      base AS (
        SELECT col_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               min(v) AS min_v, max(v) AS max_v
        FROM u GROUP BY col_name),
      h AS (
        SELECT DISTINCT col_name,
               ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
        FROM u WHERE v IS NOT NULL),
      r AS (
        SELECT col_name, h,
               row_number() OVER (PARTITION BY col_name ORDER BY h) AS rn
        FROM h),
      kk AS (
        SELECT col_name, count(*) AS n_kept, max(h) AS kth_min
        FROM r WHERE rn <= 16 GROUP BY col_name)
      SELECT b.col_name, b.n_rows, b.n_nulls, b.min_v, b.max_v,
             CAST(COALESCE(kk.n_kept, 0) AS INT) AS n_kept, kk.kth_min,
             CASE WHEN COALESCE(kk.n_kept, 0) < 16
                  THEN CAST(COALESCE(kk.n_kept, 0) AS DOUBLE)
                  ELSE 15.0 * 1152921504606846976.0 / kk.kth_min
             END AS est_distinct
      FROM base b LEFT JOIN kk ON kk.col_name = b.col_name""",
    "q57_seq_pack" -> s"""
      WITH t AS (
        SELECT doc_id, source, len($wsSql) AS n_tokens,
               ('0x' || substr(md5('pack|' || doc_id), 1, 15))::BIGINT % 4
                 AS shard
        FROM documents),
      s AS (
        SELECT doc_id, source, shard, n_tokens,
               COALESCE(sum(n_tokens) OVER (PARTITION BY source, shard
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS st
        FROM t)
      SELECT doc_id, source, CAST(shard AS INT) AS shard,
             CAST(n_tokens AS INT) AS n_tokens,
             CAST(floor(st / 256) AS BIGINT) AS seq_id,
             CAST(st % 256 AS INT) AS seq_offset
      FROM s""",
    "q70_pack_stats" -> s"""
      WITH t AS (
        SELECT doc_id, source, len($wsSql) AS n_tokens,
               ('0x' || substr(md5('pack|' || doc_id), 1, 15))::BIGINT % 4
                 AS shard
        FROM documents),
      s AS (
        SELECT doc_id, source, shard, n_tokens,
               COALESCE(sum(n_tokens) OVER (PARTITION BY source, shard
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS st
        FROM t),
      seqs AS (
        SELECT source, shard, CAST(floor(st / 256) AS BIGINT) AS seq_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS toks
        FROM s GROUP BY 1, 2, 3)
      SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             CAST(sum(toks) AS DOUBLE) / (count(*) * 256) AS fill_rate
      FROM seqs GROUP BY source""",
    "q58_vocab_sketch" -> s"""
      WITH t AS (
        SELECT source, $wsSql AS ws FROM documents),
      g AS (
        SELECT source,
               unnest(CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(ws) - 1),
                   i -> array_to_string(list_slice(ws, i, i + 1), ' ')) END)
                 AS g
        FROM t),
      h AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
        FROM g),
      r AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h),
      kk AS (
        SELECT source, count(*) AS n_kept, max(h) AS kth_min
        FROM r WHERE rn <= 16 GROUP BY source)
      SELECT source, CAST(n_kept AS INT) AS n_kept, kth_min,
             CASE WHEN n_kept < 16 THEN CAST(n_kept AS DOUBLE)
                  ELSE 15.0 * 1152921504606846976.0 / kth_min
             END AS est_distinct
      FROM kk""",
    "q59_len_quantiles" -> s"""
      WITH hist AS (
        SELECT CAST(floor(len($wsSql) / 8) AS BIGINT) AS bucket,
               count(*) AS cnt
        FROM documents GROUP BY 1),
      c AS (
        SELECT bucket, cnt,
               sum(cnt) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER () AS total
        FROM hist),
      p AS (SELECT unnest([50, 90, 99]) AS p)
      SELECT p, min(bucket) AS bucket, min(bucket) * 8 AS lo,
             min(bucket) * 8 + 7 AS hi
      FROM c CROSS JOIN p
      WHERE cum * 100 >= total * p
      GROUP BY p""",
    "q60_shuffle_order" -> """
      SELECT doc_id,
             row_number() OVER (ORDER BY
               ('0x' || substr(md5('shuffle|' || doc_id), 1, 15))::BIGINT,
               doc_id) AS pos
      FROM documents""",
    /* q112: membership + md5 equality over the same two snapshot
     * views; FULL OUTER on doc_id. */
    "q112_corpus_diff" -> """
      WITH o AS (
        SELECT doc_id, source, md5(text) AS h
        FROM documents WHERE doc_id % 10 <> 9),
      n AS (
        SELECT doc_id, source,
               md5(CASE WHEN doc_id % 4 = 0 THEN text || ' updated'
                        ELSE text END) AS h
        FROM documents WHERE doc_id % 10 <> 0),
      j AS (
        SELECT COALESCE(n.source, o.source) AS source,
               CASE WHEN o.h IS NULL THEN 'added'
                    WHEN n.h IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'same' END AS status
        FROM o FULL OUTER JOIN n USING (doc_id))
      SELECT source,
             CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_added,
             CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_removed,
             CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_changed,
             CAST(sum(CASE WHEN status = 'same' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_same
      FROM j GROUP BY source""",
    /* q109: the engine's (bucket desc, shard, k) order equals
     * (bucket desc, k) because shard is k's own high bits — one
     * global row_number reproduces the prefix-summed positions. */
    "q109_curriculum" -> s"""
      WITH s AS (
        SELECT doc_id,
               ((len(list_filter(ws, w -> list_contains(
                   ${TextOps.sqlArr(TextOps.stopwords)}, w))) * 1000)
                 // len(ws)) // 100 AS bucket
        FROM (SELECT doc_id, $wsSql AS ws FROM documents))
      SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
             row_number() OVER (ORDER BY bucket DESC,
               ('0x' || substr(md5('curriculum|' || doc_id), 1, 15))::BIGINT,
               doc_id) AS pos
      FROM s""",
    /* q116: q61's budget-share CTEs carried as exact 2^-20 micro-rates
     * (no 100% clip — rates above 1 mean whole-corpus epochs), then
     * each doc materializes floor + seeded-Bernoulli-fraction copies
     * via generate_series (empty for copies = 0). */
    "q116_epoch_repeat" -> s"""
      WITH t AS (
        SELECT source, sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS tok
        FROM documents GROUP BY 1),
      n AS (SELECT count(*) AS nsrc FROM t),
      r AS (
        SELECT source,
               CAST(floor(${1048576L * 120000L} / (nsrc * tok))
                 AS BIGINT) AS rate_micro
        FROM t CROSS JOIN n),
      c AS (
        SELECT d.doc_id, d.source,
               r.rate_micro // 1048576 +
               CASE WHEN ('0x' || substr(md5('epoch|' || d.doc_id), 1, 15))
                      ::BIGINT % 1048576 < r.rate_micro % 1048576
                    THEN 1 ELSE 0 END AS copies
        FROM documents d JOIN r USING (source))
      SELECT doc_id, source,
             CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy
      FROM c WHERE copies >= 1""",
    /* q126: 16-bucket hashed-word count features, integer squared-L2
     * argmin against the modulo-sampled centroids (ties -> smallest
     * c_id), then q109's rank/offset CTEs keyed (cluster, shard). */
    "q126_topic_order" -> {
      val buckets = 16
      val xs = (0 until buckets).map(j =>
        s"CAST(len(list_filter(bh, h -> h = $j)) AS BIGINT) AS x$j")
        .mkString(",\n               ")
      val d2 = (0 until buckets).map(j =>
        s"(f.x$j - c.x$j) * (f.x$j - c.x$j)").mkString(" + ")
      s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      b AS (
        SELECT doc_id,
               list_transform(ws, w ->
                 ('0x' || substr(md5('topic|' || w), 1, 15))::BIGINT
                   % $buckets) AS bh
        FROM w),
      f AS (SELECT doc_id, $xs FROM b),
      cents AS (
        SELECT * FROM f WHERE doc_id % 127 = 0),
      d AS (
        SELECT f.doc_id, c.doc_id AS c_id, $d2 AS d2
        FROM f CROSS JOIN cents c),
      assign AS (
        SELECT doc_id, c_id AS cluster FROM (
          SELECT doc_id, c_id,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY d2 ASC, c_id ASC) AS rn
          FROM d)
        WHERE rn = 1),
      k2 AS (
        SELECT doc_id, cluster,
               ('0x' || substr(md5('topicord|' || doc_id), 1, 15))::BIGINT
                 AS k
        FROM assign),
      r AS (
        SELECT doc_id, cluster, k // ${1L << 52} AS shard,
               row_number() OVER (
                 PARTITION BY cluster, k // ${1L << 52}
                 ORDER BY k, doc_id) AS rn
        FROM k2),
      offs AS (
        SELECT cluster, shard,
               coalesce(sum(cnt) OVER (ORDER BY cluster ASC, shard ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS off
        FROM (SELECT cluster, shard, count(*) AS cnt
              FROM r GROUP BY 1, 2))
      SELECT r.doc_id, r.cluster, CAST(off + rn AS BIGINT) AS pos
      FROM r JOIN offs USING (cluster, shard)"""
    },
    /* q124: the q117 keeper CTEs, q116's micro-rate CTEs over the
     * SURVIVORS, the copy unnest, and the q119 manifest with a
     * copy-aware shard key — composed verbatim. */
    "q124_release" -> s"""
      WITH k AS (
        SELECT doc_id, source, n_chars,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                 AS nm,
               ('0x' || substr(md5($normSql), 1, 15))::BIGINT AS h
        FROM documents),
      keep AS (SELECT nm, min(doc_id) AS keep_id FROM k GROUP BY 1),
      surv AS (
        SELECT k.doc_id, k.source, k.n_chars, k.h
        FROM k JOIN keep USING (nm) WHERE k.doc_id = keep.keep_id),
      t AS (
        SELECT source, sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS tok
        FROM surv GROUP BY 1),
      n AS (SELECT count(*) AS nsrc FROM t),
      r AS (
        SELECT source,
               CAST(floor(${1048576L * 120000L} / (nsrc * tok))
                 AS BIGINT) AS rate_micro
        FROM t CROSS JOIN n),
      c AS (
        SELECT s.doc_id, s.h,
               CAST(ceil(s.n_chars / 4.0) AS BIGINT) AS et,
               r.rate_micro // 1048576 +
               CASE WHEN ('0x' || substr(md5('epoch|' || s.doc_id), 1, 15))
                      ::BIGINT % 1048576 < r.rate_micro % 1048576
                    THEN 1 ELSE 0 END AS copies
        FROM surv s JOIN r USING (source)),
      rel AS (
        SELECT doc_id, h, et,
               unnest(generate_series(1, copies)) AS copy
        FROM c WHERE copies >= 1)
      SELECT ('0x' || substr(md5('shuffle|' || doc_id || '#' || copy),
               1, 15))::BIGINT // ${1L << 52} AS shard,
             count(*) AS n_rows,
             CAST(sum(et) AS BIGINT) AS n_tokens,
             CAST(sum(h) % ${1L << 60} AS BIGINT) AS checksum
      FROM rel GROUP BY 1""",
    /* q119: q60's high-bit shard of the seeded doc hash; the checksum
     * is the order-independent HUGEINT sum of 60-bit content hashes
     * mod 2^60. */
    "q119_shard_manifest" -> s"""
      SELECT ('0x' || substr(md5('shuffle|' || doc_id), 1, 15))::BIGINT
               // ${1L << 52} AS shard,
             count(*) AS n_docs,
             CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
               AS n_tokens,
             CAST(sum(('0x' || substr(md5($normSql), 1, 15))::BIGINT)
               % ${1L << 60} AS BIGINT) AS checksum
      FROM documents GROUP BY 1""",
    "q61_mix_rebalance" -> s"""
      WITH t AS (
        SELECT source, sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS tok
        FROM documents GROUP BY 1),
      n AS (SELECT count(*) AS nsrc FROM t),
      r AS (
        SELECT source,
               least(100, CAST(floor(${100L * 40000L} / (nsrc * tok))
                 AS BIGINT)) AS rate_pct
        FROM t CROSS JOIN n)
      SELECT d.doc_id, d.source, r.rate_pct
      FROM documents d JOIN r USING (source)
      WHERE ('0x' || substr(md5('mix|' || d.doc_id), 1, 15))::BIGINT % 100
              < r.rate_pct""",
    "q62_preprocess" -> {
      val pat = TextOps.scrubPat(TextOps.scrubTerms)
      val scoreCols = TextOps.dicts.map { case (name, dict) =>
        s"len(list_filter(ws, w -> list_contains(" +
          s"${TextOps.sqlArr(dict)}, w))) AS score_$name"
      }.mkString(",\n               ")
      val bestExpr = TextOps.dicts.map(d => s"score_${d._1}")
        .reduceLeft((a, b) => s"greatest($a, $b)")
      val caseExpr = TextOps.dicts.map { case (name, _) =>
        s"WHEN score_$name = $bestExpr THEN '$name'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""
      WITH t AS (
        SELECT doc_id, source, text, $wsSql AS ws FROM documents),
      s AS (
        SELECT doc_id, source,
               len(ws) AS n_tokens,
               CAST(len(list_filter(ws, w -> list_contains(
                 ${TextOps.sqlArr(TextOps.stopwords)}, w))) AS DOUBLE)
                 / len(ws) AS stopword_ratio,
               len(regexp_extract_all(lower(text), '$pat')) AS n_hits,
               md5(regexp_replace(lower(text), '$pat', '<X>', 'g'))
                 AS scrubbed_md5,
               ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT
                 % 100 AS bucket,
               $scoreCols
        FROM t)
      SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
             stopword_ratio,
             $caseExpr AS predicted,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(n_hits AS INT) AS n_hits, scrubbed_md5,
             (n_tokens >= 50 AND n_hits = 0) AS keep
      FROM s"""
    },
    "q63_chunk" -> s"""
      WITH t AS (SELECT doc_id, $wsSql AS ws FROM documents),
      c AS (
        SELECT doc_id, ws,
               unnest(generate_series(0,
                 greatest(CAST(ceil((len(ws) - 32) / 24.0) AS BIGINT), 0)))
                 AS ci
        FROM t)
      SELECT doc_id, CAST(ci AS INT) AS chunk_id,
             CAST(len(list_slice(ws, ci*24 + 1, ci*24 + 32)) AS INT)
               AS chunk_tokens,
             md5(array_to_string(list_slice(ws, ci*24 + 1, ci*24 + 32), ' '))
               AS chunk_md5
      FROM c""",
    /* q114: the q63 chunker with stride = size (non-overlapping),
     * corpus-wide chunk-hash counts, per-doc duplicated share. */
    "q114_chunk_dup" -> s"""
      WITH t AS (SELECT doc_id, $wsSql AS ws FROM documents),
      c AS (
        SELECT doc_id, ws,
               unnest(generate_series(0,
                 greatest(CAST(ceil((len(ws) - 32) / 32.0) AS BIGINT), 0)))
                 AS ci
        FROM t),
      ch AS (
        SELECT doc_id,
               CAST(len(list_slice(ws, ci*32 + 1, ci*32 + 32)) AS BIGINT)
                 AS ct,
               md5(array_to_string(list_slice(ws, ci*32 + 1, ci*32 + 32),
                 ' ')) AS h
        FROM c),
      f AS (SELECT h, count(*) AS cf FROM ch GROUP BY h)
      SELECT doc_id, count(*) AS n_chunks,
             CAST(sum(CASE WHEN cf > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
             CAST(sum(ct) AS BIGINT) AS n_tokens,
             (CAST(sum(CASE WHEN cf > 1 THEN ct ELSE 0 END) AS BIGINT)
               * 1000) // CAST(sum(ct) AS BIGINT) AS dup_permille
      FROM ch JOIN f USING (h)
      GROUP BY doc_id"""
  )
}
