package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Skew-handling patterns for hot keys. `events.event_type` has only
  * 5 distinct values — the classic pathological group key where one
  * reducer would receive 20% of a 100 TB stream. The salted two-stage
  * aggregation splits every hot key across `saltBuckets` reducers for
  * the heavy first stage; the second stage combines `saltBuckets`
  * tiny partials per key. Results are identical to the direct
  * aggregation (verified by the oracle), only the shuffle layout
  * changes. (AQE's skew-join splitting handles the join case; salting
  * is the aggregation-side tool.)
  */
object Skew extends graft.QueryModule {

  def saltedAgg(events: DataFrame, saltBuckets: Int): DataFrame =
    events
      .withColumn("salt", pmod(col("event_id"), lit(saltBuckets)))
      .groupBy(col("event_type"), col("salt"))      // stage 1: heavy, spread
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pt"))
      .groupBy(col("event_type"))                   // stage 2: 5 × saltBuckets rows
      .agg(sum(col("pn")).as("n"),
        sum(col("pt")).cast("double").as("total"))

  /** Partition-skew audit for a planned key: hash every row into the
    * shard it WOULD land in (`hash60(key) pmod shards`, the same
    * family the engine's shard ops use), then report the shard-size
    * distribution — min/max/p50/p99 row counts and the skew ratio
    * max·shards/total. This is the pre-flight check before committing
    * a repartition/bucketing layout at 100 TB: a skew ratio near 1
    * means the layout balances; ≫ 1 means a hot key needs salting
    * (q37) or capping (q85). Percentiles resolve by integer
    * cross-multiplication over the sorted shard-count table (the q59
    * histogram-selection rule), never a percentile over raw rows.
    *
    * SCALE SHAPE: one exchange of (shard → partial count) — key space
    * = `shards`, model-sized — then every distribution stat computes
    * on the #shards-row table (tiny window + one-row broadcast). The
    * audited corpus itself never shuffles; the only double op is the
    * final ratio on exact integers.
    */
  def shardSkewAudit(documents: DataFrame, keyCol: String = "source",
                     shards: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    val observed = documents
      .select(pmod(hash60(col(keyCol).cast("string")), lit(shards))
        .as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("c"))
    // fold EMPTY shards back in (a hot key occupying one shard must
    // read as ratio ≈ shards, not 1): the full shard range is a
    // `shards`-row literal table, broadcast against the census
    val counts = spark.range(shards).select(col("id").cast("long")
        .as("shard"))
      .join(observed, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("c"), lit(0L)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("c"),
      col("shard"))
    val ranked = counts
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(counts.agg(
        count(lit(1)).as("n_shards"), sum(col("c")).as("total"),
        min(col("c")).as("min_c"), max(col("c")).as("max_c"))))
    // p-th percentile = first count whose rank covers p% of shards
    // (integer cross-multiplication, no float thresholds)
    def pct(p: Int) = min(when(col("rk") * 100 >= col("n_shards") * p,
      col("c")))
    ranked.groupBy(col("n_shards"), col("total"), col("min_c"),
        col("max_c"))
      .agg(pct(50).as("p50"), pct(99).as("p99"))
      .select(col("n_shards"), col("total"), col("min_c"), col("max_c"),
        col("p50"), col("p99"),
        (col("max_c").cast("double") * col("n_shards").cast("double") /
          col("total").cast("double")).as("skew_ratio"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_salted_agg" -> ((s, d) => saltedAgg(Tables.events(s, d), 16)),
    "q95_shard_skew" -> ((s, d) => shardSkewAudit(Tables.documents(s, d)))
  )

  // q37 is identical to the UNSALTED direct aggregation — that's the
  // point
  def oracle: Map[String, String] = Map(
    "q37_salted_agg" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY event_type""",
    "q95_shard_skew" -> """
      WITH sh AS (
        SELECT ('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 15))
                 ::BIGINT % 64 AS shard
        FROM documents),
      cnt0 AS (SELECT shard, count(*) AS c FROM sh GROUP BY 1),
      cnt AS (
        SELECT gs.shard, COALESCE(c, 0) AS c
        FROM (SELECT unnest(generate_series(0, 63)) AS shard) gs
        LEFT JOIN cnt0 USING (shard)),
      rk AS (
        SELECT c, row_number() OVER (ORDER BY c, shard) AS rk
        FROM cnt),
      tot AS (
        SELECT count(*) AS n_shards, CAST(sum(c) AS BIGINT) AS total,
               CAST(min(c) AS BIGINT) AS min_c,
               CAST(max(c) AS BIGINT) AS max_c
        FROM cnt)
      SELECT n_shards, total, min_c, max_c,
             CAST(min(CASE WHEN rk * 100 >= n_shards * 50 THEN c END)
               AS BIGINT) AS p50,
             CAST(min(CASE WHEN rk * 100 >= n_shards * 99 THEN c END)
               AS BIGINT) AS p99,
             CAST(max_c AS DOUBLE) * CAST(n_shards AS DOUBLE)
               / CAST(total AS DOUBLE) AS skew_ratio
      FROM rk CROSS JOIN tot
      GROUP BY 1, 2, 3, 4"""
  )
}
