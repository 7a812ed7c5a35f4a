package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Deduplication operators for training-data pipelines over
  * `documents`. Scale design notes (100 TB):
  *   - exact dedup: hash-groupBy on a 128-bit content address — one
  *     shuffle of (hash, id), never of the payload;
  *   - MinHash/LSH: candidate pairs come from equi-joining on band
  *     keys (bucket join) — the only scalable alternative to O(n²)
  *     all-pairs; band cardinality bounds bucket skew;
  *   - SimHash: hamming-ball candidates via byte-band equi-join
  *     (pigeonhole: distance ≤3 over 4 bands ⇒ ≥1 identical band);
  *   - n-gram Jaccard: inverted-index join on shingles; a frequency
  *     cap on hot shingles (`maxShingleFreq`) bounds join fan-out,
  *     the standard guard against quadratic blowup on stop-shingles.
  * All hashing is md5-based (Portable) so every op is oracle-checked.
  */
object Dedup extends graft.QueryModule {

  /** Exact dedup groups: content-md5 → canonical (min) doc_id + group
    * size. Duplicates are `n_docs > 1`. */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .select(md5(normText(col("text"))).as("content_md5"), col("doc_id"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** MinHash signature of `k` hashes over 3-word shingles: the
    * signature element for seed i is the lexicographic min of
    * md5(seed_i | shingle) — a valid uniform hash family, portable to
    * any engine with md5.
    */
  def minhashSignature(documents: DataFrame, k: Int): DataFrame = {
    val sh = shingles(words(col("text")), 3)
    val sig = transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(col("sh"),
        s => md5(concat(lit("s"), i.cast("string"), lit("|"), s)))))
    documents
      .select(col("doc_id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** LSH candidate pairs: split the k-element signature into `bands`
    * bands of k/bands rows, key each band by md5 of its slice, and
    * equi-join docs sharing a band key. Emits each unordered pair once
    * with the number of matching bands.
    */
  def minhashPairs(documents: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val r = k / bands
    val sig = minhashSignature(documents, k)
    val banded = sig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * r + 1, lit(r)))))))
      .toDF("doc_id", "band_idx", "band_key")
    val a = banded.toDF("a", "band_idx", "band_key")
    val b = banded.toDF("b", "b_idx", "b_key")
    a.join(b, col("band_idx") === col("b_idx") &&
        col("band_key") === col("b_key") && col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 32-bit SimHash over word multiset: bit j of the fingerprint is 1
    * iff the multiplicity-weighted ±1 vote of token-hash bit j is
    * positive. One pass of word hashing, then 32 integer folds.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val hs = transform(words(col("text")), w => hash32(w))
    // SQL-string HOF: shiftright/shiftleft with a *column* bit count is
    // only exposed through the SQL function, not functions.shiftright.
    val fold = expr("""
      aggregate(sequence(0, 31), 0L, (acc, j) ->
        acc + IF(aggregate(hs, 0L, (a, x) ->
                   a + IF((shiftright(x, j) & 1) = 1, 1L, -1L)) > 0,
                 shiftleft(1L, j), 0L))""")
    documents
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), fold.as("simhash"))
  }

  /** SimHash near-dup candidates: byte-band join (4 bands of 8 bits),
    * then exact hamming distance ≤ `maxDist` via popcount of xor. */
  def simhashPairs(documents: DataFrame, maxDist: Int = 6): DataFrame = {
    val sh = simhash(documents)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, b * 8) & 255)")))
      .toDF("doc_id", "simhash", "band_idx", "band_val")
    val a = banded.toDF("a", "a_sh", "band_idx", "band_val")
    val b = banded.toDF("b", "b_sh", "b_idx", "b_val")
    a.join(b, col("band_idx") === col("b_idx") &&
        col("band_val") === col("b_val") && col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** N-gram Jaccard near-dup pairs: inverted-index join on 3-word
    * shingles (capped at `maxShingleFreq` docs per shingle to bound
    * fan-out), then exact word-set Jaccard ≥ `threshold` on the
    * candidates.
    */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.8,
                        maxShingleFreq: Int = 100): DataFrame = {
    val docs = documents.select(col("doc_id"),
      array_distinct(words(col("text"))).as("wset"),
      shingles(words(col("text")), 3).as("sh"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .distinct()
    val hot = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleFreq)
    val capped = inv.join(hot, "shingle")
    val cands = capped.select(col("shingle"), col("doc_id").as("a"))
      .join(capped.select(col("shingle"), col("doc_id").as("b")), "shingle")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val aw = docs.select(col("doc_id").as("a"), col("wset").as("a_w"))
    val bw = docs.select(col("doc_id").as("b"), col("wset").as("b_w"))
    cands.join(aw, "a").join(bw, "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("a_w"), col("b_w"))).cast("double") /
          size(array_union(col("a_w"), col("b_w")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- driver bindings -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_dedup_exact"    -> ((s, d) => exactGroups(Tables.documents(s, d))),
    "q26_minhash_pairs"  -> ((s, d) => minhashPairs(Tables.documents(s, d))),
    "q27_simhash"        -> ((s, d) => simhash(Tables.documents(s, d))),
    "q28_simhash_pairs"  -> ((s, d) => simhashPairs(Tables.documents(s, d))),
    "q29_jaccard_pairs"  -> ((s, d) => ngramJaccardPairs(Tables.documents(s, d), 0.8))
  )

  // Shared oracle fragments (DuckDB dialect).
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val wordsSql = s"string_split($normSql, ' ')"
  private def shinglesSql(ws: String) =
    s"""CASE WHEN len($ws) < 3 THEN []::VARCHAR[]
        ELSE list_transform(generate_series(1, len($ws) - 2),
               i -> array_to_string(list_slice($ws, i, i + 2), ' ')) END"""

  def oracle: Map[String, String] = Map(
    "q25_dedup_exact" -> s"""
      SELECT md5($normSql) AS content_md5,
             min(doc_id) AS keep_id, count(*) AS n_docs
      FROM documents GROUP BY 1""",
    "q26_minhash_pairs" -> s"""
      WITH sh AS (
        SELECT doc_id, ${shinglesSql(wordsSql)} AS sh FROM documents),
      sig AS (
        SELECT doc_id,
               list_transform(generate_series(0, 15),
                 i -> list_min(list_transform(sh,
                        s -> md5('s' || i || '|' || s)))) AS sig
        FROM sh WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, k AS band_idx,
               md5(array_to_string(list_slice(sig, k*4 + 1, k*4 + 4), '|'))
                 AS band_key
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared_bands
      FROM banded x JOIN banded y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       AND x.doc_id < y.doc_id
      GROUP BY 1, 2""",
    "q27_simhash" -> s"""
      WITH h AS (
        SELECT doc_id,
               list_transform($wordsSql,
                 w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
        FROM documents)
      SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT, generate_series(0, 31)),
               (acc, j) -> acc + CASE WHEN
                 list_reduce(list_prepend(0::BIGINT, hs),
                   (a, x) -> a + CASE WHEN (x >> j) & 1 = 1
                                      THEN 1 ELSE -1 END) > 0
                 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
      FROM h""",
    "q28_simhash_pairs" -> s"""
      WITH h AS (
        SELECT doc_id,
               list_transform($wordsSql,
                 w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
        FROM documents),
      s AS (
        SELECT doc_id,
               list_reduce(list_prepend(0::BIGINT, generate_series(0, 31)),
                 (acc, j) -> acc + CASE WHEN
                   list_reduce(list_prepend(0::BIGINT, hs),
                     (a, x) -> a + CASE WHEN (x >> j) & 1 = 1
                                        THEN 1 ELSE -1 END) > 0
                   THEN (1::BIGINT << j) ELSE 0 END) AS simhash
        FROM h),
      banded AS (
        SELECT doc_id, simhash, k AS band_idx,
               (simhash >> (k * 8)) & 255 AS band_val
        FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
             bit_count(xor(x.simhash, y.simhash)) AS hamming
      FROM banded x JOIN banded y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 6""",
    "q29_jaccard_pairs" -> s"""
      WITH docs AS (
        SELECT doc_id, list_distinct($wordsSql) AS wset,
               ${shinglesSql(wordsSql)} AS sh
        FROM documents),
      inv AS (
        SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM docs),
      hot AS (
        SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= 100),
      capped AS (
        SELECT inv.doc_id, inv.shingle FROM inv JOIN hot USING (shingle)),
      cands AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM capped x JOIN capped y
          ON x.shingle = y.shingle AND x.doc_id < y.doc_id)
      SELECT a, b,
             CAST(len(list_distinct(list_intersect(da.wset, db.wset))) AS DOUBLE)
               / len(list_distinct(list_concat(da.wset, db.wset))) AS jaccard
      FROM cands
      JOIN docs da ON da.doc_id = a
      JOIN docs db ON db.doc_id = b
      WHERE CAST(len(list_distinct(list_intersect(da.wset, db.wset))) AS DOUBLE)
              / len(list_distinct(list_concat(da.wset, db.wset))) >= 0.8"""
  )
}
