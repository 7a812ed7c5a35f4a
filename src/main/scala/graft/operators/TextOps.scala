package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Text-analysis operators for large-scale training-data pipelines
  * over the `documents` table: tokenization/wordcount (the reference's
  * flagship `wordcount/WordCount.java:73-88` tokenizer), token
  * counting, quality scoring, language ID, and fingerprinting. All are
  * per-row narrow transforms (no shuffle except the final wordcount
  * agg) — at 100 TB they run map-side, fused in whole-stage codegen.
  */
object TextOps extends graft.QueryModule {

  /** Reference tokenizer (P1): lowercase, split on non-word runs,
    * drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), w => length(w) > 0)

  /** Classic wordcount: token frequencies across the corpus. */
  def wordCount(documents: DataFrame): DataFrame =
    documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-document token statistics: whitespace tokens, a BPE-ish
    * regex token count (letter runs / digit runs / single symbols),
    * and a chars/4 estimate — the standard quick LLM-token estimate.
    */
  def tokenStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(words(col("text"))).as("n_ws_tokens"),
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
        .as("n_bpe_tokens"),
      ceil(col("n_chars") / 4.0).cast("long").as("est_tokens"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality signals: token count, mean word length, stopword ratio,
    * alpha ratio. Ratios are emitted as raw int/int double divisions
    * (bit-portable); no multi-row float accumulation.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    documents
      .select(col("doc_id"), words(col("text")).as("ws"),
        normText(col("text")).as("norm"))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_tokens"),
        length(regexp_replace(col("norm"), " ", "")).as("n_word_chars"),
        size(filter(col("ws"), w => array_contains(stopArr, w))).as("n_stop"))
    .select(
      col("doc_id"), col("n_tokens"),
      (col("n_word_chars").cast("double") / col("n_tokens")).as("avg_word_len"),
      (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"))
  }

  private val dicts: Seq[(String, Seq[String])] = Seq(
    "en"     -> Seq("the", "a", "fast", "slow", "small"),
    "sql"    -> Seq("table", "scan", "merge", "hash", "join", "sort", "query"),
    "stream" -> Seq("spark", "stream", "batch", "window", "row"))

  /** N-gram/keyword-dictionary language-ID heuristic: score each
    * class dictionary by token hits (with multiplicity), pick the
    * argmax (ties broken by dictionary order). Dictionary matching is
    * a broadcast-style lookup — no shuffle.
    */
  def languageId(documents: DataFrame): DataFrame = {
    val scored = documents
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(
        col("doc_id") +: dicts.map { case (name, dict) =>
          val arr = array(dict.map(lit): _*)
          size(filter(col("ws"), w => array_contains(arr, w))).as(s"score_$name")
        }: _*)
    val best = dicts.map { case (name, _) => col(s"score_$name") }
      .reduceLeft((a, b) => greatest(a, b))
    val pred = dicts.foldRight(lit("und"): Column) { case ((name, _), acc) =>
      when(col(s"score_$name") === best, lit(name)).otherwise(acc)
    }
    // foldRight keeps earlier dicts winning ties (first when wins)
    scored.withColumn("predicted", pred)
  }

  /** Document fingerprint: 32-bit word hashes folded through a
    * polynomial rolling hash (order-sensitive), plus the md5 of the
    * normalized text (content address for exact dedup).
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      polyHash(transform(words(col("text")), w => hash32(w))).as("fp"),
      md5(normText(col("text"))).as("content_md5"))

  // ---- driver bindings -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_wordcount"   -> ((s, d) => wordCount(Tables.documents(s, d))),
    "q21_token_stats" -> ((s, d) => tokenStats(Tables.documents(s, d))),
    "q22_quality"     -> ((s, d) => qualityScore(Tables.documents(s, d))),
    "q23_lang_id"     -> ((s, d) => languageId(Tables.documents(s, d))),
    "q24_fingerprint" -> ((s, d) => fingerprints(Tables.documents(s, d)))
  )

  private def sqlArr(xs: Seq[String]) =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  def oracle: Map[String, String] = Map(
    "q20_wordcount" -> """
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(list_filter(
              string_split_regex(lower(text), '\W+'), w -> len(w) > 0)) AS word
            FROM documents)
      GROUP BY word""",
    "q21_token_stats" -> """
      SELECT doc_id,
             len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
               AS n_ws_tokens,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
               AS n_bpe_tokens,
             CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
      FROM documents""",
    "q22_quality" -> s"""
      WITH t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws,
               len(replace(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ', ''))
                 AS n_word_chars
        FROM documents)
      SELECT doc_id, len(ws) AS n_tokens,
             CAST(n_word_chars AS DOUBLE) / len(ws) AS avg_word_len,
             CAST(len(list_filter(ws, w -> list_contains(${sqlArr(stopwords)}, w)))
                  AS DOUBLE) / len(ws) AS stopword_ratio
      FROM t""",
    "q23_lang_id" -> {
      val scoreCols = dicts.map { case (name, dict) =>
        s"len(list_filter(ws, w -> list_contains(${sqlArr(dict)}, w))) AS score_$name"
      }.mkString(",\n               ")
      val bestExpr = dicts.map(d => s"score_${d._1}")
        .reduceLeft((a, b) => s"greatest($a, $b)")
      val caseExpr = dicts.map { case (name, _) =>
        s"WHEN score_$name = $bestExpr THEN '$name'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""
      WITH t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
        FROM documents),
      s AS (
        SELECT doc_id,
               $scoreCols
        FROM t)
      SELECT *, $caseExpr AS predicted FROM s"""
    },
    "q24_fingerprint" -> """
      WITH t AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents)
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(string_split(norm, ' '),
                   w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007) AS fp,
             md5(norm) AS content_md5
      FROM t"""
  )
}
