package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** T4/T8/K9 — side outputs / split-select
  * (`slideoutput/SideOutput.java:49-103`, `datastream_api` split): one
  * logical pass tags every row with a channel, and each channel feeds
  * its own sink. Flink does this with `OutputTag` + `ctx.output`;
  * the Spark shape is a tag column + per-channel filters, with the
  * tagged batch persisted inside `foreachBatch` so the upstream work
  * runs once, not once per sink.
  *
  * Scale: tagging is a narrow map fused into the scan; channel
  * filters read the persisted per-batch result, so an N-way split
  * costs one upstream evaluation + N cheap filter passes.
  */
object SideOutputs {

  /** Tag rows into channels by the first matching predicate
    * (fall-through rows keep `otherwise`). The batch analog of
    * declaring one `OutputTag` per channel. */
  def tagged(df: DataFrame, channels: Seq[(String, Column)],
             otherwise: String = "main"): DataFrame =
    df.withColumn("channel",
      channels.foldRight(lit(otherwise)) { case ((name, pred), rest) =>
        when(pred, lit(name)).otherwise(rest)
      })

  /** Select one channel of a tagged frame (Flink `getSideOutput`). */
  def channel(tagged: DataFrame, name: String): DataFrame =
    tagged.filter(col("channel") === name).drop("channel")

  /** Streaming N-sink split: per micro-batch, evaluate the tagged
    * stream ONCE (persist), then hand each channel's rows to its
    * sink. The two-sink `writeAsText` pair of the reference
    * (`SideOutput.java:76-83`) generalizes to any channel→sink map. */
  def splitStream(taggedStream: DataFrame,
                  sinks: Map[String, (DataFrame, Long) => Unit]): StreamingQuery =
    taggedStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        batch.persist()
        try sinks.foreach { case (name, sink) =>
          sink(channel(batch.toDF(), name), id)
        } finally { batch.unpersist(); () }
      }
      .start()

  // ---- the reference's rejected-words wordcount --------------------

  /** Tokenize lines (`value.toLowerCase().split("\\W+")`) and tag:
    * tokens longer than `maxLen` go to the `rejected` channel, the
    * rest to `main` (`SideOutput.java:92-103`; empty tokens dropped).
    */
  def taggedTokens(lines: DataFrame, maxLen: Int = 5): DataFrame =
    tagged(
      lines.select(explode_outer(graft.operators.TextOps.tokens(col("value")))
        .as("token")).filter(col("token").isNotNull),
      Seq("rejected" -> (length(col("token")) > maxLen)))

  /** Main-channel word counts (the reference's windowed `sum(1)`
    * collapsed to per-token totals) — run on `channel(_, "main")`. */
  def wordCounts(mainTokens: DataFrame): DataFrame =
    mainTokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))

  /** Rejected-channel rendering: `"rejected : " + token`
    * (`SideOutput.java:64-70`). */
  def rejectedWords(rejectedTokens: DataFrame): DataFrame =
    rejectedTokens.select(concat(lit("rejected : "), col("token"))
      .as("value"))
}
