package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import Models._

/** J4 — slowly-changing broadcast dimension with upserts AND deletes
  * (`connect/BroadcastDimension.java:92-126`): the reference keeps a
  * goods dim in Flink broadcast state, `put` on upsert, `remove` when
  * `isRemove`, and each order is enriched via state lookup — absent
  * keys emit a null goodsName (`:105-111`).
  *
  * Spark-first shape: the dim is a CHANGELOG relation; per micro-batch
  * we compact it to the current snapshot (latest record per key wins,
  * removes drop the key) and stream-static broadcast-left-join the
  * order batch against it inside `foreachBatch`. Re-evaluating the
  * changelog source per batch is what picks up dim changes — the exact
  * Spark analog of Flink re-broadcasting state updates.
  *
  * Scale: the big (orders) side never shuffles — the join is a
  * broadcast hash join. The compaction shuffles only the changelog,
  * which is dim-sized (and at 100 TB order volume the dim is still the
  * small side; if the dim outgrows the broadcast limit the same
  * `currentDim` feeds a shuffled left join by dropping the hint).
  */
object BroadcastDim {

  /** Compact a goods changelog to the current dim snapshot:
    * latest record per goodsId (by seq = arrival order) wins; a
    * latest-record remove deletes the key — the reference's
    * `broadcastState.put`/`remove` pair (`BroadcastDimension.java:
    * 117-124`) replayed as one aggregate. */
  def currentDim(changelog: Dataset[Goods]): DataFrame =
    changelog.toDF()
      .groupBy(col("goodsId"))
      .agg(max_by(struct(col("goodsName"), col("isRemove")),
        col("seq")).as("g"))
      .filter(!col("g.isRemove"))
      .select(col("goodsId"), col("g.goodsName").as("goodsName"))

  /** Stream-static left join of an order batch against the compacted
    * dim: unmatched orders keep flowing with goodsName = None. */
  def enrich(orders: Dataset[Order], dim: DataFrame): Dataset[EnrichedOrder] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders.join(broadcast(dim), Seq("goodsId"), "left")
      .select(col("orderId"), col("time"), col("userId"), col("goodsId"),
        col("price"), col("cityId"), col("goodsName"))
      .as[EnrichedOrder]
  }

  /** Streaming driver: `changelog` is re-evaluated every micro-batch
    * (point it at a growing table/dir — or a test thunk), so dim
    * upserts and deletes between batches are visible to the next
    * batch's join, matching the reference's broadcast-state timeline.
    */
  def enrichOrders(orders: Dataset[Order],
                   changelog: () => Dataset[Goods])
                  (onBatch: (Dataset[EnrichedOrder], Long) => Unit): StreamingQuery =
    orders.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onBatch(enrich(batch.as[Order], currentDim(changelog())), id)
      }
      .start()
}
