package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BroadcastDim, Models}
import Models._

/** J4 — broadcast dim with deletes (`connect/BroadcastDimension.java:
  * 58-126`): orders enrich against a goods changelog; upserts become
  * visible, removes null the name out, absent keys emit null.
  */
class BroadcastDimSpec extends SparkSpec {

  test("dim compaction keeps latest per key and drops removes") {
    import spark.implicits._
    val changelog = Seq(
      Goods(1, "apple", isRemove = false, 0),
      Goods(2, "pear", isRemove = false, 1),
      Goods(2, "banana", isRemove = false, 2), // upsert wins by seq
      Goods(3, "mango", isRemove = false, 3),
      Goods(3, null, isRemove = true, 4))      // delete drops the key
    val dim = BroadcastDim.currentDim(spark.createDataset(changelog))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(dim.toSeq == Seq((1, "apple"), (2, "banana")))
  }

  test("orders join the live dim across update/delete micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the changelog "topic": grows between micro-batches
    val changelog = ArrayBuffer(Goods(1, "apple", isRemove = false, 0))
    val batches = ArrayBuffer.empty[(Long, Seq[EnrichedOrder])]

    val in = MemoryStream[Order]
    val q = BroadcastDim.enrichOrders(in.toDS(),
      () => spark.createDataset(changelog.toSeq)) { (out, id) =>
      batches.synchronized { batches += ((id, out.collect().toSeq.sortBy(_.orderId))) }
    }
    try {
      // batch 0: goods 1 known, goods 2 not yet -> null goodsName
      in.addData(Order(1000, "o1", "u1", 1, 10, 1),
        Order(1001, "o2", "u2", 2, 20, 1))
      q.processAllAvailable()
      // dim upsert goods 2 + DELETE goods 1, then the same two goods ids
      changelog += Goods(2, "banana", isRemove = false, 1)
      changelog += Goods(1, null, isRemove = true, 2)
      in.addData(Order(2000, "o3", "u1", 1, 11, 1),
        Order(2001, "o4", "u2", 2, 21, 1))
      q.processAllAvailable()
    } finally q.stop()

    val out = batches.sortBy(_._1).map(_._2)
    assert(out.head == Seq(
      EnrichedOrder("o1", 1000, "u1", 1, 10, 1, Some("apple")),
      EnrichedOrder("o2", 1001, "u2", 2, 20, 1, None)))
    assert(out(1) == Seq(
      EnrichedOrder("o3", 2000, "u1", 1, 11, 1, None),
      EnrichedOrder("o4", 2001, "u2", 2, 21, 1, Some("banana"))))
  }
}
