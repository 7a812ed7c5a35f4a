package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.streaming.Models._

/** Spark 4 `transformWithState` ports (the successor API to
  * flatMapGroupsWithState — native state TTL, typed state variables,
  * explicit timers; SURVEY.md §2.7 T1/T5). The same operators exist on
  * flatMapGroupsWithState in [[Stateful]]; these variants use the
  * first-class TTL the reference configures via StateTtlConfig
  * (`state/StateTtl.java:15-22`) and the fraud flag timer
  * (`state/TimerService.java:68-139`).
  *
  * Streaming runs require the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * RocksDBStateStoreProvider) — the same backend the reference
  * recommends for large keyed state (`checkpointing/Checkpointing
  * .java:63-67`).
  */
object StatefulTws extends Serializable {

  /** T1+T5: fraud detector with the small-txn flag in a ValueState
    * whose expiry is a NATIVE state TTL (OnCreateAndWrite semantics,
    * like the reference's StateTtlConfig) instead of a hand-rolled
    * timer. */
  class FraudProcessor(flagTtl: Duration)
      extends StatefulProcessor[Long, Transaction, FraudAlert] {
    @transient private var flag: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      flag = getHandle.getValueState[Boolean]("flag",
        Encoders.scalaBoolean, TTLConfig(flagTtl))

    override def handleInputRows(accountId: Long, rows: Iterator[Transaction],
        timerValues: TimerValues): Iterator[FraudAlert] = {
      val out = Seq.newBuilder[FraudAlert]
      var flagged = flag.exists() && flag.get()
      for (t <- rows.toSeq.sortBy(_.seq)) {
        if (flagged) {
          if (t.amount > Stateful.LargeAmount) out += FraudAlert(accountId, t.seq)
          flagged = false
        }
        if (t.amount < Stateful.SmallAmount) flagged = true
      }
      if (flagged) flag.update(true) else flag.clear()
      out.result().iterator
    }
  }

  def fraudDetector(txns: Dataset[Transaction],
                    flagTtl: Duration = Duration.ofMinutes(1)): Dataset[FraudAlert] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.accountId)
      .transformWithState(new FraudProcessor(flagTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** T3+A6: the flagship windowed top-N (`topn/HotItems.java:86-147`)
    * on the native API — the reference's ListState buffer is a typed
    * `ListState[ItemViewCount]`, its event-time timer at windowEnd+1
    * a first-class `registerTimer` with the emission in
    * `handleExpiredTimer` (instead of flatMapGroupsWithState's
    * hasTimedOut re-entry). Late rows for windows the watermark
    * already fired are dropped (no allowedLateness, as documented).
    */
  class TopNProcessor(n: Int)
      extends StatefulProcessor[Long, TimedItemViewCount, RankedItem] {
    @transient private var buf: ListState[ItemViewCount] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[ItemViewCount]("buf",
        Encoders.product[ItemViewCount], TTLConfig.NONE)

    override def handleInputRows(windowEnd: Long,
        rows: Iterator[TimedItemViewCount],
        timerValues: TimerValues): Iterator[RankedItem] = {
      if (windowEnd + 1 <= timerValues.getCurrentWatermarkInMs()) {
        // late for an already-fired window — drop, never re-emit
        return Iterator.empty
      }
      rows.foreach(r =>
        buf.appendValue(ItemViewCount(r.itemId, r.windowEnd, r.viewCount)))
      getHandle.registerTimer(windowEnd + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(windowEnd: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[RankedItem] = {
      val items = buf.get().toSeq
      buf.clear()
      items.sortBy(i => (-i.viewCount, i.itemId)).take(n).zipWithIndex
        .map { case (i, r) =>
          RankedItem(windowEnd, r + 1, i.itemId, i.viewCount) }
        .iterator
    }
  }

  def topNPerWindow(counts: Dataset[TimedItemViewCount],
                    n: Int): Dataset[RankedItem] = {
    import counts.sparkSession.implicits._
    counts.groupByKey(_.windowEnd)
      .transformWithState(new TopNProcessor(n),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** A5/W5 count windows on the native API: the ring buffer of the
    * last `size` records and the emission phase live in two typed
    * state variables (the flatMapGroupsWithState port packs both into
    * one tuple blob — here each updates independently, so RocksDB
    * writes only what changed). Same semantics as
    * Stateful.countWindowSum: every `slide` records emit the sum of
    * the last `size`, record order = seq within batch, arrival across
    * batches. State is bounded by `size` rows per key.
    */
  class CountWindowProcessor(size: Int, slide: Int)
      extends StatefulProcessor[String, KeyedValue, CountWindowSum] {
    @transient private var ring: ListState[KeyedValue] = _
    @transient private var since: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ring = getHandle.getListState[KeyedValue]("ring",
        Encoders.product[KeyedValue], TTLConfig.NONE)
      since = getHandle.getValueState[Int]("since",
        Encoders.scalaInt, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
        timerValues: TimerValues): Iterator[CountWindowSum] = {
      var buf = ring.get().toSeq
      var phase = if (since.exists()) since.get() else 0
      val out = Seq.newBuilder[CountWindowSum]
      for (v <- rows.toSeq.sortBy(_.seq)) {
        buf = (buf :+ v).takeRight(size)
        phase += 1
        if (phase == slide) {
          out += CountWindowSum(key, v.seq, buf.size, buf.map(_.value).sum)
          phase = 0
        }
      }
      ring.put(buf.toArray)
      since.update(phase)
      out.result().iterator
    }
  }

  def countWindowSum(values: Dataset[KeyedValue], size: Int,
                     slide: Int): Dataset[CountWindowSum] = {
    import values.sparkSession.implicits._
    values.groupByKey(_.key)
      .transformWithState(new CountWindowProcessor(size, slide),
        TimeMode.None(), OutputMode.Append())
  }
}
