package graft.cep

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.cep.Cep._

/** Streaming CEP over the concrete event model (the reference's
  * polymorphic Event/SubEvent flattened to a nullable `volume`,
  * SURVEY.md §1.2). Partial matches live in flatMapGroupsWithState;
  * cross-batch event order = event-time within batch, arrival across
  * batches (define watermark delay ≥ expected disorder).
  */
object CepStreaming {

  /** `cep/pojo/Event.java:32-34` + `SubEvent.java:24-27` flattened;
    * `volume != None` marks a SubEvent. */
  case class CepRow(key: String, id: Long, name: String, price: Double,
                    volume: Option[Double], tsMs: Long)

  case class CepMatch(key: String, kind: String, ids: Seq[Long])

  /** Run a pattern over a (possibly streaming) Dataset[CepRow]. State
    * carries live partials as (matched-flag, (stepIdx, row) entries).
    * `within` timeouts are emitted as kind="timeout" when a later
    * event on the same key passes the bound; `idleTimeoutMs` (strongly
    * recommended for unbounded key spaces) additionally evicts a key's
    * partials after that much processing-time inactivity — without it,
    * keys that go permanently idle retain their partials forever.
    * With an idle timeout, run with a nonzero trigger interval (see
    * the Stateful timer note).
    */
  def matchPattern(rows: Dataset[CepRow], pattern: PatternSpec[CepRow],
                   idleTimeoutMs: Option[Long] = None): Dataset[CepMatch] = {
    import rows.sparkSession.implicits._
    val nfa = new Nfa[CepRow](pattern, _.tsMs)
    def fn(key: String, it: Iterator[CepRow],
           state: GroupState[NfaState[CepRow]]): Iterator[CepMatch] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(NfaState.empty[CepRow])
      val out = Seq.newBuilder[CepMatch]
      for (e <- it.toSeq.sortBy(r => (r.tsMs, r.id))) {
        val (s2, done, timedOut) = nfa.onEvent(st, e)
        st = s2
        (done ::: timedOut).foreach { m =>
          out += CepMatch(key, m.kind, m.entries.map(_._2.id))
        }
      }
      if (st.partials.isEmpty && st.pending.isEmpty) state.remove()
      else {
        state.update(st)
        idleTimeoutMs.foreach(state.setTimeoutDuration)
      }
      out.result().iterator
    }
    val timeout =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** CepRow plus the watermarked event-time column — EventTimeTimeout
    * requires the watermarked attribute to survive into the operator's
    * input encoder (see graft.streaming.Models.TimedItemViewCount).
    * Build with `eventTime = new java.sql.Timestamp(tsMs)` and declare
    * `.withWatermark("eventTime", ...)` upstream.
    */
  case class TimedCepRow(key: String, id: Long, name: String, price: Double,
                         volume: Option[Double], tsMs: Long,
                         eventTime: java.sql.Timestamp)

  /** Like matchPattern, but `within` timeouts flush on EVENT-TIME
    * timers: once the watermark passes a partial's `startTs + within`,
    * no in-order event can extend it, so the timeout fires even if the
    * key never receives another event (matchPattern only notices
    * expiry when a later same-key event arrives). This is the Flink
    * `TimedOutPartialMatchHandler` cadence (`cep/CEPTimeout.java:
    * 72-103`) under micro-batch watermark advancement.
    */
  def matchPatternEventTime(rows: Dataset[TimedCepRow],
                            pattern: PatternSpec[TimedCepRow]): Dataset[CepMatch] = {
    import rows.sparkSession.implicits._
    require(pattern.withinMs.isDefined,
      "event-time timeout flush needs a within() bound")
    val nfa = new Nfa[TimedCepRow](pattern, _.tsMs)
    val within = pattern.withinMs.get
    def fn(key: String, it: Iterator[TimedCepRow],
           state: GroupState[NfaState[TimedCepRow]]): Iterator[CepMatch] = {
      var st = state.getOption.getOrElse(NfaState.empty[TimedCepRow])
      val out = Seq.newBuilder[CepMatch]
      for (e <- it.toSeq.sortBy(r => (r.tsMs, r.id))) {
        val (s2, done, timedOut) = nfa.onEvent(st, e)
        st = s2
        (done ::: timedOut).foreach { m =>
          out += CepMatch(key, m.kind, m.entries.map(_._2.id))
        }
      }
      // event-time flush: expire partials no in-order event can extend
      // (a branch death can also release a held-back greedy match)
      val wm = state.getCurrentWatermarkMs()
      val (st2, done, timedOut) = nfa.expire(st, wm)
      (done ::: timedOut).foreach { m =>
        out += CepMatch(key, m.kind, m.entries.map(_._2.id))
      }
      if (st2.partials.isEmpty && st2.pending.isEmpty) state.remove()
      else {
        state.update(st2)
        // fire when the earliest live partial's window closes
        val t =
          if (st2.partials.nonEmpty) st2.partials.map(_.startTs + within).min + 1
          else wm + 1
        state.setTimeoutTimestamp(math.max(t, wm + 1))
      }
      out.result().iterator
    }
    rows.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
