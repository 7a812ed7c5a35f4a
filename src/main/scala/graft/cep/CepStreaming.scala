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
           state: GroupState[Seq[(Boolean, Seq[(Int, CepRow)])]]): Iterator[CepMatch] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var partials = state.getOption.getOrElse(Seq.empty)
        .map { case (m, es) => Partial(es.toVector, es.head._2.tsMs, m) }
        .toList
      val out = Seq.newBuilder[CepMatch]
      for (e <- it.toSeq.sortBy(r => (r.tsMs, r.id))) {
        val (p2, done, timedOut) = nfa.onEvent(partials, e)
        partials = p2
        (done ::: timedOut).foreach { m =>
          out += CepMatch(key, m.kind, m.entries.map(_._2.id))
        }
      }
      if (partials.isEmpty) state.remove()
      else {
        state.update(partials.map(p => (p.matched, p.entries.toSeq)))
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
}
