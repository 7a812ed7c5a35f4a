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
    * carries live partials as (stepIdx, row) vectors. On streaming
    * input, an event-time timeout flushes nothing by itself (pending
    * partials either complete, die, or time out against later events'
    * timestamps) — `within` timeouts are emitted as kind="timeout".
    */
  def matchPattern(rows: Dataset[CepRow],
                   pattern: PatternSpec[CepRow]): Dataset[CepMatch] = {
    import rows.sparkSession.implicits._
    val nfa = new Nfa[CepRow](pattern, _.tsMs)
    def fn(key: String, it: Iterator[CepRow],
           state: GroupState[Seq[Seq[(Int, CepRow)]]]): Iterator[CepMatch] = {
      var partials = state.getOption.getOrElse(Seq.empty)
        .map(es => Partial(es.toVector, es.head._2.tsMs)).toList
      val out = Seq.newBuilder[CepMatch]
      for (e <- it.toSeq.sortBy(r => (r.tsMs, r.id))) {
        val (p2, done, timedOut) = nfa.onEvent(partials, e)
        partials = p2
        (done ::: timedOut).foreach { m =>
          out += CepMatch(key, m.kind, m.entries.map(_._2.id))
        }
      }
      if (partials.isEmpty) state.remove()
      else state.update(partials.map(_.entries.toSeq))
      out.result().iterator
    }
    rows.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
