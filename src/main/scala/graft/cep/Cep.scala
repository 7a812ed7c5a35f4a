package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Complex event processing (SURVEY.md §2.8) — the reference's
  * FlinkCEP surface re-built as an NFA library:
  *   - contiguity modes: strict `next` vs relaxed `followedBy` vs
  *     branching `followedByAny` (`cep/FlinkCEP.java:55-64`);
  *   - `within` windows with timed-out partial matches surfaced as a
  *     side channel (`cep/CEPTimeout.java:72-103`);
  *   - one-or-more quantifiers and previous-event-referencing
  *     predicates — enough to express MATCH_RECOGNIZE
  *     `PATTERN (A B+ C) DEFINE B AS price < LAST(price)`
  *     (`flink-sql/sql/dml/CEP.md:72-91`).
  *
  * The NFA core is engine-agnostic Scala; `matchBatch` runs it per key
  * inside flatMapGroups, `Streaming.matchStream` carries partials in
  * flatMapGroupsWithState across micro-batches.
  */
object Cep {

  /** AFTER MATCH SKIP strategies (`flink-sql/sql/dml/CEP.md:82`,
    * Flink AfterMatchSkipStrategy). Applied when a match completes:
    *   - NoSkip: keep everything (followedByAny-style all matches);
    *   - SkipPastLastEvent: drop every live partial that started at or
    *     before the match's last event (non-overlapping matches);
    *   - SkipToLast(step): drop partials that started before the last
    *     event the named step consumed.
    */
  sealed trait AfterMatchSkip
  case object NoSkip extends AfterMatchSkip
  case object SkipPastLastEvent extends AfterMatchSkip
  case class SkipToLast(step: String) extends AfterMatchSkip

  sealed trait Contiguity
  /** Strict: the very next event must match or the partial dies. */
  case object Next extends Contiguity
  /** Relaxed: skip non-matching events; consume the first match. */
  case object FollowedBy extends Contiguity
  /** Relaxed + branching: every future match spawns a new branch. */
  case object FollowedByAny extends Contiguity

  /** One-or-more expansion policy when an event satisfies BOTH the
    * loop step and the following step (MATCH_RECOGNIZE B+ vs B+?,
    * Flink `oneOrMore.greedy`):
    *   - AllMatches: branch on both (every loop length is reported) —
    *     the FlinkCEP followedByAny-style default;
    *   - Greedy: prefer extending the loop (longest B+ run);
    *   - Reluctant: prefer advancing (shortest B+ run).
    */
  sealed trait Quant
  case object AllMatches extends Quant
  case object Greedy extends Quant
  case object Reluctant extends Quant

  /** One pattern step. `pred` sees the candidate event and the events
    * matched so far (so DOWN can test price < last price).
    * `entryPred`, when set, additionally sees which step consumed each
    * prior event — required for SQL MATCH_RECOGNIZE navigation
    * (`LAST(VAR.col, 1)` resolves against VAR's rows only). */
  case class Step[T](name: String, contiguity: Contiguity,
                     oneOrMore: Boolean, pred: (T, Seq[T]) => Boolean,
                     quant: Quant = AllMatches,
                     entryPred: Option[(T, Vector[(Int, T)]) => Boolean] = None) {
    def hit(e: T, entries: Vector[(Int, T)]): Boolean =
      entryPred match {
        case Some(f) => f(e, entries)
        case None    => pred(e, entries.map(_._2))
      }
  }

  case class PatternSpec[T](steps: Vector[Step[T]], withinMs: Option[Long],
                            skip: AfterMatchSkip = NoSkip) {
    def afterMatchSkip(s: AfterMatchSkip): PatternSpec[T] = copy(skip = s)
    def next(name: String, oneOrMore: Boolean = false,
             quant: Quant = AllMatches)
            (pred: (T, Seq[T]) => Boolean): PatternSpec[T] =
      copy(steps = steps :+ Step(name, Next, oneOrMore, pred, quant))
    def followedBy(name: String, oneOrMore: Boolean = false,
                   quant: Quant = AllMatches)
                  (pred: (T, Seq[T]) => Boolean): PatternSpec[T] =
      copy(steps = steps :+ Step(name, FollowedBy, oneOrMore, pred, quant))
    def followedByAny(name: String, oneOrMore: Boolean = false,
                      quant: Quant = AllMatches)
                     (pred: (T, Seq[T]) => Boolean): PatternSpec[T] =
      copy(steps = steps :+ Step(name, FollowedByAny, oneOrMore, pred, quant))
    def within(ms: Long): PatternSpec[T] = copy(withinMs = Some(ms))
  }

  def begin[T](name: String, oneOrMore: Boolean = false)
              (pred: (T, Seq[T]) => Boolean): PatternSpec[T] =
    PatternSpec(Vector(Step(name, FollowedBy, oneOrMore, pred)), None)

  /** A partial match: per matched event, the index of the step that
    * consumed it. `stepIdx` = index of the step matched last.
    * `matched` marks a partial that already emitted a completed match
    * (a one-or-more final step keeps extending) — such partials are
    * dropped silently on `within` expiry, never reported as timeouts.
    */
  case class Partial[T](entries: Vector[(Int, T)], startTs: Long,
                        matched: Boolean = false) {
    def stepIdx: Int = entries.last._1
    def events: Seq[T] = entries.map(_._2)
  }

  case class MatchResult[T](kind: String, entries: Vector[(Int, T)])

  /** The NFA. Feed events in event-time order per key. */
  final class Nfa[T](val spec: PatternSpec[T], tsOf: T => Long)
      extends Serializable {
    private val steps = spec.steps

    /** Advance all partials with one event. Returns (surviving
      * partials, completed matches, timed-out partials). */
    def onEvent(partials: List[Partial[T]],
                e: T): (List[Partial[T]], List[MatchResult[T]], List[MatchResult[T]]) = {
      val ts = tsOf(e)
      val live = List.newBuilder[Partial[T]]
      val done = List.newBuilder[MatchResult[T]]
      val timedOut = List.newBuilder[MatchResult[T]]

      for (p <- partials) {
        if (spec.withinMs.exists(w => ts - p.startTs > w)) {
          if (!p.matched) timedOut += MatchResult("timeout", p.entries)
        } else {
          val cur = steps(p.stepIdx)
          val nextIdx = p.stepIdx + 1
          val last = steps.length - 1
          val loopPoss = cur.oneOrMore && cur.hit(e, p.entries)
          val advPoss = nextIdx < steps.length &&
            steps(nextIdx).hit(e, p.entries)
          // quantifier mode decides the both-possible tie
          val loopHit = loopPoss &&
            (cur.quant != Reluctant || !advPoss)
          val advHit = advPoss &&
            (!loopPoss || cur.quant != Greedy)
          if (loopHit) {
            val isFinal = p.stepIdx == last
            val ext = Partial(p.entries :+ (p.stepIdx, e), p.startTs,
              p.matched || isFinal)
            live += ext
            if (isFinal) done += MatchResult("match", ext.entries)
          }
          if (advHit) {
            if (nextIdx == last) {
              val adv = Partial(p.entries :+ (nextIdx, e), p.startTs,
                matched = true)
              done += MatchResult("match", adv.entries)
              if (steps(nextIdx).oneOrMore) live += adv // B+ can extend
            } else live += Partial(p.entries :+ (nextIdx, e), p.startTs,
              p.matched)
          }
          // does the un-extended partial survive this event?
          val survives =
            (if (nextIdx < steps.length) steps(nextIdx).contiguity
             else FollowedBy) match {
              case Next          => false              // strict: no skipping
              case FollowedBy    => !advHit && !loopHit // greedy consumption
              case FollowedByAny => true               // branch on every match
            }
          if (survives) live += p
        }
      }
      // every event matching step 0 starts a new partial
      if (steps(0).hit(e, Vector.empty)) {
        val p0 = Partial(Vector((0, e)), ts)
        if (steps.length == 1) done += MatchResult("match", p0.entries)
        else live += p0
      }
      // with a skip strategy, co-completing matches at one event are
      // pruned to the first (Flink's documented b+c example)
      val doneList =
        if (spec.skip == NoSkip) done.result() else done.result().take(1)
      val survivors = (spec.skip, doneList.headOption) match {
        case (NoSkip, _) | (_, None) => live.result()
        case (SkipPastLastEvent, Some(_)) =>
          // resume strictly after the match's last event (= e)
          live.result().filter(p => tsOf(p.entries.head._2) > ts)
        case (SkipToLast(name), Some(m)) =>
          val stepIdx = steps.indexWhere(_.name == name)
          val boundary = m.entries.reverse
            .collectFirst { case (i, ev) if i == stepIdx => tsOf(ev) }
            .getOrElse(ts)
          live.result().filter(p => tsOf(p.entries.head._2) >= boundary)
      }
      (survivors, doneList, timedOut.result())
    }

    /** Run a whole ordered sequence (batch per-key path). Partials
      * still pending at the end are neither matched nor timed out. */
    def run(events: Seq[T]): (List[MatchResult[T]], List[MatchResult[T]]) = {
      var partials = List.empty[Partial[T]]
      val done = List.newBuilder[MatchResult[T]]
      val timedOut = List.newBuilder[MatchResult[T]]
      for (e <- events) {
        val (p2, d, t) = onEvent(partials, e)
        partials = p2
        done ++= d
        timedOut ++= t
      }
      (done.result(), timedOut.result())
    }

    def toNamed(m: MatchResult[T]): Map[String, Seq[T]] =
      m.entries.groupBy { case (i, _) => steps(i).name }
        .map { case (n, es) => n -> es.map(_._2).toSeq }
  }

  /** Batch CEP: per-key ordered NFA scan via flatMapGroups.
    * `select` projects each completed match (step name → events). */
  def matchBatch[T, K, R: Encoder](ds: Dataset[T], keyFn: T => K,
      orderBy: T => Long, pattern: PatternSpec[T], tsOf: T => Long)
      (select: (K, Map[String, Seq[T]]) => R)
      (implicit ke: Encoder[K]): Dataset[R] = {
    val nfa = new Nfa[T](pattern, tsOf)
    ds.groupByKey(keyFn).flatMapGroups { (k: K, it: Iterator[T]) =>
      val (done, _) = nfa.run(it.toSeq.sortBy(orderBy))
      done.iterator.map(m => select(k, nfa.toNamed(m)))
    }
  }

  /** Batch CEP including the timeout side channel: emits
    * (kind, named events) where kind ∈ match | timeout. */
  def matchBatchWithTimeouts[T, K, R: Encoder](ds: Dataset[T], keyFn: T => K,
      orderBy: T => Long, pattern: PatternSpec[T], tsOf: T => Long)
      (select: (K, String, Map[String, Seq[T]]) => R)
      (implicit ke: Encoder[K]): Dataset[R] = {
    val nfa = new Nfa[T](pattern, tsOf)
    ds.groupByKey(keyFn).flatMapGroups { (k: K, it: Iterator[T]) =>
      val (done, timedOut) = nfa.run(it.toSeq.sortBy(orderBy))
      (done ::: timedOut).iterator
        .map(m => select(k, m.kind, nfa.toNamed(m)))
    }
  }
}
