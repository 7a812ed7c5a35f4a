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
    *     before the match's last event (SQL `SKIP PAST LAST ROW`,
    *     non-overlapping matches);
    *   - SkipToNextRow: drop only partials that started at the match's
    *     FIRST event (SQL `SKIP TO NEXT ROW` — overlapping matches
    *     resume from the row after the match start);
    *   - SkipToLast(step): drop partials that started before the last
    *     event the named step consumed (SQL `SKIP TO LAST var`);
    *   - SkipToFirst(step): drop partials that started before the
    *     first event the named step consumed (SQL `SKIP TO FIRST var`;
    *     attempts from that row onward survive — the just-resolved
    *     attempt itself is already decided, so the SQL-standard
    *     infinite-loop hazard cannot arise here).
    */
  sealed trait AfterMatchSkip
  case object NoSkip extends AfterMatchSkip
  case object SkipPastLastEvent extends AfterMatchSkip
  case object SkipToNextRow extends AfterMatchSkip
  case class SkipToLast(step: String) extends AfterMatchSkip
  case class SkipToFirst(step: String) extends AfterMatchSkip

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
    *   - Greedy: prefer the longest loop run THAT STILL COMPLETES the
    *     pattern (true SQL backtracking: if the longer run dies, the
    *     shorter alternative is reported, not lost);
    *   - Reluctant: prefer the shortest completing loop run.
    *
    * Greedy/Reluctant are implemented by branching both ways at each
    * tie and tagging each branch with a priority; a completed match is
    * held back while any higher-priority sibling of the same match
    * attempt is still alive, and released the moment every such
    * sibling dies (or at end-of-input in batch / `within` expiry in
    * streaming). AllMatches ties carry no priority and emit
    * immediately.
    */
  sealed trait Quant
  case object AllMatches extends Quant
  case object Greedy extends Quant
  case object Reluctant extends Quant

  /** One pattern step. `pred` sees the candidate event and the events
    * matched so far (so DOWN can test price < last price).
    * `entryPred`, when set, additionally sees which step consumed each
    * prior event — required for SQL MATCH_RECOGNIZE navigation
    * (`LAST(VAR.col, 1)` resolves against VAR's rows only).
    *
    * `optional` marks a step that may be skipped entirely
    * (MATCH_RECOGNIZE `B?` / the expanded tail of `B{n,m}`); combined
    * with `oneOrMore` it expresses `B*`. `altWithPrev` folds this step
    * into the previous step's pattern POSITION as an alternative
    * (`(B|C)`): at that position the NFA tries every alternative,
    * preferring the leftmost (SQL alternation preference).
    *
    * `groupLoop` marks a looping ALTERNATION position (`(B|C)+`):
    * standing on any alternative of the position, the loop tries every
    * `groupLoop` alternative of the position — repetitions may switch
    * branches (B C B …), which is SQL's semantics for a quantified
    * group. A plain `B+` branch inside an unquantified group
    * (`(B+|C)`) keeps `groupLoop = false` and self-loops only.
    *
    * `minReps`/`maxReps` bound a SELF-LOOPING step's repetition count
    * (`B{n,m}` as a branch inside an alternation, where the
    * position-expansion rewrite used for standalone `B{n,m}` can't
    * apply because the other branches share the position): the step
    * may not advance (or complete) before consuming `minReps` events
    * and may not loop beyond `maxReps` (−1 = unbounded). Defaults
    * (1, −1) reproduce the unbounded `B`/`B+` behavior exactly.
    * Counts gate on the TRAILING consecutive run of events at the
    * step, which makes them compose with `groupLoop` (`(B{n,m}|C)+`):
    * a quantified group may re-enter the branch back to back, so a
    * trailing run of k events is legal-complete iff it splits into
    * r ≥ 1 whole repetitions each in [n, m] — ∃r: r·n ≤ k ≤ r·m,
    * i.e. ⌈k/m⌉·n ≤ k — and may absorb one more event iff k+1 splits
    * into whole repetitions plus an OPEN run in [1, m]. Without
    * `groupLoop` only a single run can exist (positions advance
    * monotonically), so the same gates reduce to n ≤ k ≤ m — the
    * unquantified-group semantics. */
  case class Step[T](name: String, contiguity: Contiguity,
                     oneOrMore: Boolean, pred: (T, Seq[T]) => Boolean,
                     quant: Quant = AllMatches,
                     entryPred: Option[(T, Vector[(Int, T)]) => Boolean] = None,
                     optional: Boolean = false,
                     altWithPrev: Boolean = false,
                     groupLoop: Boolean = false,
                     minReps: Int = 1,
                     maxReps: Int = -1) {
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

    /** FlinkCEP `.optional()`: the most recently added step may be
      * skipped (Pattern.optional, `cep/FlinkCEP.java` pattern API). */
    def optional: PatternSpec[T] =
      copy(steps = steps.init :+ steps.last.copy(optional = true))

    /** FlinkCEP `.times(n)` / `.times(n, m)`: the most recently added
      * step must occur n (to m) times. Expands into copies sharing the
      * step's name — `toNamed` still groups all occurrences under it.
      * Repetitions inherit the step's contiguity (FlinkCEP's default
      * relaxed repetition; build the step with `next` for the
      * `consecutive()` behavior). */
    def times(n: Int): PatternSpec[T] = times(n, n)
    def times(n: Int, m: Int): PatternSpec[T] = {
      require(n >= 0 && m >= math.max(n, 1), s"bad times($n, $m)")
      val s = steps.last
      require(!s.oneOrMore, "times() on a oneOrMore step is ambiguous")
      val copies = (1 to n).map(_ => s.copy(optional = false)) ++
        (n until m).map(_ => s.copy(optional = true))
      copy(steps = steps.init ++ copies)
    }
  }

  def begin[T](name: String, oneOrMore: Boolean = false)
              (pred: (T, Seq[T]) => Boolean): PatternSpec[T] =
    PatternSpec(Vector(Step(name, FollowedBy, oneOrMore, pred)), None)

  /** A partial match: per matched event, the index of the step that
    * consumed it. `stepIdx` = index of the step matched last.
    * `matched` marks a partial that already emitted a completed match
    * (a one-or-more final step keeps extending) — such partials are
    * dropped silently on `within` expiry, never reported as timeouts.
    * `origin` identifies the match attempt (the step-0 event that
    * started it); `prio` is the branch-priority vector appended at
    * each Greedy/Reluctant tie (lexicographically smaller = preferred).
    */
  case class Partial[T](entries: Vector[(Int, T)], startTs: Long,
                        matched: Boolean = false,
                        origin: Long = -1L,
                        prio: Vector[Int] = Vector.empty) {
    def stepIdx: Int = entries.last._1
    def events: Seq[T] = entries.map(_._2)
  }

  /** A completed match held back because a higher-priority branch of
    * the same attempt is still alive (Greedy/Reluctant backtracking). */
  case class Pending[T](origin: Long, prio: Vector[Int],
                        entries: Vector[(Int, T)])

  /** Full NFA state for one key: live partials, held-back completed
    * matches, and the next match-attempt id. Plain case class so the
    * streaming operators can persist it in GroupState. */
  case class NfaState[T](partials: Seq[Partial[T]],
                         pending: Seq[Pending[T]],
                         nextOrigin: Long)
  object NfaState {
    def empty[T]: NfaState[T] = NfaState(Vector.empty, Vector.empty, 0L)
  }

  case class MatchResult[T](kind: String, entries: Vector[(Int, T)])

  /** The NFA. Feed events in event-time order per key. */
  final class Nfa[T](val spec: PatternSpec[T], tsOf: T => Long)
      extends Serializable {
    private val steps = spec.steps

    /** Pattern POSITIONS: consecutive `altWithPrev` steps share one
      * position (alternation); the automaton advances position to
      * position, trying every alternative step of the target. */
    private val posOf: Array[Int] = {
      val a = new Array[Int](steps.length)
      var p = -1
      var i = 0
      while (i < steps.length) {
        if (i == 0 || !steps(i).altWithPrev) p += 1
        a(i) = p; i += 1
      }
      a
    }
    private val nPos = if (steps.isEmpty) 0 else posOf(steps.length - 1) + 1
    private val posSteps: Array[Array[Int]] =
      Array.tabulate(nPos)(p => steps.indices.filter(posOf(_) == p).toArray)
    // a position is skippable if SOME alternative can match empty —
    // skipping (B?|C) means choosing the B? branch and matching it
    // empty, so one optional alternative suffices (for single-step
    // positions exists ≡ forall, the pre-alternation behavior)
    private val posOptional: Array[Boolean] =
      Array.tabulate(nPos)(p => posSteps(p).exists(i => steps(i).optional))
    /** allOptFrom(p) = every position >= p is optional; a partial
      * standing at position q is a COMPLETE match iff allOptFrom(q+1). */
    private val allOptFrom: Array[Boolean] = {
      val a = new Array[Boolean](nPos + 1)
      a(nPos) = true
      var p = nPos - 1
      while (p >= 0) { a(p) = a(p + 1) && posOptional(p); p -= 1 }
      a
    }

    /** Any Greedy/Reluctant loop step, optional step, or alternation →
      * ties branch multiple ways and completions go through the
      * pending/priority machinery. */
    private val needsBacktrack =
      steps.exists(s => s.oneOrMore && s.quant != AllMatches) ||
        steps.exists(_.optional) || posSteps.exists(_.length > 1)

    // ---- bounded-branch repetition gates (B{n,m} as an alternation
    // branch, Step.minReps/maxReps) — all pure functions of the
    // TRAILING consecutive run length at the step, so the NFA state
    // needs no extra bookkeeping (see the Step scaladoc for why the
    // trailing run suffices even when a quantified group re-enters
    // the branch) -------------------------------------------------

    private def isBounded(s: Step[T]): Boolean =
      s.minReps > 1 || s.maxReps >= 0

    /** Trailing consecutive entries at step `s` — the current run. */
    private def trailingRun(entries: Vector[(Int, T)], s: Int): Int = {
      var i = entries.length - 1; var k = 0
      while (i >= 0 && entries(i)._1 == s) { k += 1; i -= 1 }
      k
    }

    /** Is a trailing run of k a legal COMPLETED repetition sequence —
      * may the partial leave the step (advance, switch branch, or
      * finish the match)? groupLoop: ∃r ≥ 1 with r·n ≤ k ≤ r·m;
      * single-run: n ≤ k ≤ m (k ≤ m is a loop-gate invariant). */
    private def runsDone(s: Step[T], k: Int): Boolean =
      if (!isBounded(s)) true
      else if (s.maxReps < 0) k >= s.minReps
      else if (!s.groupLoop) s.minReps <= k && k <= s.maxReps
      else k >= 1 && ((k + s.maxReps - 1) / s.maxReps) * s.minReps <= k

    /** May a trailing run of k absorb one more event at the same
      * step? groupLoop: k+1 must split into whole repetitions plus an
      * open run in [1, m]; single-run: k < m. */
    private def canTakeAnother(s: Step[T], k: Int): Boolean =
      if (!isBounded(s) || s.maxReps < 0) true
      else if (!s.groupLoop) k < s.maxReps
      else if (k + 1 <= s.maxReps) true
      else {
        var c = 1; var ok = false
        while (c <= s.maxReps && !ok) { ok = runsDone(s, k + 1 - c); c += 1 }
        ok
      }

    /** Lexicographic order on priority vectors; a proper prefix sorts
      * before its extensions (the un-branched ancestor could still
      * take the preferred side of a future tie). */
    private def lexLt(a: Vector[Int], b: Vector[Int]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        if (a(i) != b(i)) return a(i) < b(i)
        i += 1
      }
      a.length < b.length
    }

    /** Advance all partials with one event. Returns (new state,
      * completed matches released this event, timed-out partials). */
    def onEvent(st: NfaState[T],
                e: T): (NfaState[T], List[MatchResult[T]], List[MatchResult[T]]) = {
      val ts = tsOf(e)
      val live = List.newBuilder[Partial[T]]
      val completed = List.newBuilder[Pending[T]]
      val expired = List.newBuilder[Partial[T]]
      var nextOrigin = st.nextOrigin

      for (p <- st.partials) {
        if (spec.withinMs.exists(w => ts - p.startTs > w)) {
          if (!p.matched) expired += p
        } else {
          val s = p.stepIdx
          val cur = steps(s)
          val curPos = posOf(s)
          // trailing-run length at the current step — gates bounded
          // branches (B{n,m} inside an alternation); entries are
          // match-length vectors, so the run walk is cheap
          val curCnt =
            if (isBounded(cur)) trailingRun(p.entries, s) else 1
          // loop targets: a group-quantified alternation position
          // ((B|C)+) loops via EVERY groupLoop alternative of the
          // position (repetitions may switch branches) — a bounded
          // branch continues only while its run stays decomposable
          // and is left (branch switch) only on a whole repetition
          // boundary; a plain B+ self-loops only, a bounded B{n,m}
          // only below its cap
          val loopTs: Vector[Int] =
            if (!cur.oneOrMore) Vector.empty
            else if (cur.groupLoop)
              posSteps(curPos).iterator
                .filter { j =>
                  steps(j).groupLoop && steps(j).hit(e, p.entries) &&
                    (if (j == s) canTakeAnother(cur, curCnt)
                     else runsDone(cur, curCnt))
                }.toVector
            else if (canTakeAnother(cur, curCnt) &&
              cur.hit(e, p.entries)) Vector(s)
            else Vector.empty
          // advance targets: every alternative of the next position,
          // plus — while positions are optional — of the ones after
          // it; a bounded branch holds the partial until its trailing
          // run is a whole number of legal repetitions
          val advT = Vector.newBuilder[Int]
          if (runsDone(cur, curCnt)) {
            var q = curPos + 1
            var scan = true
            while (q < nPos && scan) {
              for (j <- posSteps(q)) if (steps(j).hit(e, p.entries)) advT += j
              scan = posOptional(q); q += 1
            }
          }
          val adv = advT.result()
          val anyFired = loopTs.nonEmpty || adv.nonEmpty
          // preference order: loop before advance (greedy) or after
          // (reluctant); loop targets and advance targets each in
          // leftmost-alternative order (SQL alternation preference)
          val ordered: Vector[(Int, Boolean)] =
            if (loopTs.isEmpty) adv.map((_, false))
            else if (cur.quant == Reluctant)
              adv.map((_, false)) ++ loopTs.map((_, true))
            else loopTs.map((_, true)) ++ adv.map((_, false))
          // branch arbitration via priorities — except the classic
          // AllMatches loop/advance tie, which branches unranked and
          // reports every loop length (FlinkCEP-style)
          val ranked = ordered.size > 1 &&
            !(loopTs.size == 1 && adv.size == 1 && cur.quant == AllMatches)
          var r = 0
          for ((j, _) <- ordered) {
            val pr = if (ranked) p.prio :+ r else p.prio
            val newEntries = p.entries :+ (j, e)
            val jPos = posOf(j)
            // trailing run at j after consuming e: extends the current
            // run when looping on the same step, else starts a new one
            val jTrail = if (j == s) curCnt + 1 else 1
            // a bounded branch is not a match boundary until its
            // trailing run is a whole number of legal repetitions
            val isFinal = allOptFrom(jPos + 1) && runsDone(steps(j), jTrail)
            val extendable = steps(j).oneOrMore || jPos < nPos - 1
            if (isFinal) {
              // a completion on a still-extendable LOOPING final step
              // is a length tie the quantifier must arbitrate: greedy
              // holds the shorter match (the continuation threatens
              // it; if a longer completion lands it wins), reluctant
              // releases it immediately; AllMatches stays unranked
              // and reports every length (FlinkCEP-style). Without
              // this, a pattern ENDING in a greedy loop ((B{2,3}),
              // A B+) emitted one match per length.
              val canLoopOn = extendable && steps(j).oneOrMore &&
                canTakeAnother(steps(j), jTrail)
              val (prPend, prLive) =
                if (canLoopOn && steps(j).quant == Greedy)
                  (pr :+ 1, pr :+ 0)
                else if (canLoopOn && steps(j).quant == Reluctant)
                  (pr :+ 0, pr :+ 1)
                else (pr, pr)
              completed += Pending(p.origin, prPend, newEntries)
              if (extendable) // a B+/B* tail (or optional suffix) extends
                live += Partial(newEntries, p.startTs, matched = true,
                  p.origin, prLive)
            } else live += Partial(newEntries, p.startTs, p.matched,
              p.origin, pr)
            r += 1
          }
          // does the un-extended partial survive this event?
          val survives =
            (if (curPos + 1 < nPos) steps(posSteps(curPos + 1)(0)).contiguity
             else FollowedBy) match {
              case Next          => false              // strict: no skipping
              case FollowedBy    => !anyFired          // greedy consumption
              case FollowedByAny => true               // branch on every match
            }
          if (survives) live += p
        }
      }
      // every event matching an admissible START step (the first
      // position, plus later positions while the leading ones are
      // optional) opens a new attempt
      locally {
        val startT = Vector.newBuilder[Int]
        var q = 0
        var scan = true
        while (q < nPos && scan) {
          for (j <- posSteps(q)) if (steps(j).hit(e, Vector.empty)) startT += j
          scan = posOptional(q); q += 1
        }
        val starts = startT.result()
        if (starts.nonEmpty) {
          // single-step fast path: complete-per-event only applies to
          // an unbounded, non-counting step — a bounded B{n,m}
          // (minReps > 1 OR maxReps >= 0) must build a partial, loop,
          // and count, or the cap would be silently ignored
          if (steps.length == 1 && steps(0).minReps <= 1 &&
            steps(0).maxReps < 0) {
            completed += Pending(nextOrigin, Vector.empty, Vector((0, e)))
            nextOrigin += 1
          } else {
            val ranked = starts.size > 1
            var r = 0
            for (j <- starts) {
              val pr = if (ranked) Vector(r) else Vector.empty[Int]
              val entries0 = Vector((j, e))
              val jPos = posOf(j)
              // one event consumed at j: final only if a single event
              // is a whole legal repetition (minReps 1)
              val isFinal = allOptFrom(jPos + 1) && runsDone(steps(j), 1)
              val extendable = steps(j).oneOrMore || jPos < nPos - 1
              if (isFinal) {
                // same loop-vs-complete quantifier arbitration as the
                // transition path (a start event can both complete a
                // final looping step and keep looping)
                val canLoopOn = extendable && steps(j).oneOrMore &&
                  canTakeAnother(steps(j), 1)
                val (prPend, prLive) =
                  if (canLoopOn && steps(j).quant == Greedy)
                    (pr :+ 1, pr :+ 0)
                  else if (canLoopOn && steps(j).quant == Reluctant)
                    (pr :+ 0, pr :+ 1)
                  else (pr, pr)
                completed += Pending(nextOrigin, prPend, entries0)
                if (extendable)
                  live += Partial(entries0, ts, matched = true, nextOrigin,
                    prLive)
              } else live += Partial(entries0, ts, matched = false,
                nextOrigin, pr)
              r += 1
            }
            nextOrigin += 1
          }
        }
      }
      val (st2, done) =
        resolve(NfaState(live.result(), st.pending ++ completed.result(),
          nextOrigin))
      // a timed-out branch of an attempt that completed is backtracking
      // noise, not a timeout — suppress it
      val matchedOrigins =
        st2.pending.map(_.origin).toSet ++ done.map(_._1)
      val timedOut = expired.result()
        .filterNot(p => needsBacktrack && matchedOrigins(p.origin))
        .map(p => MatchResult("timeout", p.entries))
      (st2, done.map(d => MatchResult("match", d._2)), timedOut)
    }

    /** Expire partials whose `within` window has closed at watermark
      * `wm` without consuming an event (event-time timer path).
      * Removing a branch can release a held-back match of the same
      * attempt, so this runs the release pass too. */
    def expire(st: NfaState[T], wm: Long): (NfaState[T], List[MatchResult[T]], List[MatchResult[T]]) = {
      if (spec.withinMs.isEmpty) return (st, Nil, Nil)
      val within = spec.withinMs.get
      val (dead, alive) = st.partials.partition(_.startTs + within <= wm)
      if (dead.isEmpty) return (st, Nil, Nil)
      val (st2, done) = resolve(NfaState(alive, st.pending, st.nextOrigin))
      val matchedOrigins =
        st2.pending.map(_.origin).toSet ++ done.map(_._1)
      val timedOut = dead
        .filterNot(p => p.matched || (needsBacktrack && matchedOrigins(p.origin)))
        .map(p => MatchResult("timeout", p.entries))
        .toList
      (st2, done.map(d => MatchResult("match", d._2)), timedOut)
    }

    /** Release every pending match whose attempt has no live
      * higher-priority branch left; apply the AFTER MATCH SKIP
      * strategy to each released match in start order. Returns the
      * pruned state and the released (origin, entries) list. */
    private def resolve(st: NfaState[T]): (NfaState[T], List[(Long, Vector[(Int, T)])]) = {
      if (st.pending.isEmpty) return (st, Nil)
      var live = st.partials
      var pending = st.pending
      val released = List.newBuilder[(Long, Vector[(Int, T)])]
      // candidates release in attempt order (SQL: matches report in
      // order of their start), then by preference within an attempt
      var progressed = true
      while (progressed) {
        progressed = false
        val byOrigin = pending.groupBy(_.origin)
        val ready = byOrigin.toList.sortBy(_._1).find { case (o, ps) =>
          val best = ps.map(_.prio).reduceLeft((a, b) => if (lexLt(b, a)) b else a)
          val unthreatened =
            !live.exists(p => p.origin == o && lexLt(p.prio, best))
          // with a skip strategy matches resolve sequentially: an
          // earlier attempt still in flight could complete, win, and
          // prune this one — hold until it decides
          val firstInLine = spec.skip == NoSkip ||
            (!live.exists(_.origin < o) && !pending.exists(_.origin < o))
          unthreatened && firstInLine
        }
        ready.foreach { case (o, ps) =>
          val best = ps.map(_.prio).reduceLeft((a, b) => if (lexLt(b, a)) b else a)
          val wins = ps.filter(_.prio == best)
          wins.foreach(w => released += ((o, w.entries)))
          // the attempt is decided: drop its losing branches
          pending = pending.filterNot(_.origin == o)
          live = live.filterNot(p => p.origin == o && lexLt(best, p.prio))
          // AFTER MATCH SKIP prunes overlapping attempts (live AND held)
          if (spec.skip != NoSkip) {
            val m = wins.head.entries
            val keepFrom: Long = spec.skip match {
              case SkipPastLastEvent => tsOf(m.last._2) + 1
              case SkipToNextRow => tsOf(m.head._2) + 1
              case SkipToLast(name) =>
                // by step NAME: a quantifier-expanded variable spans
                // several step indices that all carry its name
                m.reverse.collectFirst {
                  case (i, ev) if steps(i).name == name => tsOf(ev)
                }.getOrElse(tsOf(m.last._2))
              case SkipToFirst(name) =>
                m.collectFirst {
                  case (i, ev) if steps(i).name == name => tsOf(ev)
                }.getOrElse(tsOf(m.last._2))
              case NoSkip => Long.MinValue
            }
            live = live.filter(p => tsOf(p.entries.head._2) >= keepFrom)
            pending = pending.filter(p => tsOf(p.entries.head._2) >= keepFrom)
          }
          progressed = true
        }
      }
      (NfaState(live, pending, st.nextOrigin), released.result())
    }

    /** End-of-input flush (batch): no further event can extend any
      * branch, so every attempt's best completed match is final. */
    def flush(st: NfaState[T]): (NfaState[T], List[MatchResult[T]]) = {
      val (st2, done) = resolve(st.copy(partials = Vector.empty))
      // restore live partials minus the attempts that just resolved
      val decided = done.map(_._1).toSet
      val liveLeft = st.partials.filterNot(p => decided(p.origin))
      (NfaState(liveLeft, st2.pending, st.nextOrigin),
        done.map(d => MatchResult("match", d._2)))
    }

    /** Run a whole ordered sequence (batch per-key path). Partials
      * still pending at the end are neither matched nor timed out. */
    def run(events: Seq[T]): (List[MatchResult[T]], List[MatchResult[T]]) = {
      var st = NfaState.empty[T]
      val done = List.newBuilder[MatchResult[T]]
      val timedOut = List.newBuilder[MatchResult[T]]
      for (e <- events) {
        val (s2, d, t) = onEvent(st, e)
        st = s2
        done ++= d
        timedOut ++= t
      }
      done ++= flush(st)._2
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
