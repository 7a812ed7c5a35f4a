package graft.cep

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential fuzz of the PROGRAMMATIC CEP surface (the Pattern-API
  * path real FlinkCEP users drive: `Cep.begin.followedBy/next/
  * followedByAny(...).times(n).within(ms)` onto `Cep.Nfa.run`),
  * against a brute-force enumeration oracle — the DSL twin of
  * [[MatchRecognizeFuzzSpec]], which fuzzes the SQL front-end. The
  * round-8 fuzz found five NFA bugs in machinery both paths share,
  * but drove it only through parsed clauses (strict contiguity
  * everywhere, no AllMatches quantifier); this arm closes the seam
  * the SQL path cannot reach:
  *
  *   - contiguity per step: strict `next` vs relaxed `followedBy`
  *     (greedy consumption: the un-extended partial dies the moment
  *     any transition fires) vs branching `followedByAny` (a branch
  *     per future match);
  *   - the `AllMatches` quantifier (FlinkCEP's default — every loop
  *     length reported immediately) alongside Greedy/Reluctant;
  *   - `times(n)` expansion through the public builder;
  *   - per-event attempt spawning + `within` expiry on the DSL path.
  *
  * Oracle semantics, from the documented contract (Cep.scala scaladoc
  * on Contiguity/Quant/Step — independent of the slot/pending/priority
  * machinery under test): per start row, a DFS enumerates EVERY
  * completion with a static preference digit per consumed event
  * (extend-before-advance unless Reluctant; completion ranks opposite
  * the extension). When any step carries a non-AllMatches quantifier
  * the engine arbitrates whole attempts by lexicographic priority and
  * releases only the preferred completion(s); with pure AllMatches it
  * releases everything. The oracle applies exactly that reduction to
  * its enumeration. Matches compare as multisets of full
  * (stepIdx, rowIdx) bindings — order-free, because release order
  * interleaves attempts by resolution time.
  *
  * Round 10 lifted the `optional` exclusion for the SLOT-RANKED
  * subset: a third arm fuzzes `.optional` steps (multi-target
  * advance walks, start fan-out, skip-ranked completions) against a
  * walk-digit oracle, restricted to patterns with >= 1
  * Greedy/Reluctant step — there every transition carries a STATIC
  * slot digit, so "enumerate all completions, keep each attempt's
  * lexicographic best" is release-timing-independent and provably
  * the engine's released set. What remains out of EXACT-set fuzzing,
  * permanently: optional steps on the PURE-AllMatches path — its
  * consecutive tie ranks are assigned only at multi-fire events, so
  * which completions survive depends on release ORDER (a pending
  * match is dropped when a sibling that completed earlier wins), and
  * a faithful oracle would have to replay the pending/priority
  * machinery itself — asserting the implementation against a
  * paraphrase of the implementation. Round 11 narrowed what that
  * exclusion costs: a SOUNDNESS arm fuzzes the corner's release-
  * order-INDEPENDENT contract (released ⊆ enumerated completions,
  * no duplicate release, every completing attempt releases ≥ 1) with
  * the same volume as the exact arms; only the exact released SET
  * stays hand-pinned (the optional-step hand anchors below +
  * CepSpec's optional tests).
  *
  * Round 12 DECISION, closing the question for good: the exclusion is
  * PERMANENT. An exact released-set oracle for this corner must
  * predict which pending completion a consecutive tie rank kills,
  * and that rank is assigned by release TIME at multi-fire events —
  * so any faithful oracle is forced to simulate the slot/pending/
  * priority scheduler step by step, i.e. to re-state the unit under
  * test (no release-order-free characterization of the set exists:
  * two engines honoring the same documented contract may release
  * different sets here, and FlinkCEP pins no order either). The
  * soundness arm + hand anchors are therefore the strongest
  * implementation-independent evidence this corner admits.
  *
  * Deliberately out of scope (documented, not silently skipped):
  * single-step patterns (the engine's complete-per-event fast path is
  * a different, simpler machine — covered by CepSpec hand cases),
  * `optional` steps on the pure-AllMatches path (above), skip
  * strategies other than NoSkip (sequential-release semantics are
  * driven by the SQL fuzz across all three SQL strategies; the skip
  * arm here additionally keeps optional steps out of scope), and the
  * timeout side channel (hand-pinned in CepSpec).
  */
class CepApiFuzzSpec extends AnyFunSuite {

  private case class Ev(sym: Char, row: Int, ts: Long)

  // model of one builder call; times >= 1 expands to that many copies
  // (mirroring PatternSpec.times, which requires a non-loop step).
  // `opt` models `.optional` and is only generated with times == 1
  // (PatternSpec.times resets optional on its copies)
  private case class MStep(sym: Char, contig: Cep.Contiguity,
                           loop: Boolean, quant: Cep.Quant, times: Int,
                           opt: Boolean = false)

  private val TsStep = 700L
  private def tsOf(row: Int): Long = (row + 1) * TsStep

  private def hit(sym: Char, e: Char): Boolean = sym == '*' || sym == e

  /** Build the spec through the PUBLIC builder API — the exact call
    * sequence a user writes. */
  private def build(steps: Vector[MStep],
                    withinMs: Option[Long]): Cep.PatternSpec[Ev] = {
    def pred(sym: Char): (Ev, Seq[Ev]) => Boolean =
      (e, _) => hit(sym, e.sym)
    var spec = Cep.begin[Ev]("S0", steps.head.loop)(pred(steps.head.sym))
    if (steps.head.times > 1) spec = spec.times(steps.head.times)
    if (steps.head.opt) spec = spec.optional
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val name = s"S$i"
      spec = st.contig match {
        case Cep.Next => spec.next(name, st.loop, st.quant)(pred(st.sym))
        case Cep.FollowedBy =>
          spec.followedBy(name, st.loop, st.quant)(pred(st.sym))
        case Cep.FollowedByAny =>
          spec.followedByAny(name, st.loop, st.quant)(pred(st.sym))
      }
      if (st.times > 1) spec = spec.times(st.times)
      if (st.opt) spec = spec.optional
    }
    withinMs.fold(spec)(spec.within)
  }

  // the flat step list the engine actually runs (times expanded),
  // mirrored for the oracle
  private case class OStep(sym: Char, contig: Cep.Contiguity,
                           loop: Boolean, quant: Cep.Quant,
                           opt: Boolean = false)
  private def expand(steps: Vector[MStep]): Vector[OStep] =
    steps.flatMap(st =>
      Vector.fill(st.times)(OStep(st.sym, st.contig, st.loop, st.quant,
        st.opt)))

  /** All completions of the attempt starting at `start`, each with
    * its preference-digit vector (one digit per consumed event after
    * the start, plus the completion digit). */
  private def enumerate(steps: Vector[OStep], tape: String, start: Int,
                        withinMs: Long)
      : Vector[(Vector[(Int, Int)], Vector[Int])] = {
    val n = steps.length
    val last = n - 1
    val maxRow =
      if (withinMs <= 0) tape.length - 1
      else tape.indices.lastIndexWhere(r => tsOf(r) - tsOf(start) <= withinMs)
    // static slot of each choice at step j (no optional steps in
    // scope, so the engine's advance walk is a single target and the
    // digit space is {0, 1}): extension ranks before leaving unless
    // the step's own quantifier is Reluctant
    def extendDigit(j: Int): Int = if (steps(j).quant == Cep.Reluctant) 1 else 0
    def leaveDigit(j: Int): Int = 1 - extendDigit(j)
    val out = Vector.newBuilder[(Vector[(Int, Int)], Vector[Int])]
    def explore(j: Int, i: Int, binding: Vector[(Int, Int)],
                digits: Vector[Int]): Unit = {
      if (j == last)
        out += ((binding,
          digits :+ (if (steps(j).loop) leaveDigit(j) else 0)))
      if (j == last && !steps(j).loop) return
      // which contiguity governs the gap scan from this step: the
      // NEXT step's (positions advance toward it), or the step's own
      // at the final position (Cep.onEvent's `survives` rule)
      val gov = if (j < last) steps(j + 1).contig else steps(j).contig
      var r = i + 1
      var scanning = true
      while (scanning && r <= maxRow) {
        val choices = Vector.newBuilder[(Int, Int)] // (target, digit)
        if (steps(j).loop && hit(steps(j).sym, tape(r)))
          choices += ((j, extendDigit(j)))
        if (j < last && hit(steps(j + 1).sym, tape(r)))
          choices += ((j + 1,
            if (steps(j).loop) leaveDigit(j) else 0))
        val cs = choices.result()
        cs.foreach { case (t, d) =>
          explore(t, r, binding :+ ((t, r)), digits :+ d)
        }
        gov match {
          case Cep.Next          => scanning = false // strict: row i+1 only
          case Cep.FollowedBy    => if (cs.nonEmpty) scanning = false
          case Cep.FollowedByAny => () // branch on every future match
        }
        r += 1
      }
    }
    if (hit(steps.head.sym, tape(start)))
      explore(0, start, Vector((0, start)), Vector.empty)
    out.result()
  }

  /** The released matches: every completion under pure AllMatches;
    * only each attempt's lexicographically-preferred completion(s)
    * once any step carries a real SQL quantifier. */
  private def oracle(steps: Vector[OStep], tape: String,
                     withinMs: Long): Seq[Vector[(Int, Int)]] = {
    val slotRanked = steps.exists(_.quant != Cep.AllMatches)
    def lexLt(a: Vector[Int], b: Vector[Int]): Boolean = {
      val k = math.min(a.length, b.length)
      var i = 0
      while (i < k) {
        if (a(i) != b(i)) return a(i) < b(i)
        i += 1
      }
      a.length < b.length
    }
    tape.indices.flatMap { start =>
      val all = enumerate(steps, tape, start, withinMs)
      if (all.isEmpty) Vector.empty
      else if (!slotRanked) all.map(_._1)
      else {
        val best = all.map(_._2).reduceLeft((a, b) => if (lexLt(b, a)) b else a)
        all.collect { case (bind, d) if d == best => bind }
      }
    }
  }

  private def runEngine(steps: Vector[MStep], tape: String,
                        withinMs: Option[Long]): Seq[Vector[(Int, Int)]] = {
    val spec = build(steps, withinMs)
    val nfa = new Cep.Nfa[Ev](spec, _.ts)
    val events = tape.zipWithIndex.map { case (c, r) => Ev(c, r, tsOf(r)) }
    val (done, _) = nfa.run(events)
    done.map(_.entries.map { case (si, e) => (si, e.row) }.toVector)
  }

  private def canon(ms: Seq[Vector[(Int, Int)]]): Seq[String] =
    ms.map(_.map { case (s, r) => s"$s@$r" }.mkString(",")).sorted

  // ---- generator ----------------------------------------------------

  private def genStep(rnd: Random, first: Boolean): MStep = {
    val sym = "abcd*" (rnd.nextInt(5))
    // begin() hardcodes FollowedBy (and times-copies inherit it), so
    // the first step's model contiguity must be FollowedBy too — it
    // is read whenever the step is not alone at the last position
    val contig =
      if (first) Cep.FollowedBy
      else rnd.nextInt(3) match {
        case 0 => Cep.Next
        case 1 => Cep.FollowedBy
        case _ => Cep.FollowedByAny
      }
    val loop = rnd.nextInt(10) < 4
    // begin() exposes no quantifier parameter, so a looping FIRST
    // step is always AllMatches — the API's own shape
    val quant =
      if (!loop || first) Cep.AllMatches
      else rnd.nextInt(3) match {
        case 0 => Cep.AllMatches
        case 1 => Cep.Greedy
        case _ => Cep.Reluctant
      }
    val times = if (!loop && rnd.nextInt(10) == 0) 2 + rnd.nextInt(2) else 1
    MStep(sym, contig, loop, quant, times)
  }

  private def genPattern(rnd: Random): Vector[MStep] = {
    val k = 2 + rnd.nextInt(3)
    val cand = Vector.tabulate(k)(i => genStep(rnd, first = i == 0))
    // exclude the single-step fast path (engine: a different machine)
    if (expand(cand).length >= 2) cand else genPattern(rnd)
  }

  private def genTape(rnd: Random): String = {
    val letters = "abcdx"
    (0 until 1 + rnd.nextInt(8))
      .map(_ => letters(rnd.nextInt(letters.length))).mkString
  }

  // default 2000 keeps the suite fast; crank via env for deep sweeps
  // (round 9 close: 500k enumeration + 250k skip-strategy + 250k
  // chunked cases green in one soak, alongside the SQL-path fuzz's
  // 500k + 250k)
  private val Cases =
    sys.env.getOrElse("GRAFT_FUZZ_CASES", "2000").toInt

  test(s"$Cases random (pattern, tape, within) Pattern-API cases " +
    "match the enumeration oracle") {
    val rnd = new Random(0xAB12CD34L)
    var cases = 0
    while (cases < Cases) {
      val steps = genPattern(rnd)
      val tape = genTape(rnd)
      val withinMs: Option[Long] =
        if (rnd.nextInt(4) == 0) Some((1 + rnd.nextInt(5)) * TsStep) else None
      val got = canon(runEngine(steps, tape, withinMs))
      val want = canon(oracle(expand(steps), tape, withinMs.getOrElse(0L)))
      assert(got == want,
        s"""pattern: $steps
           |tape   : $tape  within: $withinMs
           |engine : $got
           |oracle : $want""".stripMargin)
      cases += 1
    }
  }

  test(s"${Cases / 2} skip-strategy cases (relaxed contiguity) match " +
    "the sequential-scan oracle") {
    // the seam neither existing fuzz reaches: AFTER MATCH SKIP over
    // RELAXED contiguity (the SQL fuzz's skip coverage is all-strict;
    // the arm above is NoSkip-only). Scope: >= 1 Greedy/Reluctant
    // loop and no AllMatches loops (slot-ranked, one preferred match
    // per attempt) and no followedByAny (whose equal-priority
    // multi-wins make per-attempt release sets ambiguous under skip)
    // — then the engine's origin-ordered release + prune is exactly a
    // sequential scan: preferred full-tape match from the first
    // admissible start, jump per the strategy, repeat.
    val rnd = new Random(0x5C1B5C1BL)
    var cases = 0
    while (cases < Cases / 2) {
      val steps0 = genPattern(rnd)
      val steps = steps0.zipWithIndex.map { case (s, i) =>
        val noAny =
          if (s.contig == Cep.FollowedByAny) s.copy(contig = Cep.FollowedBy)
          else s
        if (noAny.loop && i > 0 && noAny.quant == Cep.AllMatches)
          noAny.copy(quant =
            if (rnd.nextBoolean()) Cep.Greedy else Cep.Reluctant)
        else if (noAny.loop && i == 0)
          // begin() cannot carry a quantifier; a first-step loop would
          // be an AllMatches loop — drop the loop instead
          noAny.copy(loop = false)
        else noAny
      }
      val expanded = expand(steps)
      val ranked = expanded.exists(s => s.loop && s.quant != Cep.AllMatches)
      val tape = genTape(rnd)
      if (ranked && tape.nonEmpty) {
        val stepNames = expanded.indices.map(i => s"S$i")
        // skip strategies name the BUILDER step (copies share it)
        val builderNames = steps.indices.map(i => s"S$i")
        val (skip, jump) = rnd.nextInt(4) match {
          case 0 => (Cep.SkipPastLastEvent,
            (m: Vector[(Int, Int)], i: Int) => m.map(_._2).max + 1)
          case 1 => (Cep.SkipToNextRow,
            (m: Vector[(Int, Int)], i: Int) => i + 1)
          case 2 =>
            val nm = builderNames(rnd.nextInt(builderNames.length))
            (Cep.SkipToLast(nm), (m: Vector[(Int, Int)], i: Int) => {
              val vr = m.collect {
                case (si, r) if nameOf(steps, si) == nm => r }
              math.max(if (vr.isEmpty) m.map(_._2).max else vr.max, i + 1)
            })
          case 3 =>
            val nm = builderNames(rnd.nextInt(builderNames.length))
            (Cep.SkipToFirst(nm), (m: Vector[(Int, Int)], i: Int) => {
              val vr = m.collect {
                case (si, r) if nameOf(steps, si) == nm => r }
              math.max(if (vr.isEmpty) m.map(_._2).max else vr.min, i + 1)
            })
        }
        val withinMs: Option[Long] =
          if (rnd.nextInt(4) == 0) Some((1 + rnd.nextInt(5)) * TsStep)
          else None
        val spec = build(steps, withinMs).afterMatchSkip(skip)
        val nfa = new Cep.Nfa[Ev](spec, _.ts)
        val evs = tape.zipWithIndex.map { case (c, r) => Ev(c, r, tsOf(r)) }
        val got = nfa.run(evs)._1
          .map(_.entries.map { case (si, e) => (si, e.row) }.toVector)
        // sequential-scan oracle: preferred match per admissible start
        val want = Vector.newBuilder[Vector[(Int, Int)]]
        var i = 0
        while (i < tape.length) {
          val all = enumerate(expanded, tape, i, withinMs.getOrElse(0L))
          if (all.isEmpty) i += 1
          else {
            val best = all.map(_._2).reduceLeft((a, b) =>
              if (lexLtV(b, a)) b else a)
            val m = all.collectFirst { case (bind, d) if d == best => bind }.get
            want += m
            i = jump(m, i)
          }
        }
        assert(got == want.result(),
          s"""pattern: $steps  skip: $skip  within: $withinMs
             |tape   : $tape
             |engine : ${canon(got)}
             |oracle : ${canon(want.result())}""".stripMargin)
        cases += 1
      }
    }
  }

  /** Builder-step name of an EXPANDED step index (times copies share
    * their builder step's name, exactly as PatternSpec.times keeps
    * the name on every copy). */
  private def nameOf(steps: Vector[MStep], expandedIdx: Int): String = {
    var i = expandedIdx
    var b = 0
    while (i >= steps(b).times) { i -= steps(b).times; b += 1 }
    s"S$b"
  }

  private def lexLtV(a: Vector[Int], b: Vector[Int]): Boolean = {
    val k = math.min(a.length, b.length)
    var i = 0
    while (i < k) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }

  // ---- optional-step arm (round 10) --------------------------------

  /** Walk-digit oracle for patterns WITH `.optional` steps, valid on
    * the slot-ranked subset (>= 1 Greedy/Reluctant step): mirrors the
    * engine's static slot spaces for single-alternative positions —
    * advWalkSeq (the advance walk through optional steps; the DSL's
    * `.optional` sets neither emptyBranch nor posSkip, so the skip
    * always ranks AFTER the consuming way), slotTables (extension
    * first unless the step's own quantifier is Reluctant; the
    * completion digit is the walk's all-optional terminal), and
    * startSlots (the walk from position 0 fans the attempt out over
    * every enterable start step). Released = each attempt's
    * lexicographically-best completion(s): with a digit on EVERY
    * transition, a pending completion and any live sibling compare
    * coherently at all times, so the released set is release-timing
    * independent — exactly why the arm restricts to slot-ranked
    * patterns. */
  private def oracleOpt(steps: Vector[OStep], tape: String,
                        withinMs: Long): Seq[Vector[(Int, Int)]] = {
    require(steps.exists(_.quant != Cep.AllMatches))
    tape.indices.flatMap { start =>
      val all = enumOptStart(steps, tape, start, withinMs)
      if (all.isEmpty) Vector.empty
      else {
        val best = all.map(_._2)
          .reduceLeft((a, b) => if (lexLtV(b, a)) b else a)
        all.collect { case (bind, d) if d == best => bind }
      }
    }
  }

  /** Every completion of the attempt at `start` for an optional-step
    * pattern, with its walk-digit vector — the shared enumerator
    * behind [[oracleOpt]] (which reduces to the lexicographic best)
    * and the pure-AllMatches SOUNDNESS arm (which uses the full
    * set). */
  private def enumOptStart(steps: Vector[OStep], tape: String,
                           start: Int, withinMs: Long)
      : Vector[(Vector[(Int, Int)], Vector[Int])] = {
    val n = steps.length
    val walks: Vector[Vector[Int]] = {
      val w = new Array[Vector[Int]](n + 1)
      w(n) = Vector(-1)
      for (j <- (n - 1) to 0 by -1)
        w(j) = if (steps(j).opt) j +: w(j + 1) else Vector(j)
      w.toVector
    }
    val allOptFrom =
      Vector.tabulate(n + 1)(p => (p until n).forall(steps(_).opt))
    // decision-slot list standing at step j: the step itself is the
    // extension edge (engine slotTables uses the step index), then
    // the advance walk; -1 is the completion terminal
    def slots(j: Int): Vector[Int] =
      if (!steps(j).loop) walks(j + 1)
      else if (steps(j).quant == Cep.Reluctant) walks(j + 1) :+ j
      else j +: walks(j + 1)
    val maxRow =
      if (withinMs <= 0) tape.length - 1
      else tape.indices.lastIndexWhere(r => tsOf(r) - tsOf(start) <= withinMs)
    val buf = Vector.newBuilder[(Vector[(Int, Int)], Vector[Int])]
    def explore(j: Int, i: Int, binding: Vector[(Int, Int)],
                digits: Vector[Int]): Unit = {
      if (j == n - 1 && !steps(j).loop) return
      val sl = slots(j)
      val gov = if (j < n - 1) steps(j + 1).contig else steps(j).contig
      var r = i + 1
      var scanning = true
      while (scanning && r <= maxRow) {
        val choices = Vector.newBuilder[(Int, Int)]
        if (steps(j).loop && hit(steps(j).sym, tape(r)))
          choices += ((j, sl.indexOf(j)))
        for (t <- walks(j + 1) if t >= 0 && hit(steps(t).sym, tape(r)))
          choices += ((t, sl.indexOf(t)))
        val cs = choices.result()
        cs.foreach { case (t, d) =>
          val nb = binding :+ ((t, r))
          val nd = digits :+ d
          if (allOptFrom(t + 1))
            buf += ((nb, nd :+ slots(t).indexOf(-1)))
          explore(t, r, nb, nd)
        }
        gov match {
          case Cep.Next          => scanning = false
          case Cep.FollowedBy    => if (cs.nonEmpty) scanning = false
          case Cep.FollowedByAny => ()
        }
        r += 1
      }
    }
    val w0 = walks(0)
    for (t <- w0 if t >= 0 && hit(steps(t).sym, tape(start))) {
      val b0 = Vector((t, start))
      val d0 = Vector(w0.indexOf(t))
      if (allOptFrom(t + 1)) buf += ((b0, d0 :+ slots(t).indexOf(-1)))
      explore(t, start, b0, d0)
    }
    buf.result()
  }

  /** Patterns for the optional arm: >= 1 optional step (times-1 only
    * — PatternSpec.times resets optional on copies), >= 1 REQUIRED
    * step (the engine rejects empty-capable patterns at
    * construction), >= 1 Greedy/Reluctant loop (the slot-ranked
    * restriction the oracle needs). */
  private def genOptPattern(rnd: Random): Vector[MStep] = {
    val cand = genPattern(rnd).map { s =>
      if (s.times == 1 && rnd.nextInt(3) == 0) s.copy(opt = true) else s
    }
    val ok = cand.exists(_.opt) && cand.exists(!_.opt) &&
      cand.exists(s => s.loop && s.quant != Cep.AllMatches)
    if (ok) cand else genOptPattern(rnd)
  }

  test(s"${Cases / 2} optional-step cases (slot-ranked) match the " +
    "walk-digit oracle") {
    val rnd = new Random(0x0B7A11EDL)
    var cases = 0
    while (cases < Cases / 2) {
      val steps = genOptPattern(rnd)
      val tape = genTape(rnd)
      val withinMs: Option[Long] =
        if (rnd.nextInt(4) == 0) Some((1 + rnd.nextInt(5)) * TsStep) else None
      val got = canon(runEngine(steps, tape, withinMs))
      val want = canon(oracleOpt(expand(steps), tape, withinMs.getOrElse(0L)))
      assert(got == want,
        s"""pattern: $steps
           |tape   : $tape  within: $withinMs
           |engine : $got
           |oracle : $want""".stripMargin)
      cases += 1
    }
  }

  /** SOUNDNESS arm (round 11) for the corner the exact-set fuzz
    * documents as permanently out of scope — optional steps on the
    * PURE-AllMatches path, where WHICH tie-siblings survive depends
    * on release order (consecutive tie ranks are assigned at
    * multi-fire events). Exact-set equality would need an oracle
    * that replays the pending/priority machinery — a paraphrase of
    * the implementation. What IS release-order independent, and
    * asserted here with volume: (a) every released match is a real
    * completion of its attempt per the walk enumeration (soundness —
    * no invented bindings), (b) no binding releases twice, (c) an
    * attempt with any completion releases at least one (arbitration
    * picks among siblings, it never kills an attempt outright). The
    * exact released SET stays hand-pinned (the anchors below). */
  test(s"${Cases / 2} optional-step PURE-AllMatches cases: released " +
    "matches are sound, unique, and attempt-covering") {
    val rnd = new Random(0xA11500D2L)
    var cases = 0
    while (cases < Cases / 2) {
      val steps = genOptPattern(rnd).map(s => s.copy(quant = Cep.AllMatches))
      val tape = genTape(rnd)
      val withinMs: Option[Long] =
        if (rnd.nextInt(4) == 0) Some((1 + rnd.nextInt(5)) * TsStep) else None
      val released = runEngine(steps, tape, withinMs)
      val ex = expand(steps)
      val enumerated: Vector[Set[Vector[(Int, Int)]]] =
        tape.indices.map(s =>
          enumOptStart(ex, tape, s, withinMs.getOrElse(0L))
            .map(_._1).toSet).toVector
      def ctx = s"pattern: $steps\ntape: '$tape' within: $withinMs" +
        s"\nreleased: ${canon(released)}"
      val cs = canon(released)
      assert(cs.distinct.size == cs.size, s"duplicate release\n$ctx")
      released.foreach { b =>
        assert(enumerated(b.head._2).contains(b),
          s"released binding is not a completion: $b\n$ctx")
      }
      val startsReleased = released.map(_.head._2).toSet
      tape.indices.foreach { s =>
        if (enumerated(s).nonEmpty)
          assert(startsReleased.contains(s),
            s"attempt at $s has ${enumerated(s).size} completions but " +
              s"released none\n$ctx")
      }
      cases += 1
    }
  }

  test(s"${Cases / 2} chunked-replay Pattern-API cases match one-shot run") {
    // the streaming seam: NfaState carried across micro-batch-sized
    // chunks with a zero-delay watermark expiry after each — must
    // reproduce the one-shot batch run exactly (the
    // MatchRecognizeFuzzSpec chunked discipline, on the DSL path)
    val rnd = new Random(0x0DD5EED5L)
    var cases = 0
    while (cases < Cases / 2) {
      val steps = genPattern(rnd)
      val tape = genTape(rnd)
      if (tape.nonEmpty) {
        val withinMs: Option[Long] =
          Some((1 + rnd.nextInt(5)) * TsStep)
        val spec = build(steps, withinMs)
        val nfa = new Cep.Nfa[Ev](spec, _.ts)
        val evs = tape.zipWithIndex.map { case (c, r) => Ev(c, r, tsOf(r)) }
        val oneShot = nfa.run(evs)._1.map(_.entries)
        var st = Cep.NfaState.empty[Ev]
        val got = Vector.newBuilder[Vector[(Int, Ev)]]
        var i = 0
        while (i < evs.length) {
          val sz = 1 + rnd.nextInt(3)
          val chunk = evs.slice(i, i + sz)
          for (e <- chunk) {
            val (s2, done, _) = nfa.onEvent(st, e)
            st = s2
            got ++= done.map(_.entries)
          }
          i += sz
          val (s3, released, _) = nfa.expire(st, math.min(i, evs.length) * TsStep)
          st = s3
          got ++= released.map(_.entries)
        }
        got ++= nfa.flush(st)._2.map(_.entries)
        assert(got.result() == oneShot.toVector,
          s"\npattern $steps tape='$tape' within=$withinMs: " +
            "chunked != one-shot")
        cases += 1
      }
    }
  }

  // a few hand-pinned anchors so a generator regression can't
  // silently gut the fuzz (the MatchRecognizeFuzzSpec discipline)
  test("hand anchors: followedBy greedy consumption vs followedByAny branching") {
    // A followedBy B on "abb": B consumes the FIRST b only
    val fb = Vector(
      MStep('a', Cep.FollowedBy, loop = false, Cep.AllMatches, 1),
      MStep('b', Cep.FollowedBy, loop = false, Cep.AllMatches, 1))
    assert(canon(runEngine(fb, "abb", None)) == Seq("0@0,1@1"))
    // A followedByAny B on "abb": every future b branches
    val fba = fb.updated(1, fb(1).copy(contig = Cep.FollowedByAny))
    assert(canon(runEngine(fba, "abb", None)) ==
      Seq("0@0,1@1", "0@0,1@2"))
    // A next B on "axb": strict gap kills the attempt
    val nx = fb.updated(1, fb(1).copy(contig = Cep.Next))
    assert(canon(runEngine(nx, "axb", None)).isEmpty)
    assert(canon(runEngine(nx, "ab", None)) == Seq("0@0,1@1"))
  }

  test("hand anchors: optional steps on the PURE-AllMatches path (the " +
    "corner the slot-ranked fuzz arm documents as out of scope)") {
    // a (b?) * with relaxed contiguity: when b and the skip-to-*
    // both fire on one event, the consecutive tie rank prefers
    // consuming b, and the skip branch's already-completed match is
    // pruned when the b-branch's completion releases
    val p = Vector(
      MStep('a', Cep.FollowedBy, loop = false, Cep.AllMatches, 1),
      MStep('b', Cep.FollowedBy, loop = false, Cep.AllMatches, 1,
        opt = true),
      MStep('*', Cep.FollowedBy, loop = false, Cep.AllMatches, 1))
    assert(canon(runEngine(p, "abc", None)) == Seq("0@0,1@1,2@2"))
    // when b never fires the skip path is the only one
    assert(canon(runEngine(p, "axc", None)) == Seq("0@0,2@1"))
    // truncated input: the skip branch's completion survives the
    // flush once the b branch can no longer complete
    assert(canon(runEngine(p, "ab", None)) == Seq("0@0,2@1"))
  }

  test("hand anchors: AllMatches loop reports every length; Greedy only the longest") {
    // A B+(AllMatches) with strict contiguity on "abb"
    val all = Vector(
      MStep('a', Cep.FollowedBy, loop = false, Cep.AllMatches, 1),
      MStep('b', Cep.Next, loop = true, Cep.AllMatches, 1))
    assert(canon(runEngine(all, "abb", None)) ==
      Seq("0@0,1@1", "0@0,1@1,1@2"))
    val greedy = all.updated(1, all(1).copy(quant = Cep.Greedy))
    assert(canon(runEngine(greedy, "abb", None)) == Seq("0@0,1@1,1@2"))
    val rel = all.updated(1, all(1).copy(quant = Cep.Reluctant))
    assert(canon(runEngine(rel, "abb", None)) == Seq("0@0,1@1"))
  }
}
