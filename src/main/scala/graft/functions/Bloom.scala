package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bloom-filter primitives shared by the build side (the
  * [[Aggregators.bloomAgg]] bitset aggregator, executor Scala) and the
  * probe side (the [[mightContain]] Column expression, codegen'd SQL).
  * The two sides MUST derive identical bit positions from a key, so
  * the position schedule lives here once, in arithmetic every engine
  * wraps identically AND that never overflows a signed 64-bit long —
  * Spark 4 runs ANSI mode by default, where a wrapping multiply is a
  * runtime error, so the usual Kirsch-Mitzenmacher `h * golden-odd`
  * remix is off the table. Keys are 60-bit md5 prefixes
  * ([[Portable.hash60]]) — already uniform, so a cheap xor-shift
  * spread is enough:
  *
  *   h1   = h ^ (h >>> 29)          (< 2^60)
  *   step = (h >>> 17) | 1          (odd, < 2^43)
  *   pos_i = (h1 + i·step) & (numBits - 1)   for i in [0, numHashes)
  *
  * `numBits` is a power of two, so an odd step is coprime with the
  * table size and the i-walk never collapses onto one slot. The sum
  * stays under 2^61 for numHashes ≤ 8 — ANSI-safe.
  */
object Bloom {

  val MaxHashes = 8

  /** Smallest power of two ≥ n, floored at 64 (one bitset word). */
  def pow2Bits(n: Long): Int = {
    require(n <= (1L << 30), s"bloom bitset of $n bits exceeds the 128 MiB cap")
    math.max(64, java.lang.Long.highestOneBit(math.max(1, n - 1)) << 1).toInt
  }

  /** Scala-side position schedule — the build twin. */
  def positions(h: Long, numBits: Int, numHashes: Int): Array[Int] = {
    val h1 = h ^ (h >>> 29)
    val step = (h >>> 17) | 1L
    Array.tabulate(numHashes)(i => ((h1 + i * step) & (numBits - 1)).toInt)
  }

  /** Column-side probe: true iff every scheduled bit is set in the
    * `array<long>` bitset `bloom`. Pure built-in expressions (the
    * dynamic in-word shift goes through the SQL `shiftrightunsigned`,
    * which accepts a column shift amount) — whole-stage codegen keeps
    * the probe inside the scan stage, no UDF boundary.
    */
  def mightContain(bloom: Column, h: Column,
                   numBits: Int, numHashes: Int): Column = {
    require(numHashes >= 1 && numHashes <= MaxHashes,
      s"numHashes must be in [1, $MaxHashes]")
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      "numBits must be a power of two >= 64")
    val h1 = h.bitwiseXOR(shiftrightunsigned(h, 29))
    val step = shiftrightunsigned(h, 17).bitwiseOR(lit(1L))
    (0 until numHashes).map { i =>
      val pos = (h1 + lit(i.toLong) * step).bitwiseAND(lit((numBits - 1).toLong))
      val word = element_at(bloom,
        (shiftrightunsigned(pos, 6) + lit(1L)).cast("int"))
      call_function("shiftrightunsigned", word,
        pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
