package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` ports of the reference's
  * AggregateFunction surface (`topn/HotItems.java:162-185`:
  * createAccumulator/add/merge/getResult ↔ zero/reduce/merge/finish).
  */
object Aggregators {

  /** 1:1 port of the reference CountAgg (`HotItems.java:162-185`). */
  class CountAgg[T] extends Aggregator[T, Long, Long] {
    def zero: Long = 0L
    def reduce(acc: Long, in: T): Long = acc + 1
    def merge(a: Long, b: Long): Long = a + b
    def finish(acc: Long): Long = acc
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  case class Scored(sim: Double, id: Long)

  /** Bounded top-k by (sim desc, id asc): the partial-aggregatable
    * alternative to a rank-over-window — each map task keeps at most
    * k candidates, so no full sort/shuffle of all scored pairs. The
    * ordering is total (ties broken by id), so the result equals the
    * window formulation exactly. NaN ranks GREATEST (SQL ORDER BY
    * DESC semantics in both Spark and DuckDB) — a primitive `>`
    * comparator would break the strict weak ordering on NaN (a
    * zero-norm vector's cosine) and could throw in sortWith, while
    * silently never ranking the NaN row the oracle ranks first;
    * ±0.0 stay equal (primitive ==), matching SQL comparison.
    */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean = {
      val (an, bn) = (a.sim.isNaN, b.sim.isNaN)
      if (an || bn) (an && !bn) || (an && bn && a.id < b.id)
      else a.sim > b.sim || (a.sim == b.sim && a.id < b.id)
    }
    private def trim(xs: Seq[Scored]): Seq[Scored] =
      xs.sortWith(better).take(k)
    def zero: Seq[Scored] = Seq.empty
    def reduce(acc: Seq[Scored], in: Scored): Seq[Scored] = trim(acc :+ in)
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b)
    def finish(acc: Seq[Scored]): Seq[Scored] = acc
    def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  /** Column form: topK(k)(simCol, idCol) → array<struct<sim,id>>. */
  def topK(k: Int)(sim: Column, id: Column): Column = {
    implicit val enc: Encoder[Scored] = Encoders.product[Scored]
    udaf(new TopK(k), enc).apply(sim, id)
  }

  case class ScoredKey(score: Long, key: String)

  /** Bounded top-k by (score desc, key asc) for string-keyed counts
    * (top tokens, top sources, ...) — same partial-aggregatable shape
    * as [[TopK]], total order so it equals the window formulation. */
  class TopKByKey(k: Int)
      extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {
    private def better(a: ScoredKey, b: ScoredKey): Boolean =
      a.score > b.score || (a.score == b.score && a.key < b.key)
    private def trim(xs: Seq[ScoredKey]): Seq[ScoredKey] =
      xs.sortWith(better).take(k)
    def zero: Seq[ScoredKey] = Seq.empty
    def reduce(acc: Seq[ScoredKey], in: ScoredKey): Seq[ScoredKey] =
      trim(acc :+ in)
    def merge(a: Seq[ScoredKey], b: Seq[ScoredKey]): Seq[ScoredKey] =
      trim(a ++ b)
    def finish(acc: Seq[ScoredKey]): Seq[ScoredKey] = acc
    def bufferEncoder: Encoder[Seq[ScoredKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
    def outputEncoder: Encoder[Seq[ScoredKey]] = bufferEncoder
  }

  /** Column form: topKByKey(k)(scoreCol, keyCol) → array<struct<score,key>>. */
  def topKByKey(k: Int)(score: Column, key: Column): Column = {
    implicit val enc: Encoder[ScoredKey] = Encoders.product[ScoredKey]
    udaf(new TopKByKey(k), enc).apply(score, key)
  }

  /** The k smallest DISTINCT long values — the KMV (k-minimum-values)
    * distinct-count sketch state. Unlike a plain bottom-k, duplicates
    * collapse inside the buffer, so a token that appears a billion
    * times costs one slot; each map task carries ≤ k longs and merge
    * is a sorted-union trim — a genuinely mergeable sketch with none
    * of the exact-distinct shuffle. Deterministic: the state after any
    * partition/merge order is the same k smallest distinct values.
    */
  class BottomKDistinct(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)
    def zero: Seq[Long] = Seq.empty
    def reduce(acc: Seq[Long], in: Long): Seq[Long] =
      // cheap membership/bound guard before the sort-trim: buffers are
      // already sorted ≤ k, so most inputs exit on the binary search
      if (acc.length >= k && in >= acc.last) acc
      else if (java.util.Arrays.binarySearch(acc.toArray, in) >= 0) acc
      else trim(acc :+ in)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)
    def finish(acc: Seq[Long]): Seq[Long] = acc
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Column form: bottomKDistinct(k)(hashCol) → sorted array<long>. */
  def bottomKDistinct(k: Int)(v: Column): Column = {
    implicit val enc: Encoder[Long] = Encoders.scalaLong
    udaf(new BottomKDistinct(k), enc).apply(v)
  }

  /** Bloom-filter bitset over 60-bit key hashes: a fixed
    * `numBits`-wide bitset per group, bits scheduled by
    * [[Bloom.positions]] (the probe side reads them back with the
    * Column twin [[Bloom.mightContain]]). Merge is a word-wise OR —
    * fully partial-aggregatable, state size independent of input
    * count, the textbook mergeable filter.
    */
  class BloomFilterAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      "numBits must be a power of two >= 64")
    def zero: Array[Long] = new Array[Long](numBits >> 6)
    def reduce(acc: Array[Long], h: Long): Array[Long] = {
      val ps = Bloom.positions(h, numBits, numHashes)
      var i = 0
      while (i < ps.length) {
        acc(ps(i) >> 6) |= 1L << (ps(i) & 63)
        i += 1
      }
      acc
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(acc: Array[Long]): Array[Long] = acc
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Column form: bloomAgg(bits, hashes)(hashCol) → array<long> bitset. */
  def bloomAgg(numBits: Int, numHashes: Int)(v: Column): Column = {
    implicit val enc: Encoder[Long] = Encoders.scalaLong
    udaf(new BloomFilterAgg(numBits, numHashes), enc).apply(v)
  }

  /** Total-variation distance of a group's word-hash multiset against
    * a frozen reference distribution (the q90 closed form, serve-side:
    * reference counts `ref` + grand total `total` are model-sized and
    * ride the task closure/broadcast). Buffer = the group's word
    * histogram as an immutable HAMT map (effectively O(log n)
    * updates); the group is one (window, source) cell, so the buffer
    * is that cell's vocabulary — bounded by the window, evicted with
    * it. finish() folds the absent-mass term in closed form exactly
    * like the batch op: numerators in BigInt (exact), one double
    * division sequence on exact operands at the end.
    */
  class DriftAgg(ref: Map[Long, Long], total: Long)
      extends Aggregator[Long, Map[Long, Long], (Long, Double)] {
    require(total > 0, s"drift reference total must be >= 1, got $total")
    def zero: Map[Long, Long] = Map.empty
    def reduce(m: Map[Long, Long], wh: Long): Map[Long, Long] =
      m.updated(wh, m.getOrElse(wh, 0L) + 1L)
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v) }
    def finish(m: Map[Long, Long]): (Long, Double) = {
      val tS = m.valuesIterator.sum
      if (tS == 0L) (0L, 0.0)
      else {
        var num = BigInt(0)
        var cwSum = 0L
        m.foreach { case (wh, cSw) =>
          val cW = ref.getOrElse(wh, 0L)
          num += (BigInt(cSw) * total - BigInt(cW) * tS).abs
          cwSum += cW
        }
        val tv = (num.toDouble / (tS.toDouble * total.toDouble) +
          (total.toDouble - cwSum.toDouble) / total.toDouble) * 0.5
        (tS, tv)
      }
    }
    def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    def outputEncoder: Encoder[(Long, Double)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]()
  }

  /** Column form: driftAgg(ref, total)(wordHashCol) →
    * struct(n_tokens, tv_dist). */
  def driftAgg(ref: Map[Long, Long], total: Long)(v: Column): Column = {
    implicit val enc: Encoder[Long] = Encoders.scalaLong
    udaf(new DriftAgg(ref, total), enc).apply(v)
  }
}
