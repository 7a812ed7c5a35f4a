package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the ANN hot path: sequential dot
  * product over two `array<double>` columns with whole-stage codegen.
  * The fold order (ascending index, scalar accumulation) is the same
  * IEEE op sequence as the SQL-oracle's list_reduce and the previous
  * HOF implementation — results are bit-identical; only the
  * interpretation overhead (one closure call per element) is gone.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The whole per-centroid squared-L2 distance ARRAY of one PQ
  * subspace as a SINGLE expression: given the subvector column and a
  * plan-constant codebook, emits `[ |x|² − 2·x·c_k + |c_k|² ]` for
  * every centroid k in one fused nested loop.
  *
  * Why one fused node (round-7 measurements, 200 k × 64-d rows, 16
  * centroids × 4 subspaces): spelling the 64 per-centroid distances
  * as separate expressions hit a generated-code cliff whenever each
  * element contained its own ARRAY loop — `transform()` HOF over
  * literal centroids ~15 s, unrolled DotProduct against ArrayData
  * literals (Generic- or Unsafe-backed) ~15 s, even a custom
  * one-loop-per-centroid primitive-`double[]` expression ~12 s —
  * while the same arithmetic as straight-line scalar multiply-add
  * chains ran ~1 s. Straight-line chains split into many small
  * JIT-able methods; dozens of distinct loops in one projection do
  * not. But the scalar spelling costs ~32× more expression nodes,
  * and PLANNING then dominates small inputs (the sf0.1 bench paid
  * +1.5 s per PQ query re-optimizing the ~12 k-node tree each run).
  * One fused node per subspace keeps the tree model-sized (4 nodes)
  * AND the execution a single tight primitive loop: sf10 distance
  * pass ~1 s, sf0.1 plan overhead gone.
  *
  * Bit-exactness: |x|² and each x·c accumulate in ascending index
  * order from 0.0 — exactly [[DotProduct]]'s fold and the oracle's
  * `list_reduce(list_prepend(0.0, …))` — and the element order is
  * the codebook order, so argmin/array_min and the driver hash are
  * unchanged against every previous spelling.
  */
case class PqDistances(child: Expression, cents: Array[Array[Double]],
                       norms: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    var x2 = 0.0
    var i = 0
    while (i < x.length) { x2 += x(i) * x(i); i += 1 }
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val w = cents(c)
      val n = math.min(x.length, w.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += x(j) * w(j); j += 1 }
      out(c) = x2 - 2.0 * s + norms(c)
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("cents", cents, "double[][]")
      val ns = ctx.addReferenceObj("norms", norms, "double[]")
      val x = ctx.freshName("x")
      val x2 = ctx.freshName("x2")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double $x2 = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $x2 += $x[$i] * $x[$i]; }
         |double[] $out = new double[$cs.length];
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  double[] $w = $cs[$c];
         |  int $n = java.lang.Math.min($x.length, $w.length);
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) { $s += $x[$j] * $w[$j]; }
         |  $out[$c] = $x2 - 2.0 * $s + $ns[$c];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  // case-class equality over Array fields is reference equality,
  // which would make semanticEquals/canonicalization miss two
  // structurally identical nodes (and with it subexpression
  // elimination if a caller builds the same node twice) — compare
  // the weight matrix by content instead
  override def equals(o: Any): Boolean = o match {
    case that: PqDistances =>
      child == that.child &&
        java.util.Arrays.deepEquals(cents.asInstanceOf[Array[AnyRef]],
          that.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(norms, that.norms)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(norms)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of an `array<double>` column against every row
  * of a PLAN-CONSTANT centroid matrix, as one fused codegen node —
  * the [[PqDistances]] treatment for the cosine-assignment family
  * (SemDeDup prune, cluster quality, IVF occupancy, diverse
  * sampling, semantic decontamination, k-means assignment): the
  * `transform()`-HOF-over-literal-centroids spelling re-evaluated
  * `norm(emb)` and the dot per element interpreted, and every
  * loop-per-centroid alternative hits the many-loops generated-code
  * cliff [[PqDistances]] documents.
  *
  * Bit-exactness: |x|² accumulates ascending from 0.0 (DotProduct's
  * fold), `sqrt` once, and element k is `dot(x, c_k) / (√x2 ·
  * cNrm_k)` — the identical op sequence the HOF spelling ran (its
  * per-element `norm(emb)` recomputed the same value), so
  * sims/argmax/oracle hashes are unchanged.
  */
case class CosineToConstants(child: Expression, cents: Array[Array[Double]],
                             cNrms: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    var x2 = 0.0
    var i = 0
    while (i < x.length) { x2 += x(i) * x(i); i += 1 }
    val nx = math.sqrt(x2)
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val w = cents(c)
      val n = math.min(x.length, w.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += x(j) * w(j); j += 1 }
      out(c) = s / (nx * cNrms(c))
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("cents", cents, "double[][]")
      val ns = ctx.addReferenceObj("cNrms", cNrms, "double[]")
      val x = ctx.freshName("x")
      val x2 = ctx.freshName("x2")
      val nx = ctx.freshName("nx")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double $x2 = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $x2 += $x[$i] * $x[$i]; }
         |double $nx = java.lang.Math.sqrt($x2);
         |double[] $out = new double[$cs.length];
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  double[] $w = $cs[$c];
         |  int $n = java.lang.Math.min($x.length, $w.length);
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) { $s += $x[$j] * $w[$j]; }
         |  $out[$c] = $s / ($nx * $ns[$c]);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  // content-based equality over the Array fields (see [[PqDistances]])
  override def equals(o: Any): Boolean = o match {
    case that: CosineToConstants =>
      child == that.child &&
        java.util.Arrays.deepEquals(cents.asInstanceOf[Array[AnyRef]],
          that.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cNrms, that.cNrms)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(cNrms)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer squared-L2 distance of an `array<long>` column
  * against every row of a plan-constant long matrix, fused like
  * [[CosineToConstants]] (the q126 topic-clustering assignment: the
  * zip_with + aggregate HOF pair per centroid is interpreted AND
  * loop-shaped). Ascending accumulate from 0, exact integer adds —
  * identical values to the HOF spelling at any order, but the order
  * matches anyway. */
case class LongSqDistances(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Long](cents.length)
    var c = 0
    while (c < cents.length) {
      val w = cents(c)
      val n = math.min(x.length, w.length)
      var s = 0L
      var j = 0
      while (j < n) { val d = x(j) - w(j); s += d * d; j += 1 }
      out(c) = s
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("cents", cents, "long[][]")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $out = new long[$cs.length];
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  long[] $w = $cs[$c];
         |  int $n = java.lang.Math.min($x.length, $w.length);
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $d = $x[$j] - $w[$j];
         |    $s += $d * $d;
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  // content-based equality over the Array field (see [[PqDistances]])
  override def equals(o: Any): Boolean = o match {
    case that: LongSqDistances =>
      child == that.child &&
        java.util.Arrays.deepEquals(cents.asInstanceOf[Array[AnyRef]],
          that.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED DISTINCT string arrays via a
  * single merge walk — O(|a|+|b|) generated code per pair instead of
  * array_intersect + array_union building two intermediate arrays.
  * |A∩B| from the walk, |A∪B| = |A|+|B|-|A∩B|; the resulting double
  * equals size(intersect)/size(union) exactly (same integer division
  * operands).
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val u = ctx.freshName("u")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) $i++; else $j++;
         |}
         |int $u = $n + $m - $inter;
         |${ev.value} = $u == 0 ? 0.0 : (double) $inter / $u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| of two SORTED DISTINCT `array<long>` columns via a single
  * merge walk — the integer core the containment ops build their
  * rational similarity from (containment = inter / min(|A|, |B|)
  * stays an exact int/int division). O(|a|+|b|) generated code per
  * pair; no intermediate array materializes.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $n && $j < $m) {
         |  long $u = $a.getLong($i); long $v = $b.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) $i++; else $j++;
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-row 32-bit SimHash over an `array<long>` of token hashes: bit
  * j of the result is 1 iff the multiset's ±1 vote on token-hash bit j
  * is positive — the q27 corpus aggregate folded into one generated
  * loop per row (one pass over the tokens updating 32 counters), for
  * the STREAMING near-dup path where each document is a single row
  * and an exploded hash aggregate isn't available. Vote semantics are
  * identical to `Dedup.simhash` (order-free multiset sum).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val sim = ctx.freshName("sim")
      s"""
         |int $n = $a.numElements();
         |long[] $votes = new long[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    $votes[$j] += ((($h >> $j) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sim = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($votes[$j] > 0) $sim |= (1L << $j);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered pairs `struct(a, b)` with a before b from a SORTED
  * array of bucket members — the in-bucket candidate explosion shared
  * by the MinHash/SimHash/Jaccard dedup ops, as one generated nested
  * loop per bucket row. Replaces a nested `transform(..., slice(...))`
  * HOF pipeline: higher-order lambdas are interpreted (~10-20µs per
  * element eval) and `slice` allocates a sub-array per element, so for
  * a bucket of n members the HOF form pays n interpreted allocations
  * where this pays one flat array write. Input order is preserved, so
  * a sorted input yields each pair exactly once with a < b. Elements
  * may be any type (the dedup ops use bare long ids and
  * struct(doc_id, simhash) members); struct and string elements are
  * copied out of the backing buffer before being re-packed (views
  * into reused unsafe buffers would silently corrupt).
  *
  * A bucket of n members explodes to n·(n−1)/2 pairs — callers cap
  * bucket size (`DefaultMaxBucket`), and this expression refuses
  * (rather than overflows 32-bit arithmetic into a negative array
  * size) if an uncapped call site ever feeds it a pathological bucket.
  */
case class SortedArrayPairs(child: Expression) extends UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType, nullable = false),
      StructField("b", elemType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val et = elemType
    val elems = new Array[Any](n)
    var e = 0
    while (e < n) {
      elems(e) = xs.get(e, et) match {
        case r: InternalRow => r.copy()
        case s: UTF8String => s.clone()
        case o => o
      }
      e += 1
    }
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > SortedArrayPairs.MaxPairs)
      throw new IllegalArgumentException(
        s"sorted_array_pairs: bucket of $n members explodes to $nPairs " +
        "pairs — cap the bucket upstream")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val elems = ctx.freshName("elems")
      val rowCls = classOf[GenericInternalRow].getName
      val arrCls = classOf[GenericArrayData].getName
      val et = elemType
      val raw = CodeGenerator.getValue(v, et, i)
      // box primitives explicitly (Janino autoboxing is unreliable) and
      // copy struct/string views out of the shared backing buffer
      val boxed = et match {
        case _: StructType => s"$raw.copy()"
        case org.apache.spark.sql.types.StringType => s"$raw.clone()"
        case _ if CodeGenerator.isPrimitiveType(et) =>
          s"${CodeGenerator.boxedType(et)}.valueOf($raw)"
        case _ => raw
      }
      val np = ctx.freshName("nPairs")
      s"""
         |int $n = $v.numElements();
         |Object[] $elems = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $elems[$i] = $boxed;
         |}
         |long $np = (long) $n * ($n - 1) / 2;
         |if ($np > ${SortedArrayPairs.MaxPairs}L) {
         |  throw new IllegalArgumentException(
         |    "sorted_array_pairs: bucket of " + $n + " members explodes to "
         |    + $np + " pairs - cap the bucket upstream");
         |}
         |Object[] $out = new Object[(int) $np];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $out[$k++] = new $rowCls(new Object[]{$elems[$i], $elems[$j]});
         |  }
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedArrayPairs {
  /** Hard ceiling on the per-bucket pair explosion (~128M pairs ≈ a
    * multi-GB row): anything near this is an uncapped-bucket bug, and
    * int arithmetic would overflow at n ≈ 46341 anyway. */
  val MaxPairs: Long = 1L << 27
}

/** Highest multiplicity of any value in an `array<string>` — the
  * per-row mode count, used by the repetition-quality signals to find
  * the dominant n-gram of each document without exploding the corpus
  * into a (doc, gram) aggregation. One generated call per row: copy
  * the element references, sort (binary UTF8 order — any total order
  * works for run-counting), and take the longest equal-neighbor run.
  * Exact string semantics, so the oracle counts the same multiset.
  * Null elements are ignored; empty/all-null arrays yield 0.
  */
case class MaxStringMultiplicity(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val arr = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) arr.add(xs.getUTF8String(i))
      i += 1
    }
    java.util.Collections.sort(arr)
    var best = 0L; var run = 0L; var j = 0
    while (j < arr.size()) {
      if (j > 0 && arr.get(j).equals(arr.get(j - 1))) run += 1 else run = 1
      if (run > best) best = run
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val arr = ctx.freshName("arr")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val run = ctx.freshName("run")
      val m = ctx.freshName("m")
      val u8 = classOf[UTF8String].getName
      s"""
         |int $n = $v.numElements();
         |java.util.ArrayList<$u8> $arr = new java.util.ArrayList<$u8>($n);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) $arr.add($v.getUTF8String($i));
         |}
         |java.util.Collections.sort($arr);
         |long $best = 0L; long $run = 0L;
         |int $m = $arr.size();
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($j > 0 && $arr.get($j).equals($arr.get($j - 1))) $run += 1L;
         |  else $run = 1L;
         |  if ($run > $best) $best = $run;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row count of gram strings whose 60-bit md5 hash
  * ([[Portable.hash60]]/[[Portable.h60Scala]], bit-identical) is a
  * member of a SORTED constant hash set — the decontamination
  * membership probe fused into one generated call per row: no gram
  * explode, no join probe, no per-doc re-aggregation
  * (TextOps.contamination's gated fast path; the same probe the
  * streaming gate runs per document). The set rides the expression
  * as a constant reference — benchmark-gram-sized by the bounded
  * eval-set argument, never corpus-sized. The digest folds straight
  * from the UTF-8 bytes to the 15-hex-char value (big-endian first
  * 8 bytes >>> 4) without the hex-string round trip.
  */
case class GramSetSharedCount(child: Expression, set: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    GramSetSharedCount.count(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // the md5 loop stays in one static helper (JIT-inlined, one
      // call per ROW); only the set reference is generated, so the
      // node keeps the enclosing whole-stage codegen span intact
      val ref = ctx.addReferenceObj("gramSet", set, "long[]")
      s"${ev.value} = graft.functions.GramSetSharedCount.count($v, $ref);"
    })

  // arrays compare by reference by default, which would make
  // semanticEquals/canonicalization (and subexpression elimination)
  // miss two structurally identical nodes — compare contents
  override def equals(o: Any): Boolean = o match {
    case that: GramSetSharedCount =>
      child == that.child && java.util.Arrays.equals(set, that.set)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(set)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramSetSharedCount {
  private val mdPool =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** h60 membership count; called from both evaluation paths. */
  def count(arr: ArrayData, set: Array[Long]): Long = {
    val md = mdPool.get()
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // parseLong(hex(d).take(15), 16) == big-endian u64 >>> 4
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        if (java.util.Arrays.binarySearch(set, h >>> 4) >= 0) c += 1
      }
      i += 1
    }
    c
  }
}

/** First-matching-band index AND total Hamming distance of two
  * interleaved per-frame dHash signatures ([lo₀, hi₀, lo₁, hi₁, …],
  * array<long>) in ONE fused pass, packed as
  * `firstBand << 32 | hamming` (band j = byte j%8 of frame j/8's
  * 64-bit hash; `frames·8 << 32 | hamming` when no band matches, so
  * the packed value never collides with a real band). Replaces a
  * `filter(sequence(0, nf·8−1), j -> …)` HOF whose lambda re-read
  * the arrays per band iteration and allocated the sequence + result
  * arrays per CANDIDATE PAIR — at 2.2 M capped-bucket candidates
  * (sf0.1 video fixture) the HOF spelling cost ~8 s of the q137 pass;
  * this node is one allocation-free loop per pair. Integer math —
  * bit-exact against the plain-Scala mirror on both evaluation paths
  * (PropertySpec). */
case class SigBandScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SigBandScore.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      // one static helper call per row keeps the whole-stage span
      // intact (the GramSetSharedCount discipline)
      s"${ev.value} = graft.functions.SigBandScore.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigBandScore {
  /** Shared by both evaluation paths; ascending-band first match. */
  def score(xa: ArrayData, xb: ArrayData): Long = {
    val n = math.min(xa.numElements(), xb.numElements()) & ~1
    var ham = 0L
    var first = -1L
    var i = 0
    while (i < n) {
      val x = xa.getLong(i) ^ xb.getLong(i)
      ham += java.lang.Long.bitCount(x)
      if (first < 0) {
        // i even -> bytes 0-3 of this frame's bands, odd -> bytes 4-7
        var k = 0
        while (k < 4 && first < 0) {
          if (((x >>> (k * 8)) & 255L) == 0L)
            first = (i / 2) * 8 + (i % 2) * 4 + k
          k += 1
        }
      }
      i += 1
    }
    // element order IS ascending global band order (lo half of frame
    // f = bands f·8..f·8+3, hi half = f·8+4..f·8+7), so the first
    // zero byte found is the lowest matching band
    if (first < 0) first = (n / 2) * 8
    (first << 32) | ham
  }

  /** Same walk over plain long arrays — the frozen video-gate index
    * probes signatures off-plan (no InternalRow exists there).
    * Property-pinned bit-equal to the ArrayData overload. */
  def score(xa: Array[Long], xb: Array[Long]): Long = {
    val n = math.min(xa.length, xb.length) & ~1
    var ham = 0L
    var first = -1L
    var i = 0
    while (i < n) {
      val x = xa(i) ^ xb(i)
      ham += java.lang.Long.bitCount(x)
      if (first < 0) {
        var k = 0
        while (k < 4 && first < 0) {
          if (((x >>> (k * 8)) & 255L) == 0L)
            first = (i / 2) * 8 + (i % 2) * 4 + k
          k += 1
        }
      }
      i += 1
    }
    if (first < 0) first = (n / 2) * 8
    (first << 32) | ham
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Dot product of two array<double> columns (codegen'd). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All per-centroid squared-L2 distances of one PQ subspace in one
    * fused codegen node (see [[PqDistances]]). */
  def pqDistances(sv: Column, cents: Seq[Seq[Double]],
                  norms: Seq[Double]): Column =
    ColumnBridge.column(
      PqDistances(ColumnBridge.expression(sv),
        cents.map(_.toArray).toArray, norms.toArray))

  /** Cosine similarity against every row of a constant centroid
    * matrix in one fused codegen node (see [[CosineToConstants]]). */
  def cosineToConstants(v: Column, cents: Seq[Seq[Double]],
                        cNrms: Seq[Double]): Column =
    ColumnBridge.column(
      CosineToConstants(ColumnBridge.expression(v),
        cents.map(_.toArray).toArray, cNrms.toArray))

  /** Exact integer squared-L2 distances against every row of a
    * constant long matrix (see [[LongSqDistances]]). */
  def longSqDistances(v: Column, cents: Seq[Seq[Long]]): Column =
    ColumnBridge.column(
      LongSqDistances(ColumnBridge.expression(v),
        cents.map(_.toArray).toArray))


  /** Jaccard similarity of two sorted distinct string arrays. */
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedArrayJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** |A ∩ B| of two sorted distinct array<long> columns (codegen'd). */
  def sortedLongIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-row 32-bit simhash of an array<long> of token hashes. */
  def simHash32(hashes: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(hashes)))

  /** All a<b pairs from a sorted array<long> of bucket member ids. */
  def sortedArrayPairs(ids: Column): Column =
    ColumnBridge.column(SortedArrayPairs(ColumnBridge.expression(ids)))

  /** Highest multiplicity of any value in an array<string>. */
  def maxStringMultiplicity(xs: Column): Column =
    ColumnBridge.column(MaxStringMultiplicity(ColumnBridge.expression(xs)))

  /** Count of gram strings whose h60 is in a sorted constant set. */
  def gramSetSharedCount(grams: Column, set: Array[Long]): Column =
    ColumnBridge.column(
      GramSetSharedCount(ColumnBridge.expression(grams), set))

  /** firstMatchingBand << 32 | totalHamming of two interleaved
    * per-frame dHash signatures (see [[SigBandScore]]). */
  def sigBandScore(a: Column, b: Column): Column =
    ColumnBridge.column(
      SigBandScore(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
