package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Dot product of two array<double> columns (codegen'd). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Jaccard similarity of two sorted distinct string arrays. */
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedArrayJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-row 32-bit simhash of an array<long> of token hashes. */
  def simHash32(hashes: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(hashes)))
}
