package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL exposure of the engine's native expressions. Two paths:
  *   - cluster config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the standard SparkSessionExtensions injection point);
  *   - runtime: `GraftExtensions.register(spark)` on an existing
  *     session (what the harness sessions use).
  * After either, SQL text can call `graft_dot(a, b)` and
  * `graft_jaccard(a, b)` — the same codegen expressions the
  * DataFrame API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotDescriptor)
    e.injectFunction(GraftExtensions.jaccardDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name)

  private val dotBuilder: Seq[Expression] => Expression =
    exprs => DotProduct(exprs(0), exprs(1))
  private val jaccardBuilder: Seq[Expression] => Expression =
    exprs => SortedArrayJaccard(exprs(0), exprs(1))

  private[functions] val dotDescriptor =
    (FunctionIdentifier("graft_dot"), info("graft_dot",
      "dot product of two array<double>"), dotBuilder)
  private[functions] val jaccardDescriptor =
    (FunctionIdentifier("graft_jaccard"), info("graft_jaccard",
      "jaccard of two sorted string arrays"), jaccardBuilder)

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", dotBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("graft_jaccard", jaccardBuilder, "scala_udf")
  }
}
