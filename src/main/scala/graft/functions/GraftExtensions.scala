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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(e.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def info(name: String) = new ExpressionInfo("graft", name)

  // every native codegen expression the engine defines, by SQL name
  private[functions] val builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_jaccard" -> (es => SortedArrayJaccard(es(0), es(1))),
    "graft_simhash32" -> (es => SimHash32(es(0))),
    "graft_sorted_pairs" -> (es => SortedArrayPairs(es(0))),
    "graft_max_multiplicity" -> (es => MaxStringMultiplicity(es(0))),
    "graft_sorted_intersect" -> (es => SortedLongIntersectCount(es(0), es(1))))

  private[functions] val descriptors = builders.map { case (name, b) =>
    (FunctionIdentifier(name), info(name), b)
  }

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
