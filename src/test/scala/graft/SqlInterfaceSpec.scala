package graft

import graft.core.Tables
import graft.operators.EventOps
import graft.sql.SqlInterface

/** The SQL front-end must agree with the DataFrame operators — same
  * engine, two surfaces. */
class SqlInterfaceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("SQL windowed count-distinct equals the DataFrame formulation") {
    SqlInterface.registerTables(spark, sf)
    val sql = SqlInterface.windowedCountDistinct(spark)
      .as[(Long, Long)].collect().toSet
    val df = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.window($"ts", "10 minutes"))
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
      .select(org.apache.spark.sql.functions.unix_timestamp($"window.start"), $"n")
      .as[(Long, Long)].collect().toSet
    assert(sql == df && sql.nonEmpty)
  }

  test("SQL session windows equal the session operator's groups") {
    SqlInterface.registerTables(spark, sf)
    val sql = SqlInterface.sessionCounts(spark)
      .as[(Long, Long, Long)].collect().toSet
    val df = EventOps.sessionStats(Tables.events(spark, sf))
      .select($"user_id", $"sess_start", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(sql == df && sql.nonEmpty)
  }

  test("custom codegen expressions are callable from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    val jac = spark.sql(
      "SELECT graft_jaccard(array('a','b','c'), array('b','c','d'))")
      .collect().head.getDouble(0)
    assert(jac == 0.5)
    // simhash of one token hash h: every bit of h votes +1 -> simhash = h
    val sh = spark.sql("SELECT graft_simhash32(array(5L))")
      .collect().head.getLong(0)
    assert(sh == 5L)
    val pairs = spark.sql(
      "SELECT graft_sorted_pairs(array(1L, 2L, 3L))")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val mult = spark.sql(
      "SELECT graft_max_multiplicity(array('a', 'b', 'a', 'a'))")
      .collect().head.getLong(0)
    assert(mult == 3L)
    val inter = spark.sql(
      "SELECT graft_sorted_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L))")
      .collect().head.getLong(0)
    assert(inter == 2L)
  }

  test("relational queries run through plain SQL text") {
    SqlInterface.registerTables(spark, sf)
    val rows = spark.sql("""
      SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > 100000 GROUP BY l_returnflag""").collect()
    assert(rows.nonEmpty)
  }
}
