package graft

import graft.core.{Bucketing, Tables}

/** Bucketed co-located join: both sides pre-bucketed on the join key
  * ⇒ the join runs with ZERO exchanges (the 100 TB fact-table
  * pattern — shuffle paid once at write time).
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key needs no shuffle exchange") {
    // force sort-merge: the test tables are small enough to broadcast,
    // which would hide what bucketing buys at fact-table scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (t <- Seq("li_b", "ord_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        // a crashed run can leave the managed location behind while the
        // in-memory catalog forgets the table
        val dir = new java.io.File(s"spark-warehouse/$t")
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(dir)
        }
      }
      Bucketing.writeBucketed(Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 8)
      Bucketing.writeBucketed(Tables.orders(spark, sf)
        .select("o_orderkey", "o_totalprice"), "ord_b", "o_orderkey", 8)

      val joined = Bucketing.table(spark, "li_b")
        .join(Bucketing.table(spark, "ord_b"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      joined.collect() // finalize adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)

      // the same join on the raw (unbucketed) parquet DOES shuffle
      val raw = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
