package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints one line of physical-plan statistics per driver query:
  * shuffle exchange count, broadcast count, whether the parquet scan
  * carries pushed filters, and whole-stage-codegen span count. Feeds
  * SCALE.md's per-query table.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    // trailing query names narrow the audit (default: all queries)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.isEmpty || only(name)) {
      val df = fn(spark, sf)
      df.collect() // finalize AQE so counts reflect the executed plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
      val bc = "Broadcast(Exchange|HashJoin|NestedLoopJoin)".r
        .findAllIn(plan).size
      val pushed = plan.contains("PushedFilters: [") &&
        !plan.linesIterator.filter(_.contains("PushedFilters"))
          .forall(_.contains("PushedFilters: []"))
      val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).matchData
        .map(_.matched).toSet.size
      println(s"$name exchanges=$ex broadcasts=$bc pushedFilters=$pushed " +
        s"codegenStages=$wsc")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
