package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev scratch: decompose q20 wordcount's time (bench drift r1 0.78s
  * -> r3 3.55s on unchanged code). Hypotheses: codegen/JIT first-run
  * cost, HOF filter breaking whole-stage codegen, shuffle overhead.
  */
object ProfileQ20 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    docs.count()

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    // repeated runs of the exact q20 pipeline
    (1 to 3).foreach { i =>
      time(s"q20 full (run $i)")(noop(graft.operators.TextOps.wordCount(docs)))
    }
    // pieces
    time("scan only")(noop(docs.select(col("text"))))
    time("lower+split only")(noop(
      docs.select(split(lower(col("text")), "\\W+").as("toks"))))
    time("with HOF filter")(noop(
      docs.select(graft.operators.TextOps.tokens(col("text")).as("toks"))))
    time("explode, no agg")(noop(
      docs.select(explode(graft.operators.TextOps.tokens(col("text"))).as("w"))))
    time("explode no-HOF + agg")(noop(
      docs.select(explode(split(lower(col("text")), "\\W+")).as("w"))
        .filter(length(col("w")) > 0).groupBy(col("w")).agg(count(lit(1)))))
    (1 to 2).foreach { i =>
      time(s"q20 full again (run $i)")(noop(graft.operators.TextOps.wordCount(docs)))
    }
    spark.stop()
  }
}
