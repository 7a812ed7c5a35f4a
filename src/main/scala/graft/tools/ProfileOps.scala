package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Dev scratch: stage-level timings for the remaining bench hot spots. */
object ProfileOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    time("docs scan")(docs.count())
    time("docs scan warm")(docs.count())
    // shingle construction alternatives
    val slice_based = docs.select(col("doc_id"),
      explode(shingles(words(col("text")), 3)).as("shingle"))
    time("shingles slice HOF")(slice_based.count())
    val w = words(col("text"))
    val fast = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 3) // sequence(0, neg) would descend
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("shingle"))
    time("shingles element_at HOF")(fast.count())
    val inv = docs.select(col("doc_id"),
      explode(shingles(words(col("text")), 3)).as("shingle")).distinct()
    time("inv (shingle explode+dist)")(inv.count())
    val invh = docs.select(col("doc_id"),
        explode(shingles(words(col("text")), 3)).as("shingle"))
      .select(col("doc_id"), hash32(col("shingle")).as("sh")).distinct()
    time("inv hashed")(invh.count())
    val capped = inv.join(
      inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100), "shingle")
    time("capped")(capped.count())
    val cp = capped.persist()
    cp.count()
    val cands = cp.select(col("shingle"), col("doc_id").as("a"))
      .join(cp.select(col("shingle").as("s2"), col("doc_id").as("b")),
        col("shingle") === col("s2") && col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    time("cands (pair join+distinct)")(cands.count())
    val wsets = docs.select(col("doc_id"),
      array_distinct(words(col("text"))).as("wset")).persist()
    wsets.count()
    val joined = cands.join(wsets.toDF("a", "a_w"), "a")
      .join(wsets.toDF("b", "b_w"), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("a_w"), col("b_w"))).cast("double") /
          size(array_union(col("a_w"), col("b_w")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    time("jaccard join+filter")(joined.count())

    // bucketed co-located join: zero shuffle exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS li_drive"); spark.sql("DROP TABLE IF EXISTS ord_drive")
    graft.core.Bucketing.writeBucketed(Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity")), "li_drive", "l_orderkey", 8)
    graft.core.Bucketing.writeBucketed(Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_totalprice")), "ord_drive", "o_orderkey", 8)
    val bj = spark.table("li_drive").join(spark.table("ord_drive"),
      col("l_orderkey") === col("o_orderkey"))
    bj.collect()
    val bplan = bj.queryExecution.executedPlan.toString
    println("BUCKETED_JOIN shuffle=" + bplan.contains("Exchange hashpartitioning")
      + " smj=" + bplan.contains("SortMergeJoin") + " rows=" + bj.count())
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // q20 wordcount + q11 hot users for reference
    time("q20 wordcount")(graft.operators.TextOps.wordCount(docs).count())
    time("q11 hot users")(graft.operators.EventOps.hotUsers(
      Tables.events(spark, d), 3).count())
    time("q26 minhash pairs")(graft.operators.Dedup.minhashPairs(docs).count())
    spark.stop()
  }
}
