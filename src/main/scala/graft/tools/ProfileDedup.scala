package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._
import graft.operators.Dedup

/** Dev scratch: stage-level timings for the dedup bench hot spots. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    time("docs scan")(docs.count())
    time("docs scan warm")(docs.count())
    val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    time("tokenize+explode")(tok.count())
    time("token hash32 (md5)")(tok.select(hash32(col("w")).as("h"))
      .filter(col("h") > 0).count())
    val sh = docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), 3)).as("s"))
    time("shingles explode")(sh.count())
    time("shingle hash32")(sh.select(hash32(col("s")).as("h"))
      .filter(col("h") > 0).count())

    // q29 stage breakdown
    val inv = docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), 3)).as("s"))
      .select(col("doc_id"), hash32(col("s")).as("sh")).distinct()
    time("q29a inv distinct")(inv.count())
    val cands = inv.groupBy(col("sh"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 100))
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x, y))))")).as("p"))
      .select(col("p.x").as("a"), col("p.y").as("b"))
    time("q29b pairs exploded")(cands.count())
    time("q29c pairs distinct")(cands.distinct().count())
    val wsets = docs.select(col("doc_id"),
      array_sort(array_distinct(words(col("text")))).as("wset"))
    time("q29d wsets alone")(wsets.count())
    val jac = cands.distinct()
      .join(broadcast(wsets.toDF("a", "a_w")), "a")
      .join(broadcast(wsets.toDF("b", "b_w")), "b")
      .select(graft.functions.VectorExpressions
        .sortedJaccard(col("a_w"), col("b_w")).as("j"))
      .filter(col("j") >= 0.8)
    time("q29e jaccard+join")(jac.count())

    time("q27 simhash")(Dedup.simhash(docs).count())
    time("q27 simhash warm")(Dedup.simhash(docs).count())
    time("q28 simhash pairs")(Dedup.simhashPairs(docs).count())
    time("q26 minhash pairs")(Dedup.minhashPairs(docs).count())
    time("q29 jaccard pairs")(Dedup.ngramJaccardPairs(docs, 0.8).count())
    time("q25 exact")(Dedup.exactGroups(docs).count())
    spark.stop()
  }
}
