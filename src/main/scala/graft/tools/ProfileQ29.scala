package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._
import graft.operators.Dedup

/** Dev scratch: is q29 dominated by candidate generation or by the
  * double word-set build on the lookup joins?
  */
object ProfileQ29 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(name: String, warm: Int = 1)(f: => DataFrame): Unit = {
      (1 to warm).foreach(_ => noop(f))
      val t0 = System.nanoTime()
      noop(f)
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // candidate generation alone (inv index + bucket agg + pair explode)
    val inv = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), 3)).as("shingle"))
      .select(col("doc_id"), hash60(col("shingle")).as("sh"))
    val cands = inv
      .groupBy(col("sh"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 100))
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
    val toks = docs.select(col("doc_id"), words(col("text")).as("w"))
    time("tokens split only")(toks.select(col("doc_id"), size(col("w")).as("n")))
    val shing = toks.select(col("doc_id"), explode(shingles(col("w"), 3)).as("shingle"))
    time("shingles exploded")(shing)
    time("shingles + hash60")(shing.select(col("doc_id"), hash60(col("shingle")).as("sh")))
    time("inv + bucket agg")(inv.groupBy(col("sh"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 100)))
    time("candidates alone")(cands)

    val wsets = docs
      .select(col("doc_id"),
        array_sort(array_distinct(words(col("text")))).as("wset"))
    time("wsets alone")(wsets.select(col("doc_id"), size(col("wset")).as("n")))

    time("q29 full (current)")(Dedup.ngramJaccardPairs(docs, 0.8))

    val preD = inv.groupBy(col("sh"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 100))
      .select(explode(graft.functions.VectorExpressions
        .sortedArrayPairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    println(s"PRE_DISTINCT=${preD.count()} UNIQUE=${preD.distinct().count()} " +
      s"SURVIVORS=${Dedup.ngramJaccardPairs(docs, 0.8).count()}")

    val cached = wsets.persist()
    cached.count()
    def look(id: String, w: String) = broadcast(cached.toDF(id, w))
    time("q29 wsets persisted") {
      cands.join(look("a", "a_w"), "a").join(look("b", "b_w"), "b")
        .select(col("a"), col("b"),
          graft.functions.VectorExpressions
            .sortedJaccard(col("a_w"), col("b_w")).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
    }
    spark.stop()
  }
}
