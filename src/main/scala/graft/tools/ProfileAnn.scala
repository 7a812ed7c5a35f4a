package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Dev scratch: stage-level timings for the ANN bench hot spots. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    time("emb scan")(emb.count())
    time("emb scan warm")(emb.count())

    val asD = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    time("cast to double")(asD.count())
    val dotSelf = asD.select(graft.functions.VectorExpressions
      .dotProduct(col("e"), col("e")).as("d"))
    time("self dot (codegen)")(dotSelf.filter(col("d") > 0).count())

    val q = asD.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val joined = asD.join(broadcast(q), col("qid") =!= col("vec_id"))
    time("bnlj 16xN")(joined.count())
    val scored = joined.select(col("qid"), col("vec_id"),
      graft.functions.VectorExpressions.dotProduct(col("qe"), col("e")).as("s"))
    time("bnlj + dot")(scored.filter(col("s") > -100).count())

    time("q30 full")(Similarity.knnBruteForce(emb, 16, 5).count())
    time("q30 full again")(Similarity.knnBruteForce(emb, 16, 5).count())
    time("q31 lsh")(Similarity.knnLsh(emb, 16, 5).count())
    time("q36 ivf")(Similarity.knnIvf(emb, 16, 5).count())
    time("q35 cosdups")(Similarity.cosineNearDupPairs(emb, 0.2).count())
    time("q38 recall")(Similarity.lshRecall(emb, 16, 5).count())
    spark.stop()
  }
}
