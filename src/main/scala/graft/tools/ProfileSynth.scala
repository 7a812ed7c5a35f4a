package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Round-13 scratch: isolates the media FIXTURE-SYNTHESIS cost (raster
  * fill + ImageIO encode) from the decode+hash cost, per modality —
  * the measurement behind the custom-encoder optimization decision.
  */
object ProfileSynth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    println("docs=" + docs.count())

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => DataFrame): Unit = {
      noop(f)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-34s ${ts.min}%7.2f s")
    }

    time("nearDupImageTable (synth+encode)")(
      Multimodal.nearDupImageTable(docs).toDF())
    // raster fill only — same pixel math, no ImageIO.write
    time("nearDupImage raster only")(
      docs.select(col("doc_id")).as[Long].mapPartitions { it =>
        it.map { id =>
          val grp = id / 4
          val w = (grp % 7 + 16).toInt
          val h = (grp % 5 + 12).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val (qa, qb) = ((grp % 5 + 1).toInt, (grp % 3 + 1).toInt)
          val member = (id % 4).toInt
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = math.floorMod(x * x * qa + y * 3 + grp * 11 + member, 256).toInt
              val g = math.floorMod(x * 5 + y * y * qb + grp * 23 + member, 256).toInt
              val b = math.floorMod(x * 13 + y * 17 + grp * 29 + member, 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          (id, img.getRGB(0, 0))
        }
      }.toDF("id", "px"))
    time("q133 imageDHash (synth+decode)")(
      Multimodal.imageDHash(Multimodal.nearDupImageTable(docs)))
    time("cropImageTable (synth+encode)")(
      Multimodal.cropImageTable(docs).toDF())
    time("imageTable q40 (synth+encode)")(
      Multimodal.imageTable(docs).toDF())
    time("nearDupAudioTable synth")(
      Multimodal.nearDupAudioTable(docs).toDF())
    time("nearDupVideoTable synth")(
      Multimodal.nearDupVideoTable(docs).toDF())
    spark.stop()
  }
}
