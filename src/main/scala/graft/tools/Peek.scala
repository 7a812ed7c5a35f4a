package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: confirm Spark 4.1 reads the driver-generated parquet
  * (events.parquet carries TIMESTAMP(NANOS)). */
object Peek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (t <- Seq("events", "documents", "embeddings", "lineitem", "orders")) {
      val df = spark.read.parquet(s"$d/$t.parquet")
      println(s"== $t ==")
      df.printSchema()
      df.show(2, truncate = 60)
    }
    spark.stop()
  }
}
