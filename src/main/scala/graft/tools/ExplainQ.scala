package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("ReusedExchange=" + "ReusedExchange".r.findAllIn(p).size)
    println("FileScanCount=" + "FileScan".r.findAllIn(p).size)
    if (args.contains("--full")) println(p)
    spark.stop()
  }
}
