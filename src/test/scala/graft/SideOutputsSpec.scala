package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SideOutputs

/** T4/K9 — side outputs (`slideoutput/SideOutput.java:49-103`):
  * tokens >5 chars split to a rejected channel, the rest are counted.
  */
class SideOutputsSpec extends SparkSpec {
  import spark.implicits._

  // the first two Hamlet lines of the reference fixture
  // (`wordcount/util/WordCountData.java:5-41`)
  private val lines = Seq(
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer")

  test("batch split: rejected channel gets >5-char tokens, main is counted") {
    val tagged = SideOutputs.taggedTokens(lines.toDF("value"))
    val rejected = SideOutputs.rejectedWords(
      SideOutputs.channel(tagged, "rejected")).as[String].collect().sorted
    assert(rejected.toSeq == Seq("rejected : nobler", "rejected : question",
      "rejected : suffer", "rejected : whether"))
    val counts = SideOutputs.wordCounts(SideOutputs.channel(tagged, "main"))
      .as[(String, Long)].collect().toMap
    assert(counts("to") == 3 && counts("be") == 2 && counts("the") == 2)
    assert(!counts.contains("question") && !counts.contains("whether"))
    // every token lands in exactly one channel
    assert(counts.values.sum + rejected.length ==
      lines.map(_.toLowerCase.split("\\W+").count(_.nonEmpty)).sum)
  }

  test("streaming two-sink split writes both channels per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mainRows = ArrayBuffer.empty[(String, Long)]
    val rejRows = ArrayBuffer.empty[String]

    val in = MemoryStream[String]
    val q = SideOutputs.splitStream(
      SideOutputs.taggedTokens(in.toDF()),
      Map(
        "main" -> ((df, _) => mainRows.synchronized {
          mainRows ++= df.as[(String)].collect().map(_ -> 1L)
        }),
        "rejected" -> ((df, _) => rejRows.synchronized {
          rejRows ++= SideOutputs.rejectedWords(df).as[String].collect()
        })))
    try {
      in.addData(lines.head)
      q.processAllAvailable()
      in.addData(lines(1))
      q.processAllAvailable()
    } finally q.stop()

    assert(rejRows.sorted.toSeq == Seq("rejected : nobler",
      "rejected : question", "rejected : suffer", "rejected : whether"))
    val counts = mainRows.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts("to") == 3 && counts("be") == 2 && counts("the") == 2)
  }
}
