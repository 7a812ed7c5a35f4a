package graft.streaming

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder}

/** Async-I/O enrichment (SURVEY.md §2.5 J7,
  * `async/AsyncIOExample.java:119-149,220-276`): per-record async
  * calls with a bounded in-flight window, ordered or unordered
  * emission — the reference's `orderedWait`/`unorderedWait` on
  * `mapPartitions` + Futures. One client/executor context per
  * partition; backpressure comes from the bounded window (capacity)
  * exactly like the reference's `capacity` argument.
  *
  * Prefer a real join when the lookup side is a dataset; this is for
  * genuine per-record RPC enrichment.
  */
object AsyncEnrich extends Serializable {

  /** `ordered=true` preserves input order (head-of-line await);
    * `ordered=false` emits in completion order within the window.
    * `timeout` bounds each record's wait (reference: 10 s). */
  def enrich[T, R: Encoder](ds: Dataset[T], capacity: Int,
      ordered: Boolean, timeout: Duration = Duration.Inf)
      (f: T => Future[R]): Dataset[R] = {
    ds.mapPartitions { it =>
      if (ordered) new OrderedWindowIterator(it, capacity, timeout, f)
      else new UnorderedWindowIterator(it, capacity, timeout, f)
    }
  }

  private final class OrderedWindowIterator[T, R](in: Iterator[T],
      capacity: Int, timeout: Duration, f: T => Future[R])
      extends Iterator[R] {
    private val window = mutable.Queue.empty[Future[R]]
    private def fill(): Unit =
      while (window.size < capacity && in.hasNext) window += f(in.next())
    def hasNext: Boolean = { fill(); window.nonEmpty }
    def next(): R = { fill(); Await.result(window.dequeue(), timeout) }
  }

  private final class UnorderedWindowIterator[T, R](in: Iterator[T],
      capacity: Int, timeout: Duration, f: T => Future[R])
      extends Iterator[R] {
    import scala.concurrent.ExecutionContext.Implicits.global
    private val window = mutable.ArrayBuffer.empty[Future[R]]
    private def fill(): Unit =
      while (window.size < capacity && in.hasNext) window += f(in.next())
    def hasNext: Boolean = { fill(); window.nonEmpty }
    def next(): R = {
      fill()
      val done = Await.result(Future.firstCompletedOf(
        window.toSeq.map(w => w.map(_ => w))), timeout)
      window -= done
      Await.result(done, Duration.Zero)
    }
  }
}
