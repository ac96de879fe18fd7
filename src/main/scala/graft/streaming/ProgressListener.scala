package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** ST3: progress/ETA tracking (reference logs every 10 chapters with a
  * running-average ETA, hebrew_alignment_tool.py:493-495,
  * scripts/hebrew_alignment_optimized.py:44-74). In Spark the signal is
  * the streaming progress event stream; this listener accumulates
  * per-batch row counts and exposes the running rate the reference's ETA
  * formula needs (remaining ÷ running mean rate).
  */
class ProgressListener extends StreamingQueryListener {

  case class BatchProgress(batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double)

  private val batches = new ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    batches.add(BatchProgress(p.batchId, p.numInputRows,
      p.processedRowsPerSecond))
  }

  def totalRows: Long = batches.asScala.map(_.numInputRows).sum

  /** Running mean rows/s over observed batches (the ETA denominator). */
  def meanRate: Double = {
    val rates = batches.asScala.map(_.processedRowsPerSecond)
      .filter(r => !r.isNaN && !r.isInfinite)
    if (rates.isEmpty) 0.0 else rates.sum / rates.size
  }

  def etaSeconds(remainingRows: Long): Double = {
    val r = meanRate
    if (r <= 0) Double.PositiveInfinity else remainingRows / r
  }
}
