package graft.audio

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A6 as a typed one-pass Aggregator (SURVEY.md §7.3): sum-of-squares +
  * count buffer, partial-aggregates map-side (merge is associative), so
  * the full-corpus RMS is one combine-enabled shuffle of 16-byte buffers
  * — not samples.
  */
object RmsAggregator extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + x * x, b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) 0.0 else math.sqrt(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `df.agg(RmsAggregator.rms(col("x")))`. */
  def rms(c: Column): Column = udaf(RmsAggregator).apply(c)
}
