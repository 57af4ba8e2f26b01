package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Demo typed UDAF surface (SURVEY.md §2.3 UDF/UDAF row): geometric mean via
  * a log-sum buffer — merge-associative, so partial aggregation (map-side
  * combine) applies like any built-in aggregate.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a <= 0.0) b else (b._1 + math.log(a), b._2 + 1)
  override def merge(l: (Double, Long), r: (Double, Long)): (Double, Long) =
    (l._1 + r._1, l._2 + r._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
