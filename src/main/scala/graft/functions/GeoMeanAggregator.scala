package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.2 "Aggregator[IN,BUF,OUT] for UDAF
  * parity"): geometric mean, as a merge-associative two-field buffer —
  * (Σ ln x, n) — so partial aggregation (map-side combine) applies exactly
  * as for built-ins. Generic in the input row type via an extractor, the
  * usual pattern for typed aggregation over KeyValueGroupedDataset rows.
  * The reference's only aggregation device is its reducer fold
  * (MapReduce.h:192-208); this is the typed Spark generalization.
  */
class GeoMean[IN](f: IN => Double) extends Aggregator[IN, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: IN): (Double, Long) =
    (b._1 + math.log(f(x)), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object GeoMeanAggregator extends GeoMean[Double](identity)
