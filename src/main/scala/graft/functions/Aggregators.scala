package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (the UDAF surface). Accumulation is exact
  * integer arithmetic so results are order-independent — the property
  * that makes a distributed aggregate reproducible and oracle-checkable
  * (double summation would depend on partition merge order). */
object Aggregators {

  /** Weighted mean of a 2-decimal price weighted by an integral weight,
    * accumulated as (cents × weight, weight) in longs. */
  final case class WSum(cents: Long, weight: Long)

  val weightedMean: Aggregator[(Double, Double), WSum, Double] =
    new Aggregator[(Double, Double), WSum, Double] {
      override def zero: WSum = WSum(0L, 0L)
      override def reduce(b: WSum, in: (Double, Double)): WSum = {
        val w = math.round(in._2) // nearest integral weight (truncation would drop 0<w<1 rows)
        WSum(b.cents + math.round(in._1 * 100.0) * w, b.weight + w)
      }
      override def merge(a: WSum, b: WSum): WSum =
        WSum(a.cents + b.cents, a.weight + b.weight)
      override def finish(r: WSum): Double =
        if (r.weight == 0L) 0.0 else (r.cents.toDouble / 100.0) / r.weight.toDouble
      override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
