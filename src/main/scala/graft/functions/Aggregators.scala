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

  /** One scored row in a top-k buffer. */
  final case class Scored(score: Double, id: Long)
  /** Bounded top-k buffer, kept sorted (score desc, id asc), size ≤ k. */
  final case class TopBuf(items: Seq[Scored])

  /** Exact per-key top-k as a typed Aggregator. Each task keeps a bounded
    * k-buffer (map-side partial combine!) and merges are k-bounded — so
    * unlike the `row_number() OVER (...) <= k` formulation there is no
    * full sort and no whole-partition window buffer: per-key state is
    * O(k) everywhere, the shape that survives a billion-row hot key. */
  def topK(k: Int): Aggregator[(Double, Long), TopBuf, TopBuf] = {
    require(k >= 1, "k must be positive")
    val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))
    new Aggregator[(Double, Long), TopBuf, TopBuf] {
      override def zero: TopBuf = TopBuf(Vector.empty)
      override def reduce(b: TopBuf, in: (Double, Long)): TopBuf = {
        val s = Scored(in._1, in._2)
        if (b.items.lengthCompare(k) >= 0 && ord.lteq(b.items.last, s)) b
        else TopBuf((b.items :+ s).sorted(ord).take(k))
      }
      override def merge(x: TopBuf, y: TopBuf): TopBuf =
        TopBuf((x.items ++ y.items).sorted(ord).take(k))
      override def finish(r: TopBuf): TopBuf = r
      override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
      override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    }
  }
}
