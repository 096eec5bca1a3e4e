package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom mergeable sketches as typed Aggregators — the
  * build-on-executors / merge-anywhere shape Spark's partial
  * aggregation gives every Aggregator for free. Unlike the built-in
  * sketches (q43's HLL++ / approx_percentile), the layout here is OUR
  * contract, so the estimator can be a pure Column expression over the
  * aggregated state and results are deterministic for a fixed input
  * set (fixed hash parameters; counter merges are integer sums, immune
  * to partition order).
  */
object Sketches {

  /** Count-min sketch state: `depth × width` long counters, row-major
    * (depth = `counters.length / width`). */
  final case class CMSketch(width: Int, counters: Seq[Long])

  /** Default sketch depth. SIZING RULE (Cormode–Muthukrishnan): with
    * `depth` rows of `width` counters, a point estimate never
    * undercounts and overcounts by more than `ε·N` (N = stream length)
    * with probability ≥ `1 − δ`, where
    *
    *   ε = e / width        →  width = ceil(e / ε)
    *   δ = e^(−depth)       →  depth = ceil(ln(1 / δ))
    *
    * So the defaults (depth 4, caller-chosen width) give δ ≈ 1.8%;
    * width 512 bounds overcount to ≈ 0.53% of N. Memory is
    * `depth × width × 8` bytes regardless of key cardinality — double
    * width to halve the error bound, add a row to e-fold the failure
    * probability. */
  val CMDepth = 4
  private val P = 2147483647L // 2^31 − 1
  private val A = Array(1103515245L, 214013L, 69069L, 1664525L)
  private val B = Array(12345L, 2531011L, 362437L, 1013904223L)

  /** Pairwise hash parameters for sketch row `r`: the four published
    * LCG constants for r < 4 (pinned — the q75 oracle embeds them), and
    * md5-derived constants beyond, so any depth stays deterministic and
    * engine-portable. */
  def cmHashParams(r: Int): (Long, Long) = {
    require(r >= 0, "row must be non-negative")
    if (r < 4) (A(r), B(r))
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      def word(tag: String): Long = {
        md.reset()
        val d = md.digest(s"cm_${tag}_$r".getBytes("UTF-8"))
        val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        v % (P - 1)
      }
      (word("a") + 1, word("b")) // a ∈ [1, P−1], b ∈ [0, P−2]
    }
  }

  /** 28-bit base hash = first 7 hex chars of md5(key) — computed
    * identically by the JVM kernel below and the Column [[cmEstimate]]
    * (`conv(substring(md5(k), 1, 7), 16, 10)`), which is what lets the
    * estimator stay a codegen'd expression over the aggregated state. */
  def cmBaseHash(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes("UTF-8"))
    // first 7 hex chars = bytes 0–2 plus the high nibble of byte 3
    ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
      ((d(2) & 0xFFL) << 4) | ((d(3) & 0xF0L) >> 4)
  }

  def cmIndex(h: Long, row: Int, width: Int): Int = {
    val (a, b) = cmHashParams(row)
    (((a * h + b) % P) % width).toInt
  }

  /** Count-min sketch builder over a string key column. Per-row update
    * touches `depth` counters; state is a fixed `depth × width` array
    * regardless of key cardinality — the constant-memory frequency
    * summary for heavy-hitter screens over unbounded key domains.
    * Guarantees: estimates never undercount; overcount ≤ e·N/width with
    * probability 1 − e^−depth (see the sizing rule at [[CMDepth]]). */
  def countMin(width: Int, depth: Int = CMDepth): Aggregator[String, Array[Long], CMSketch] = {
    require(width >= 1, "width must be positive")
    require(depth >= 1, "depth must be positive")
    // (a, b) per row ONCE at construction: rows ≥ 4 derive their
    // constants via MD5, and deriving inside reduce would pay a fresh
    // digest per record per extra row
    val as = new Array[Long](depth)
    val bs = new Array[Long](depth)
    var r0 = 0
    while (r0 < depth) {
      val (a, b) = cmHashParams(r0); as(r0) = a; bs(r0) = b; r0 += 1
    }
    new Aggregator[String, Array[Long], CMSketch] {
      override def zero: Array[Long] = new Array[Long](depth * width)
      override def reduce(buf: Array[Long], key: String): Array[Long] = {
        if (key != null) {
          val h = cmBaseHash(key)
          var r = 0
          while (r < depth) {
            buf(r * width + (((as(r) * h + bs(r)) % P) % width).toInt) += 1
            r += 1
          }
        }
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): CMSketch = CMSketch(width, r.toSeq)
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
    }
  }

  /** Point-frequency estimate for `key` from an aggregated [[CMSketch]]
    * struct column: min over the sketch's `depth` rows of the counter
    * each row hashes the key to. Pure Column arithmetic (codegen) —
    * estimating a million candidate keys is a map over the broadcast
    * one-row sketch, no UDF, no driver loop. `depth` must match the
    * [[countMin]] call that built the sketch. */
  def cmEstimate(sketch: Column, key: Column, width: Int, depth: Int = CMDepth): Column = {
    val h = conv(substring(md5(key), 1, 7), 16, 10).cast("long")
    least((0 until depth).map { r =>
      val (a, b) = cmHashParams(r)
      element_at(sketch.getField("counters"),
        (lit(r * width) +
          pmod(pmod(lit(a) * h + lit(b), lit(P)), lit(width))).cast("int") + 1)
    }: _*)
  }
}
