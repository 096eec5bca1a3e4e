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

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002 /
  // Beyer et al. 2007. Keeps the k smallest DISTINCT 60-bit hash values
  // seen; state is ≤ k longs per group regardless of cardinality. Unlike
  // HLL, two KMV signatures support set INTERSECTION estimation (the
  // theta-sketch trick): the k smallest of the union are a uniform
  // sample of A ∪ B, so the fraction present in both signatures
  // estimates the Jaccard similarity. Everything is md5-derived and the
  // k-min of a set is order-independent, so results are bit-
  // deterministic and DuckDB-replayable.
  // --------------------------------------------------------------------

  /** 2^60 as an exact double (60-bit hashes normalize against it). */
  val KmvSpace: Double = 1.152921504606846976e18

  /** 60-bit hash = first 15 hex chars of md5(key); JVM twin of the
    * Column `conv(substring(md5(k), 1, 15), 16, 10)`. */
  def kmvHash(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes("UTF-8"))
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >> 4)
  }

  /** Column twin of [[kmvHash]] for callers that want the hash of a
    * probe value without building a sketch. */
  def kmvHashCol(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV sketch builder: per-group state is a sorted array of at most
    * `k` distinct hash values. `reduce` is a binary-search insert;
    * `merge` is a linear merge — both bounded by k, so partial
    * aggregation ships ≤ 8k bytes per group per map task no matter how
    * many rows fed it. `finish` emits the sorted signature (ascending),
    * estimable with the pure-Column [[kmvEstimate]]. */
  def kmv(k: Int): Aggregator[String, Array[Long], Seq[Long]] = {
    require(k >= 2, "kmv needs k >= 2 (the estimator divides by the kth minimum)")
    new Aggregator[String, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray
      override def reduce(buf: Array[Long], key: String): Array[Long] = {
        if (key == null) buf
        else {
          val h = kmvHash(key)
          val i = java.util.Arrays.binarySearch(buf, h)
          if (i >= 0) buf // already present
          else {
            val ins = -i - 1
            if (buf.length < k) {
              val out = new Array[Long](buf.length + 1)
              System.arraycopy(buf, 0, out, 0, ins)
              out(ins) = h
              System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
              out
            } else if (ins < k) { // h beats the current kth minimum
              val out = new Array[Long](k)
              System.arraycopy(buf, 0, out, 0, ins)
              out(ins) = h
              System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
              out
            } else buf
          }
        }
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val out = new Array[Long](math.min(k, a.length + b.length))
          var i = 0; var j = 0; var n = 0
          while (n < out.length && (i < a.length || j < b.length)) {
            val take =
              if (i >= a.length) { val v = b(j); j += 1; v }
              else if (j >= b.length) { val v = a(i); i += 1; v }
              else if (a(i) < b(j)) { val v = a(i); i += 1; v }
              else if (a(i) > b(j)) { val v = b(j); j += 1; v }
              else { val v = a(i); i += 1; j += 1; v } // shared hash: once
            out(n) = take; n += 1
          }
          if (n == out.length) out else java.util.Arrays.copyOf(out, n)
        }
      }
      override def finish(r: Array[Long]): Seq[Long] = r.toSeq
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
  }

  /** Distinct-count estimate from a KMV signature column (ascending
    * array<long> from [[kmv]]): exact |sig| when the sketch never
    * filled, else (k−1) · 2^60 / kth-minimum — the classic unbiased
    * KMV estimator. Pure Column arithmetic; both factors are exact
    * doubles so the value is engine-portable bit-for-bit. */
  def kmvEstimate(sig: Column, k: Int): Column =
    when(size(sig) < k, size(sig).cast("double"))
      .otherwise(lit((k - 1).toDouble * KmvSpace) /
        element_at(sig, k).cast("double"))

  /** Intersection-size estimate for two KMV signatures built with the
    * same k (theta-sketch style): the k smallest of sigA ∪ sigB are a
    * uniform hash-sample of A ∪ B, so
    *   |A ∩ B| ≈ (|{h ∈ K : h ∈ sigA ∧ h ∈ sigB}| / |K|) · est(A ∪ B).
    * All array built-ins — no UDF, no re-scan of the data. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    val kk = size(merged)
    val unionEst = when(kk < k, kk.cast("double"))
      .otherwise(lit((k - 1).toDouble * KmvSpace) /
        element_at(merged, k).cast("double"))
    val inBoth = size(array_intersect(array_intersect(merged, a), b))
    // Two empty signatures (both groups all-null / empty) intersect in 0
    // elements, not NULL — guard the 0/0 division.
    when(kk === 0, lit(0.0))
      .otherwise((inBoth.cast("double") / kk.cast("double")) * unionEst)
  }
}
