package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression computing a k-DIMENSIONAL Hilbert-curve
  * index: the position of cell (x₁ … x_k) — coordinates masked to the
  * low `bits` bits — along the order-`bits` Hilbert space-filling curve
  * over the k-d grid. Like the Morton code ([[ZValue]]) it linearizes
  * multi-dimensional space for range-partition + sort layout
  * clustering, but with strictly better locality: consecutive indices
  * are ALWAYS grid neighbors (|Δ| = 1 in exactly one axis, spec-proven
  * for 2-D/3-D/4-D), so a file covering a contiguous index range covers
  * one connected, near-cubic region — Morton's worst-case "Z jumps"
  * (e.g. 0x0FFF → 0x1000 crossing half the grid) never happen, which
  * tightens per-file min/max boxes and therefore skipping on every
  * dimension.
  *
  * Usage: `graft_hilbert(bits, x, y)` or `graft_hilbert(bits, x, y, z,
  * …)` — `bits` a foldable integer with bits × dims ≤ 63 (the index is
  * one signed long), coordinates integral (masked into the grid).
  * 2-D uses the classic iterative xy→d quadrant-rotation walk (Hilbert
  * 1891); k ≥ 3 uses Skilling's transpose algorithm (Skilling 2004,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707: undo excess
  * rotations top-down, Gray-encode, interleave bit planes). Both
  * interpreted and generated paths call one static kernel per arity,
  * keeping the pass inside whole-stage codegen.
  */
case class HilbertIndex(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 3)
      return TypeCheckResult.TypeCheckFailure(
        "graft_hilbert takes (bits, coord1, coord2, ...) with at least 2 coordinates")
    if (!children.head.foldable ||
        !Seq(IntegerType, LongType).contains(children.head.dataType))
      return TypeCheckResult.TypeCheckFailure(
        "graft_hilbert bits argument must be a foldable integer")
    // Validate on the WIDE value: a null literal must fail analysis (not
    // throw), and a LongType bits like 2^32+7 must not truncate to 7
    // before the range check.
    val b: java.lang.Long = children.head.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case _ => null // null literal (or non-integral foldable)
    }
    if (b == null)
      return TypeCheckResult.TypeCheckFailure(
        "graft_hilbert bits argument must be a non-null integer literal")
    val dims = children.length - 1
    if (b < 1L || b * dims > 63L)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert bits=$b must satisfy 1 <= bits and bits*$dims <= 63 " +
          "(index is one signed long)")
    children.tail.find(c => !Seq(IntegerType, LongType).contains(c.dataType)) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert coordinates must be INT or BIGINT, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val bitsValue: Int = children.head.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_hilbert bits argument evaluated to $other")
  }

  private def dims: Int = children.length - 1

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.tail.exists(_.nullable)
  override def prettyName: String = "graft_hilbert"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    def asLong(v: Any): Long = v match { case i: Int => i.toLong; case l: Long => l }
    if (dims == 2) {
      val xv = children(1).eval(input)
      if (xv == null) return null
      val yv = children(2).eval(input)
      if (yv == null) return null
      HilbertIndex.xy2d(bitsValue, asLong(xv), asLong(yv))
    } else {
      val xs = new Array[Long](dims)
      var i = 0
      while (i < dims) {
        val v = children(i + 1).eval(input)
        if (v == null) return null
        xs(i) = asLong(v)
        i += 1
      }
      HilbertIndex.axesToIndex(bitsValue, xs)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gs = children.tail.map(_.genCode(ctx))
    val childCode = gs.map(_.code.toString).mkString("\n")
    val anyNull = gs.map(_.isNull.toString).mkString(" || ")
    val call =
      if (dims == 2)
        s"graft.functions.HilbertIndex.xy2d($bitsValue, " +
          s"(long)(${gs(0).value}), (long)(${gs(1).value}))"
      else
        s"graft.functions.HilbertIndex.axesToIndex($bitsValue, " +
          s"new long[]{${gs.map(g => s"(long)(${g.value})").mkString(", ")}})"
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = $call;
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Shared 2-D scalar kernel (interpreted eval + generated code): walk
    * the quadrant hierarchy top-down, accumulating each level's sub-curve
    * offset and rotating the frame. Coordinates are masked to the grid
    * so out-of-range values wrap rather than corrupting the walk. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate/reflect the lower levels into frame
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Shared k-D scalar kernel — Skilling's axes→transpose transform
    * followed by bit-plane interleaving. Coordinates are masked to the
    * grid; the input array is not mutated. Total index bits =
    * bits × xs.length ≤ 63 (enforced at analysis). */
  def axesToIndex(bits: Int, xs0: Array[Long]): Long = {
    val n = xs0.length
    val mask = (1L << bits) - 1
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) { xs(i) = xs0(i) & mask; i += 1 }
    // Inverse-undo excess rotations, top bit plane down to the second
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p // invert low bits of axis 0
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) {
      if ((xs(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // Interleave bit planes, most-significant plane first, axis 0 most
    // significant within each plane — the transpose-to-scalar mapping
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        d = (d << 1) | ((xs(k) >>> j) & 1L)
        k += 1
      }
      j -= 1
    }
    d
  }
}
