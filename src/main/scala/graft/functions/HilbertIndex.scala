package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression computing a 2-D Hilbert-curve index: the
  * position of cell (x, y) — coordinates masked to the low `bits` bits —
  * along the order-`bits` Hilbert space-filling curve. Like the Morton
  * code ([[ZValue]]) it linearizes 2-D space for range-partition + sort
  * layout clustering, but with strictly better locality: consecutive
  * indices are ALWAYS grid neighbors (|Δx| + |Δy| = 1, spec-proven), so
  * a file covering a contiguous index range covers one connected,
  * near-square region — Morton's worst-case "Z jumps" (e.g. 0x0FFF →
  * 0x1000 crossing half the grid) never happen, which tightens per-file
  * min/max boxes and therefore skipping on both dimensions.
  *
  * Usage: `graft_hilbert(bits, x, y)` — `bits` a foldable integer in
  * [1, 31], coordinates integral (masked into the grid). The classic
  * iterative xy→d walk (Hilbert 1891; the standard quadrant-rotation
  * formulation): per level `s = 2^k .. 1`, accumulate `s²·((3·rx)⊕ry)`
  * and rotate/reflect the frame. Both interpreted and generated paths
  * call one static kernel, keeping the pass inside whole-stage codegen.
  */
case class HilbertIndex(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 3)
      return TypeCheckResult.TypeCheckFailure(
        "graft_hilbert takes exactly (bits, x, y)")
    if (!children.head.foldable ||
        !Seq(IntegerType, LongType).contains(children.head.dataType))
      return TypeCheckResult.TypeCheckFailure(
        "graft_hilbert bits argument must be a foldable integer")
    val b = bitsValue
    if (b < 1 || b > 31)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert bits=$b must be in [1, 31] (index is one signed long)")
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

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.tail.exists(_.nullable)
  override def prettyName: String = "graft_hilbert"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xv = children(1).eval(input)
    if (xv == null) return null
    val yv = children(2).eval(input)
    if (yv == null) return null
    def asLong(v: Any): Long = v match { case i: Int => i.toLong; case l: Long => l }
    HilbertIndex.xy2d(bitsValue, asLong(xv), asLong(yv))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = children(1).genCode(ctx)
    val gy = children(2).genCode(ctx)
    ev.copy(code = code"""
      ${gx.code}
      ${gy.code}
      boolean ${ev.isNull} = ${gx.isNull} || ${gy.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.HilbertIndex.xy2d(
          $bitsValue, (long)(${gx.value}), (long)(${gy.value}));
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Shared scalar kernel (interpreted eval + generated code): walk the
    * quadrant hierarchy top-down, accumulating each level's sub-curve
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
}
