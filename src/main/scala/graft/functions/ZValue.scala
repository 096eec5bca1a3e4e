package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression computing a Z-order (Morton) value: the low
  * `bits` bits of each coordinate column, bit-interleaved round-robin
  * (bit i of coordinate j lands at position i*n + j). Z-values linearize
  * a multi-dimensional space so that range-partitioning + sorting by the
  * z-value clusters rows that are close in EVERY dimension into the same
  * files — parquet min/max pruning then prunes on all dimensions at once
  * instead of only the leading sort key (the layout trick behind
  * lakehouse `OPTIMIZE ZORDER BY`).
  *
  * Usage: `graft_zvalue(bits, c1, c2, ...)` — `bits` a foldable integer,
  * coordinates integral and non-negative (higher bits are masked off).
  * Codegen-friendly: both interpreted and generated paths call one static
  * kernel, keeping the expression inside whole-stage codegen so the
  * layout pass stays a pure map over the scan.
  */
case class ZValue(children: Seq[Expression]) extends Expression {

  private def coords: Seq[Expression] = children.tail

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 2)
      return TypeCheckResult.TypeCheckFailure(
        "graft_zvalue needs a bits literal and at least one coordinate")
    if (!children.head.foldable ||
        !Seq(IntegerType, LongType).contains(children.head.dataType))
      return TypeCheckResult.TypeCheckFailure(
        "graft_zvalue bits argument must be a foldable integer")
    val b = bitsValue
    if (b < 1 || b.toLong * coords.length > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue bits=$b with ${coords.length} coordinates must satisfy " +
          "1 <= bits and bits * n <= 63 (result is one signed long)")
    coords.find(c => !Seq(IntegerType, LongType).contains(c.dataType)) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"graft_zvalue coordinates must be INT or BIGINT, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val bitsValue: Int = children.head.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_zvalue bits argument evaluated to $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = coords.exists(_.nullable)
  override def prettyName: String = "graft_zvalue"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Long](coords.length)
    var j = 0
    while (j < vs.length) {
      val v = coords(j).eval(input)
      if (v == null) return null
      vs(j) = v match { case i: Int => i.toLong; case l: Long => l }
      j += 1
    }
    ZValue.interleave(bitsValue, vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = coords.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val evalAll = gens.map(_.code.toString).mkString("\n")
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val fills = gens.zipWithIndex
      .map { case (g, i) => s"$arr[$i] = (long)(${g.value});" }.mkString("\n")
    ev.copy(code = code"""
      $evalAll
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${coords.length}];
        $fills
        ${ev.value} = graft.functions.ZValue.interleave($bitsValue, $arr);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)
}

object ZValue {
  /** Shared scalar kernel (interpreted eval + generated code). Coordinates
    * are masked to the low `bits` bits — out-of-range values wrap into the
    * grid rather than corrupting neighbors' bit positions. */
  def interleave(bits: Int, vs: Array[Long]): Long = {
    val n = vs.length
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        z |= ((vs(j) >>> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    z
  }
}
