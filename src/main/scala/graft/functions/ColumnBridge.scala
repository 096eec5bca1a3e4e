package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`): the library defines
  * native Catalyst expressions ([[graft.functions.ZValue]],
  * [[graft.functions.CosineSimilarity]]) and needs to wrap them as
  * `Column`s for the DataFrame API without requiring callers to register
  * SQL functions first. Lives in the `org.apache.spark.sql` namespace
  * solely for access; no Spark behavior is modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into `private[sql]` plan construction for ITERATIVE operators.
  *
  * Why it exists: `Dataset.localCheckpoint` truncates LINEAGE but
  * carries the origin plan's ESTIMATED statistics onto the new leaf
  * (`LogicalRDD.fromDataset`). An iterative operator whose round
  * references the previous round's frame twice — e.g. the
  * pointer-jumping label ⋈ label step of connected components — then
  * SQUARES `sizeInBytes` every round: size-only join estimation is a
  * plain product, so after k rounds the estimate is `base^(2^k)`, a
  * BigInteger with 2^k digits. Around k ≈ 17 the planner spends minutes
  * inside `BigInteger.multiply` (Toom–Cook on million-digit numbers)
  * — the driver hard-hangs on ANALYSIS, not on data (observed on a
  * sparse CC input needing ~17 rounds; the data itself was kilobytes).
  *
  * [[statsFlatLeaf]] rebuilds a frame as a fresh leaf over the SAME
  * InternalRow RDD (no serialization round-trip, no job) with default
  * leaf statistics, so per-round estimates stay constant-size. Used on
  * the per-round state INSIDE iterative loops; the operator's final
  * result remains a normal checkpointed frame. The conservative
  * default leaf size merely disables auto-broadcast for the wrapped
  * frame — correct-but-pessimistic, and irrelevant for node-keyed
  * shuffle joins. */
object PlanBridge {
  /** Round-16 (optimization guide §2.4 "remove shuffles outright"): the
    * rebuilt leaf PRESERVES the origin's physical `outputPartitioning`
    * and `outputOrdering` (what `Dataset.localCheckpoint` itself does,
    * via `LogicalRDD.fromDataset`) while still DROPPING the origin's
    * estimated statistics (`originStats = None` — the whole point of
    * this wrapper, see above). An iterative round that joins or
    * re-aggregates the previous round's state on the SAME key then
    * reuses the carried hash partitioning instead of re-exchanging a
    * frame that is already laid out correctly — one fewer Exchange
    * (and, under AQE, one fewer stage-job round-trip) per consumer per
    * round across the whole iterative family. The claimed partitioning
    * is exactly what Spark reported for the same physical RDD, so
    * correctness is by construction; a consumer keyed differently
    * still exchanges as before. */
  def statsFlatLeaf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema)
  }
}
