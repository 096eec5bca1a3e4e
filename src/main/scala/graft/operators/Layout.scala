package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Data-layout operators: multi-dimensional clustering for write-side
  * file organization. The 100 TB story: a table laid out by z-value has
  * every file covering a compact hyper-rectangle of the coordinate
  * space, so parquet min/max (and partition-level) pruning cuts reads on
  * ANY filtered dimension — a plain sort clusters only its leading key.
  */
object Layout {

  /** Column wrapper over the native [[graft.functions.ZValue]] codegen
    * expression: interleave the low `bits` bits of each coordinate. */
  def zvalue(bits: Int, coords: Column*): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.ZValue(
      org.apache.spark.sql.catalyst.expressions.Literal(bits) +:
        coords.map(ColumnBridge.expression)))
  }

  /** Z-order clustering pass: range-partition on the z-value (each
    * output partition/file = one compact z-range = one compact
    * rectangle in coordinate space) and sort within partitions so
    * parquet row-group stats are tight too. Purely a repartition + sort
    * — composes with any writer. */
  def zorderLayout(df: DataFrame, zCol: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
}
