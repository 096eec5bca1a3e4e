package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: run a set of constraint checks against
  * a table and emit ONE row per check — `(check_name, n_violations,
  * passed)` — the arrival-validation step a pipeline runs before letting
  * a new data drop into training.
  *
  * Scale shape: all row-local checks (not-null / range / predicate) fold
  * into ONE aggregation over ONE scan (each violation count is a
  * conditional `count`, partial map-side). Key-uniqueness adds one
  * key-partitioned hash agg; each referential check adds one left-anti
  * join (broadcast when the reference is small). Nothing collects rows —
  * a 100 TB table gates with the same plan, and a failing check reports
  * a count, not a materialized violation set.
  */
object Quality {

  /** One constraint. `name` keys the output row. */
  sealed trait Check { def name: String }

  /** `column` must never be null. */
  final case class NotNull(name: String, column: String) extends Check

  /** `column` must lie in `[lo, hi]` (inclusive; nulls are not range
    * violations — pair with [[NotNull]] to forbid them). */
  final case class InRange(name: String, column: String, lo: Double, hi: Double)
      extends Check

  /** Row-local predicate that must hold (nulls count as violations). */
  final case class Predicate(name: String, condition: Column) extends Check

  /** `columns` must be a unique key. Violations = rows beyond the first
    * per duplicate key value. */
  final case class UniqueKey(name: String, columns: Seq[String]) extends Check

  /** Every non-null `column` value must exist in `ref(refColumn)`. */
  final case class ForeignKey(name: String, column: String,
      ref: DataFrame, refColumn: String) extends Check

  /** Run `checks` against `df`. Output columns: `check_name` (as given),
    * `n_violations` (long), `passed` (n_violations == 0). Row order is
    * unspecified — sort on `check_name` for stable presentation. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val rowLocal = checks.collect {
      case NotNull(n, c) => n -> count(when(col(c).isNull, 1))
      case InRange(n, c, lo, hi) =>
        n -> count(when(col(c).isNotNull &&
          (col(c).cast("double") < lo || col(c).cast("double") > hi), 1))
      case Predicate(n, cond) => n -> count(when(!coalesce(cond, lit(false)), 1))
    }
    val scanned: Option[DataFrame] = if (rowLocal.isEmpty) None else Some {
      // one scan, one agg, every count partial map-side
      val agged = df.agg(rowLocal.head._2.as("c0"),
        rowLocal.tail.zipWithIndex.map { case ((_, e), i) => e.as(s"c${i + 1}") }: _*)
      agged.select(explode(array(rowLocal.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("check_name"), col(s"c$i").as("n_violations"))
      }: _*)).as("r")).select("r.*")
    }
    val keyed = checks.collect {
      case UniqueKey(n, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_n"))
          .agg(coalesce(sum(col("_n") - 1), lit(0L)).as("n_violations"))
          .select(lit(n).as("check_name"), col("n_violations"))
      case ForeignKey(n, c, ref, rc) =>
        df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(n).as("check_name"), col("n_violations"))
    }
    (scanned.toSeq ++ keyed)
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
  }
}
