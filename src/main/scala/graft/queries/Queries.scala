package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** One named query shape with its DuckDB oracle (None → rows-only check).
  *
  * Conventions that keep the driver's hash-compare honest:
  *   - every output column is aliased identically in Spark and oracle SQL;
  *   - double aggregations go through an exact DECIMAL sum and come back as
  *     DOUBLE (`CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`) so both
  *     engines produce bit-identical values regardless of summation order;
  *   - every query has a total deterministic ORDER BY (ties broken by keys).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The operator-inventory query matrix (SURVEY.md §2) over the driver's
  * TPC-H-ish tables. Each entry exercises one logical-plan shape the engine
  * must support; the oracle is equivalent SQL run by DuckDB at sf0.01.
  */
object Queries {

  /** Parquet table loader; single place to swap in a pruned/optimized read. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. All driver-generated values are microsecond-aligned,
    * so read nanos as long and convert losslessly to a micros timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact double aggregation: sum via decimal, return double (see above). */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  val all: Seq[QueryDef] = Seq(

    // ---- Aggregate (TPC-H Q1 shape: filter + group + multi-agg + sort) ----
    QueryDef(
      "q01_groupby_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            count(lit(1)).as("count_order"),
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
              .cast(DoubleType).as("sum_disc_price"),
            max($"l_quantity").as("max_qty"),
            min($"l_extendedprice").as("min_price"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS sum_disc_price,
        MAX(l_quantity) AS max_qty, MIN(l_extendedprice) AS min_price
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- Project + Filter (predicate/projection pushdown shape) ----
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_totalprice" > 100000.0 && $"o_orderstatus" === "O")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_totalprice > 100000.0 AND o_orderstatus = 'O'
        ORDER BY o_orderkey""")),

    // ---- 3-way join + aggregate + top-k (TPC-H Q3/Q5 shape) ----
    QueryDef(
      "q03_join_agg",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        c.filter($"c_mktsegment" === "BUILDING")
          .join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey")
          .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
            .cast(DoubleType).as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey,
        CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,8))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ---- Left-semi join (EXISTS) ----
    QueryDef(
      "q04_semi_join",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem").filter($"l_quantity" > 49.0)
        o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 49.0)
        ORDER BY o_orderkey""")),

    // ---- Left-anti join (NOT EXISTS) ----
    QueryDef(
      "q05_anti_join",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
        c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ---- Broadcast join (small dim × big fact) ----
    QueryDef(
      "q06_broadcast_join",
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        l.join(broadcast(p), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_items"), dsum($"l_quantity").as("sum_qty"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- Window: ranking (row_number partition/order) ----
    QueryDef(
      "q07_window_rank",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---- Window: running frame (ROWS BETWEEN ... CURRENT ROW) + lag ----
    QueryDef(
      "q08_window_running",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .withColumn("running_value",
            sum($"value".cast(DecimalType(18, 6))).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast(DoubleType))
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .select($"user_id", $"event_id", $"running_value", $"prev_type")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events ORDER BY user_id, event_id"""))
  )

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
