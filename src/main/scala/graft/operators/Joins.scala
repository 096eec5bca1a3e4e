package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks as built-ins, composed from
  * shuffle-friendly primitives so they hold up at cluster scale.
  *
  * The reference (taboola/ScORe) executes joins via Spark directly
  * (SchemaOnReadGeneratorTest.java:894-1102 covers only equi joins); these
  * extend the engine to the temporal shapes a large pipeline needs.
  */
object TemporalJoins {

  /** As-of join: for each left row, match the single latest right row with
    * the same key and `right.ts <= left.ts` (inner semantics — unmatched
    * left rows are dropped).
    *
    * Implementation: tag and union both sides, then one window pass per key
    * ordered by (ts, tag) carrying the last-seen right payload forward
    * (`last(..., ignoreNulls)` over an unbounded-preceding frame). This is a
    * single shuffle + sort per key partition — O(n log n) with no range
    * explosion, unlike an inequality join which Spark plans as a
    * broadcast-nested-loop. At 100 TB this is the same cost profile as any
    * sort-based aggregation over the union of both inputs.
    *
    * @param payload right-side columns to carry onto matched left rows;
    *                names must not collide with left columns. Payload
    *                types must be ORDERABLE (no maps): the carried struct
    *                participates in the window sort as the deterministic
    *                tiebreak among right rows sharing (key, ts).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left side")
    payload.foreach { c =>
      require(right.columns.contains(c),
        s"payload column $c does not exist on the right side " +
          s"(columns: ${right.columns.mkString(", ")})")
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType),
        s"payload column $c has a non-orderable type (${right.schema(c).dataType}); " +
          "the as-of tiebreak sorts the payload struct")
    }

    // The payload is carried as ONE struct so a matched left row always
    // gets all payload fields from the SAME right row — carrying columns
    // independently with ignoreNulls would splice stale values across
    // right rows whenever a payload field is null, and would drop
    // legitimate matches whose latest payload field is null.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))

    // Common layout: key, _ts, _side (0 = right sorts first on ties, so a
    // right row with ts == left ts IS matched), left columns, _p struct.
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(payloadType).as("_p"): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_p"): _*)

    // _p last in the ordering: deterministic tiebreak among right rows
    // sharing the same (key, ts) — struct comparison is total
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))

    carried
      .filter(col("_side") === 1 && col("_p").isNotNull)
      .select(leftCols.map(col) ++ payload.map(c => col("_p")(c).as(c)): _*)
  }

  /** Range join: pairs (l, r) with the same key and
    * `r.ts ∈ [l.ts + lower, l.ts + upper]` (bounds inclusive, seconds).
    *
    * Implementation: bucketize time into `upper - lower`-second buckets.
    * Each right row lands in exactly one bucket; each left row's window
    * spans at most two, so the left side is exploded to ≤2 bucket keys and
    * the match becomes an equi-join on (key, bucket) + an exact range
    * filter. Shuffle volume is ≤2× the inputs — no nested-loop, survives a
    * 100× scale-up as long as (key, bucket) cardinality keeps partitions
    * balanced.
    */
  def range(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lowerSec: Long,
      upperSec: Long): DataFrame = {
    require(upperSec > lowerSec, "empty range")
    // the equi-join below merges on (key, _bucket) only — any other shared
    // column name would come out ambiguous/duplicated
    val shared = left.columns.toSet.intersect(right.columns.toSet) - key
    require(shared.isEmpty,
      s"left and right share non-key columns $shared; rename one side")
    // Exact integer micros throughout — no float rounding at the bounds.
    val width = (upperSec - lowerSec) * 1000000L
    val lo = unix_micros(col(leftTs)) + lowerSec * 1000000L
    val hi = unix_micros(col(leftTs)) + upperSec * 1000000L

    val l = left
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .withColumn("_bucket",
        explode(sequence(floor(col("_lo") / width), floor(col("_hi") / width))))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bucket", floor(col("_rus") / width))

    l.join(r, Seq(key, "_bucket"))
      .filter(col("_rus") >= col("_lo") && col("_rus") <= col("_hi"))
      .drop("_lo", "_hi", "_bucket", "_rus")
  }

  /** Sessionize: assign per-key session ids where a gap of more than
    * `gapSec` seconds starts a new session. Single window pass
    * (lag → gap flag → running sum), the standard scalable formulation.
    * Adds columns `session_id` (1-based per key) to the input.
    */
  def sessionize(df: DataFrame, key: String, ts: String, gapSec: Long,
      tieBreak: Option[String] = None): DataFrame = {
    val order = col(ts) +: tieBreak.map(col).toSeq
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("_prev_ts", lag(col(ts), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_micros(col(ts)) - unix_micros(col("_prev_ts")) > gapSec * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new_session")
  }

  /** INTERVAL-OVERLAP join: every pair (l, r) whose CLOSED integer
    * intervals [lStart, lEnd] and [rStart, rEnd] intersect — the
    * sessions×campaigns / genomics shape Spark plans as a
    * broadcast-nested-loop theta join if written naively. Both sides
    * explode their interval into covering grid cells of `cellSize`;
    * the join becomes an EQUI-join on the cell (plus any `keys`), and
    * each overlapping pair is emitted EXACTLY ONCE with NO distinct:
    * only the canonical cell — the one containing the overlap's start,
    * max(lStart, rStart) — passes the final filter, so a pair sharing
    * many cells still surfaces from exactly one of them (the dedup-free
    * grid-join trick; a distinct here would be a second full shuffle of
    * the output).
    *
    * Scale shape: shuffle volume is each input × (span/cellSize + 1);
    * pick `cellSize` near the median interval span so the explode is a
    * small constant factor, and pass `keys` whenever a natural equi-key
    * exists — the cell only has to subdivide WITHIN a key. Bounds must
    * be NON-NEGATIVE integral columns (`div` truncates toward zero, so
    * negative starts would land in the wrong cell); both inputs must
    * not share column names beyond `keys` (same contract as [[range]]).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      cellSize: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(cellSize >= 1, "cellSize must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"left and right share non-key columns $shared; rename one side")
    require(!left.columns.contains("_cell") && !right.columns.contains("_cell"),
      "inputs must not carry a _cell column")
    def cells(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_cell", explode(sequence(
        expr(s"CAST($s AS BIGINT) div $cellSize"),
        expr(s"CAST($e AS BIGINT) div $cellSize"))))
    cells(left, lStart, lEnd)
      .join(cells(right, rStart, rEnd), keys :+ "_cell")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_cell") ===
        expr(s"CAST(greatest($lStart, $rStart) AS BIGINT) div $cellSize"))
      .drop("_cell")
  }
}

/** Skew-resistant join shapes. AQE's skew-join split handles moderate skew
  * at runtime, but a key hot enough to dwarf a single executor's memory
  * needs the salt replicated into the JOIN KEY itself so the hot key's
  * rows land in `saltBuckets` independent tasks. This is the two-phase
  * discipline of the salted aggregation (q34) applied to joins.
  */
object SkewJoins {

  /** Salted equi-join of a skewed `fact` side against a `dim` side that is
    * too large (or too replicated) to broadcast.
    *
    * The fact side gains a deterministic salt in [0, saltBuckets) derived
    * from `saltSource` (any high-cardinality fact column); the dim side is
    * replicated once per salt value. The join runs on
    * (key, salt) — so a key carrying 10% of a 100 TB fact table spreads
    * over `saltBuckets` tasks instead of hot-spotting one — and the salt
    * never escapes: the output is exactly the plain equi-join's.
    *
    * The dim side is hinted SHUFFLE_HASH: salting exists precisely when
    * broadcast is off the table, and a sort-merge over the replicated dim
    * would pay `saltBuckets` sorts of the dim for nothing.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBuckets: Int,
      saltSource: Column): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    require(fact.columns.contains(key), s"fact side has no column $key")
    require(dim.columns.contains(key), s"dim side has no column $key")
    val shared = fact.columns.toSet.intersect(dim.columns.toSet) - key
    require(shared.isEmpty,
      s"fact and dim share non-key columns $shared; rename one side")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not carry a _salt column")
    val salted = fact.withColumn("_salt", pmod(hash(saltSource), lit(saltBuckets)))
    val dimExp = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(dimExp.hint("SHUFFLE_HASH"), Seq(key, "_salt"))
      .drop("_salt")
  }
}
