package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Unsplittable-input parallelism fix (optimization guide §2.5 "one huge
  * unsplittable file ... repartition immediately after the read", §1.2
  * step 1).
  *
  * The bench/test tables are single-row-group parquet files, so a scan is
  * ONE task no matter the split config (parquet assigns a row group to
  * the split holding its midpoint — extra splits come back empty; measured
  * in round 15: q137's 64× md5 replicate blowup ran 9.5 s of task time on
  * a single core). Any operator doing heavy per-row CPU directly on a
  * scan therefore serializes on small inputs.
  *
  * [[spread]] is the CONDITIONAL keyed repartition that fixes exactly
  * that case and nothing else: if the frame already has at least
  * `defaultParallelism` partitions — every real at-scale scan, where
  * files ≫ maxPartitionBytes — it is the identity (zero plan change, no
  * added shuffle); only an under-parallel frame pays one narrow hash
  * exchange of the scan's rows to buy full-width execution of the
  * downstream per-row work. Keyed (hash) repartition, never round-robin:
  * deterministic row→partition assignment under task retry (guide §2.5,
  * SPARK-38388), and every result here is partition-order-free by the
  * suite's determinism discipline (stability-gated across cpus 4/8/32),
  * so output multisets are byte-identical either way.
  *
  * Call it on SCAN-ROOTED frames (reading `.rdd.getNumPartitions` runs
  * physical planning of the frame — cheap and job-free for scan-rooted
  * plans; an AQE-staged plan with exchanges would be the wrong place for
  * this helper anyway: post-shuffle parallelism is AQE's job).
  */
object Spread {
  import org.apache.spark.sql.catalyst.plans.logical._

  /** True when the analyzed plan is narrow ops over leaves only — the
    * scan-rooted shape where `.rdd.getNumPartitions` is free (no stages,
    * no broadcasts; under AQE, probing a plan WITH exchanges would
    * eagerly execute them, so anything else returns false and spread
    * becomes the identity). */
  private def scanRooted(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case p => p
    }.forall {
      case _: Project | _: Filter | _: SubqueryAlias | _: LeafNode => true
      case _ => false
    }

  /** `df` hash-repartitioned on `keys` to `defaultParallelism` when it is
    * a scan-rooted narrow frame with fewer partitions than that; `df`
    * unchanged otherwise (already-parallel scans — every real at-scale
    * input — and non-scan-rooted frames, whose parallelism is AQE's
    * job). */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val want = sc.defaultParallelism
    if (!scanRooted(df)) df
    else if (df.rdd.getNumPartitions >= want) df
    else df.repartition(want, keys: _*)
  }

  /** [[spread]] with a BYTES-AWARE width cap (round-16, the guide §2.5
    * skew/§2.2 task-granularity balance): width =
    * clamp(ceil(scanBytes / targetBytes), 1, defaultParallelism) with
    * `scanBytes` the optimizer's scan-rooted size estimate and
    * `targetBytes` from `spark.graft.spread.targetBytes` (default
    * 64 KiB — the per-task granularity below which scheduling overhead
    * beats parallelism for the text kernels this guards; round-15's
    * driver run showed the full-width form 3-4× SLOWER at 32 cores
    * than at 8 on sub-MB frames, the task/dispatch overhead exceeding
    * the win). At scale this is moot twice over: a real scan has
    * ≥ cores partitions (identity path), and a multi-GB under-parallel
    * frame caps at defaultParallelism exactly like [[spread]]. */
  def spreadCapped(df: DataFrame, keys: Column*): DataFrame = {
    val sess = df.sparkSession
    val want = sess.sparkContext.defaultParallelism
    if (!scanRooted(df)) df
    else {
      val target = sess.conf.get("spark.graft.spread.targetBytes",
        (64 * 1024).toString).toLong
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val width = ((bytes + target - 1) / target)
        .min(BigInt(want)).max(BigInt(1)).toInt
      if (df.rdd.getNumPartitions >= width) df
      else df.repartition(width, keys: _*)
    }
  }

  /** Unconditional keyed repartition with NO explicit partition count —
    * AQE sizes the exchange from its bytes (locally that re-spreads a
    * broadcast-join output that inherited a single-task scan's
    * partitioning; at scale it picks a byte-targeted count). For frames
    * BEHIND a broadcast join, where [[spread]] deliberately stays the
    * identity but the downstream per-row fan-out (e.g. a positioned-gram
    * explode multiplying each doc into ~|text| rows) dwarfs one narrow
    * shuffle of the rows themselves (guide §8's "move the heavy bytes
    * once, decide on light rows" inverted: shuffle the light rows once
    * to parallelize the heavy expansion). */
  def always(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(keys: _*)
}
