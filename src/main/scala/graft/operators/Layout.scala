package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for write-side
  * file organization, plus a file-level min/max stats manifest for
  * data skipping. The 100 TB story: a table laid out by z-value has
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

  /** Name of the manifest subdirectory. Underscore-prefixed so every
    * parquet/Hadoop reader treats it as metadata and skips it when
    * scanning the dataset itself. */
  val ManifestDir = "_graft_manifest"

  /** Per-FILE min/max stats manifest over `cols`: one row per data file
    * — (file, n_rows, min_<c>, max_<c>, ...). This is the Delta/Iceberg
    * data-skipping design: parquet row-group stats already prune WITHIN
    * a file, but the reader must still list and open every footer to
    * know that — at millions of files that planning cost dominates. A
    * manifest is one tiny table (a row per file) that answers "which
    * files can match?" with a single scan of itself.
    *
    * Built as one column-pruned pass over the dataset (only `cols` are
    * read, grouped by `input_file_name` — partial aggs, no shuffle of
    * data rows). Min/max ignore nulls (SQL agg semantics), matching how
    * the pruning predicate treats them. */
  def statsManifest(spark: SparkSession, dataPath: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one indexed column")
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
  }

  /** Build and persist the manifest under `dataPath/_graft_manifest`.
    * The manifest describes the file set AT BUILD TIME — rewrite it
    * after any write that adds/replaces data files (same contract as a
    * table format's snapshot). */
  def writeManifest(spark: SparkSession, dataPath: String,
      cols: Seq[String]): Unit =
    statsManifest(spark, dataPath, cols)
      .coalesce(1) // one row per file: tiny by construction
      .write.mode("overwrite").parquet(s"$dataPath/$ManifestDir")

  /** Incrementally extend the manifest after APPENDING data files: the
    * current file listing is diffed against the manifest's covered set,
    * and only uncovered files are scanned for stats, which append as
    * new manifest rows (the manifest dir is itself append-only here —
    * no rewrite of existing entries). At 100 TB this is the difference
    * between a stats pass over the day's partition and one over the
    * whole table. Contract: appends only — a rewritten/compacted file
    * set needs [[writeManifest]] (same rule as a table format: appends
    * are cheap, rewrites are a new snapshot). */
  def updateManifest(spark: SparkSession, dataPath: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "need at least one indexed column")
    val manifestPath = s"$dataPath/$ManifestDir"
    // bootstrap: no manifest yet -> full build. Makes per-batch streaming
    // maintenance a single idempotent call (see StreamsSpec).
    val mp = new org.apache.hadoop.fs.Path(manifestPath)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mp)) { writeManifest(spark, dataPath, cols); return }
    val covered = spark.read.parquet(manifestPath)
      .select(col("file")).collect().map(_.getString(0)).toSet
    // listing only — no data scan to discover the delta
    val newFiles = spark.read.parquet(dataPath).inputFiles.filterNot(covered)
    if (newFiles.nonEmpty)
      spark.read.parquet(newFiles.toIndexedSeq: _*)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"))): _*)
        .coalesce(1)
        .write.mode("append").parquet(manifestPath)
  }

  /** Manifest-pruned range scan: `ranges` are inclusive `(col, lo, hi)`
    * intervals; a file survives iff every interval CAN intersect its
    * [min, max] (i.e. NOT (max < lo OR min > hi) — files whose stats
    * are null, meaning all-null values, cannot match and are skipped).
    * Surviving files are read directly and the exact residual predicate
    * re-applied, so results are identical to a full scan + filter while
    * planning I/O touches only the manifest. The surviving-file collect
    * is one string per file — the same cardinality as the file listing
    * every scan does anyway. */
  def prunedRead(spark: SparkSession, dataPath: String,
      ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "need at least one range predicate")
    val manifest = spark.read.parquet(s"$dataPath/$ManifestDir")
    val surviving = ranges.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(!(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)))
    }
    val files = surviving.select(col("file")).collect().map(_.getString(0))
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(files: _*).filter(residual)
  }
}
