package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read connector producing a deterministic synthetic
  * `documents` corpus — the "sources" face of the engine. Demonstrates
  * the full connector contract a 100 TB source needs:
  *
  *   - splittable input: `numPartitions` independent [[InputPartition]]s,
  *     each generating its row range locally (no driver materialization);
  *   - column pruning: implements [[SupportsPushDownRequiredColumns]] and
  *     only materializes requested fields;
  *   - filter pushdown: implements [[SupportsPushDownFilters]] — `doc_id`
  *     range predicates bound PARTITION PLANNING (partitions outside the
  *     range are never created, the DSv2 analogue of partition pruning)
  *     and `lang` equality is applied inside the reader;
  *   - deterministic content from (seed, doc_id) — reruns and retries
  *     produce identical data on any cluster layout.
  *
  * Usage: `spark.read.format("graft.sources.SynthDocs")
  *   .option("rows", 1000).option("partitions", 8).load()`.
  */
class SynthDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthDocs.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive; `properties` is case-preserved
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthDocsTable(
      Option(opts.get("rows")).getOrElse("1000").toLong,
      Option(opts.get("partitions")).getOrElse("4").toInt,
      Option(opts.get("seed")).getOrElse("42").toLong)
  }
}

object SynthDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val words = Vector("data", "spark", "query", "nested", "schema", "shuffle",
    "columnar", "vector", "stream", "batch", "join", "filter", "scan", "prune")
  private val langs = Vector("en", "de", "es", "fr")

  /** Deterministic doc content from (seed, id) — cheap splittable PRNG. */
  def docText(seed: Long, id: Long): String = {
    var x = seed * 6364136223846793005L + id * 1442695040888963407L
    def next(): Int = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; (x >>> 33).toInt }
    val n = 8 + math.floorMod(next(), 25)
    (0 until n).map(_ => words(math.floorMod(next(), words.length))).mkString(" ")
  }
  def docLang(seed: Long, id: Long): String = langs(math.floorMod(seed + id, langs.length).toInt)
}

private class SynthDocsTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, partitions, seed)
}

private class SynthDocsScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = SynthDocs.schema
  private var lo = 0L            // doc_id bounds [lo, hi) — intersected
  private var hi = Long.MaxValue // with the table's own [0, rows)
  private var langEq: Option[String] = None
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** A filter not returned here is FULLY enforced by the source — so only
    * exact-semantics predicates are accepted; everything else is left for
    * Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Only integral-exact bounds may be accepted: an accepted filter is
    // never re-checked by Spark, and truncating e.g. doc_id > 10.5 to
    // lo=11 vs doc_id >= 10.5 to lo=10 silently changes semantics. Spark
    // usually unwraps casts so pushed literals arrive integral, but the
    // source must not RELY on that — fractional values stay residual.
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Byte => Some(n.longValue())
      case n: java.lang.Short => Some(n.longValue())
      case n: java.lang.Integer => Some(n.longValue())
      case n: java.lang.Long => Some(n.longValue())
      case _ => None
    }
    // saturating +1: a bound at Long.MaxValue must not wrap to MinValue —
    // an accepted filter is never re-checked by Spark, so an overflow
    // here would return WRONG results, not just plan badly
    def inc(n: Long): Long = if (n == Long.MaxValue) n else n + 1
    def accept(f: Filter): Boolean = f match {
      case EqualTo("doc_id", v) => num(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, inc(n)); true }
      case GreaterThan("doc_id", v) => num(v).exists { n => lo = math.max(lo, inc(n)); true }
      case GreaterThanOrEqual("doc_id", v) => num(v).exists { n => lo = math.max(lo, n); true }
      case LessThan("doc_id", v) => num(v).exists { n => hi = math.min(hi, n); true }
      case LessThanOrEqual("doc_id", v) => num(v).exists { n => hi = math.min(hi, inc(n)); true }
      // a SECOND, different lang equality must stay residual — accepting
      // both while enforcing only one would return wrong (non-empty)
      // results for a contradictory conjunction
      case EqualTo("lang", v: String) =>
        if (langEq.forall(_ == v)) { langEq = Some(v); true } else false
      case And(l, r) => accept(l) && accept(r) // both enforced → the conjunction is
      case _ => false
    }
    val (ok, residual) = filters.partition(accept)
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new SynthDocsScan(rows, partitions, seed, required, lo, hi, langEq)
}

private class SynthDocsScan(rows: Long, partitions: Int, seed: Long,
    required: StructType, lo: Long, hi: Long, langEq: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"synth_docs range=[${math.max(0L, lo)}, ${math.min(rows, hi)}) lang=${langEq.getOrElse("*")}"
  override def planInputPartitions(): Array[InputPartition] = {
    // pushed doc_id bounds prune partitions at PLANNING time: a trillion-row
    // table with a narrow id filter plans only the covering partitions
    val begin = math.max(0L, lo)
    val end = math.min(rows, hi)
    if (begin >= end) return Array.empty
    val per = math.max(1L, (end - begin + partitions - 1) / partitions)
    (begin until end by per).map(start =>
      SynthDocsPartition(start, math.min(start + per, end)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(seed, required, langEq)
}

private case class SynthDocsPartition(start: Long, end: Long) extends InputPartition

private class SynthDocsReaderFactory(seed: Long, required: StructType,
    langEq: Option[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SynthDocsPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      // resolve the pruned projection ONCE per reader, not per row
      private val cols: Array[Int] = required.fields.map(_.name match {
        case "doc_id" => 0; case "text" => 1; case "lang" => 2; case "n_chars" => 3
        case _ => -1
      })
      private val needsText = cols.exists(c => c == 1 || c == 3)
      override def next(): Boolean = {
        id += 1
        // pushed lang equality: skip non-matching rows inside the reader
        langEq.foreach { l =>
          while (id < part.end && SynthDocs.docLang(seed, id) != l) id += 1
        }
        id < part.end
      }
      override def get(): InternalRow = {
        val text = if (needsText) SynthDocs.docText(seed, id) else null
        val values = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) {
          values(i) = cols(i) match {
            case 0 => id
            case 1 => UTF8String.fromString(text)
            case 2 => UTF8String.fromString(SynthDocs.docLang(seed, id))
            case 3 => text.length.toLong
            case _ => null
          }
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
