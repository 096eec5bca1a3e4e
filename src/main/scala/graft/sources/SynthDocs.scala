package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthDocs.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SynthDocsScan(rows, partitions, seed, required)
}

private class SynthDocsScan(rows: Long, partitions: Int, seed: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(start =>
      SynthDocsPartition(start, math.min(start + per, rows)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(seed, required)
}

private case class SynthDocsPartition(start: Long, end: Long) extends InputPartition

private class SynthDocsReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
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
      override def next(): Boolean = { id += 1; id < part.end }
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
