package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (fingerprint group-by), n-gram Jaccard via inverted-index join,
  * MinHash+LSH banding, and SimHash. All built from codegen'd Column
  * expressions + relational shuffles — no UDFs — so each formulation is
  * the one you would run at 100 TB:
  *   - exact/simhash are map-side pure + one hash aggregation;
  *   - jaccard/minhash candidate generation shuffle only (shingle, id) or
  *     (band, key) pairs, never the cross product.
  *
  * Deterministic hashing = md5 (bit-identical in the DuckDB oracle).
  */
object Dedup {

  /** First 8 md5 hex chars as an unsigned 32-bit value in a long. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Word 3-gram shingles (distinct), empty for docs under 3 tokens. */
  def shingles3(text: Column): Column = {
    val tk = TextAnalysis.tokens(text)
    when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature over a set column: k independent hash functions
    * h_j(t) = md5(j ‖ ':' ‖ t), taking the lexicographic minimum per j
    * (hex strings order like the 128-bit values they encode). */
  def minhash(set: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(set, t => md5(concat(j.cast("string"), lit(":"), t)))))

  /** Exact duplicate groups: fingerprint → surviving id + group size. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Near-duplicate pairs by exact n-gram Jaccard >= tau, computed with an
    * inverted-index equi-join on shingles (shuffle ∝ postings, never the
    * doc×doc cross product). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, tau: Double): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), shingles3(col(textCol)).as("sh"))
      .filter(size(col("sh")) >= 1)
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("n", "n2"), "id2")
      .withColumn("jac", col("common") / (col("n1") + col("n2") - col("common")))
      .filter(col("jac") >= tau)
      .select(col("id1"), col("id2"), col("jac"))
  }

  /** MinHash+LSH candidate pairs: k-hash signature over shingles, split
    * into bands of r rows; docs sharing any full band collide. Shuffle is
    * (bands × docs) rows — the standard sub-quadratic dedup at scale. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, r: Int = 4): DataFrame = {
    require(k % r == 0, "k must be a multiple of r")
    val mh = df.select(col(idCol).as("doc_id"), shingles3(col(textCol)).as("sh"))
      .filter(size(col("sh")) >= 1)
      .select(col("doc_id"), minhash(col("sh"), k).as("mh"))
    val bands = mh.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(k / r - 1)),
        b => concat_ws("|", slice(col("mh"), b * r + 1, lit(r))))).as(Seq("band", "key")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** 32-bit SimHash over the distinct token set: per bit, majority vote of
    * token-hash bits. Pure per-row expression — no shuffle at all. */
  def simhash32(text: Column): Column = {
    val tk = array_distinct(TextAnalysis.tokens(text))
    val n = size(tk)
    // bit b of h, via exact double division (h < 2^32, so h / 2^b is exact)
    def bitOf(h: Column, b: Column): Column =
      floor(h / pow(lit(2.0), b)).cast(LongType) % 2
    aggregate(sequence(lit(0), lit(31)), lit(0L),
      (acc, b) => acc +
        when(lit(2) * size(filter(tk, t => bitOf(hash32(t), b) === 1)) >= n,
          pow(lit(2.0), b).cast(LongType)).otherwise(0L))
  }
}
