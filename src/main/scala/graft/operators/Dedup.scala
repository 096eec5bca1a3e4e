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
    * doc×doc cross product).
    *
    * Tokens are staged as a column before the shingle lambda: Catalyst
    * re-evaluates non-lambda subexpressions inside higher-order-function
    * bodies once PER ELEMENT, so referencing `tokens(text)` directly in
    * the lambda would re-run the regex tokenizer ~3×shingle-count times
    * per document (measured 24 s → <2 s at sf0.1 for this stage). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, tau: Double): DataFrame = {
    val inv = shinglePostings(df, idCol, textCol)
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
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
    * (bands × docs) rows — the standard sub-quadratic dedup at scale.
    * Signatures come from [[minhashSignatures]] (kernel md5 — the hash
    * count is k × shingles per doc, far too hot for interpreted
    * expressions); banding and the candidate join stay relational. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, r: Int = 4): DataFrame = {
    require(k % r == 0, "k must be a multiple of r")
    val mh = minhashSignatures(df, idCol, textCol, k)
    val bands = mh.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(k / r - 1)),
        b => concat_ws("|", slice(col("mh"), b * r + 1, lit(r))))).as(Seq("band", "key")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Kernel shingle postings: one (doc_id, shingle) row per distinct
    * 3-gram shingle, tokenized in scalar code (the interpreted transform/
    * element_at formulation costs ~2 ms per document). */
  def shinglePostings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .repartition(sp.sparkContext.defaultParallelism) // CPU-bound kernel: one input file must not mean one core
      .mapPartitions(_.flatMap { case (id, text) =>
        Kernel.shingles3(text).iterator.map(s => (id, s))
      }).toDF("doc_id", "s")
  }

  /** Kernel MinHash: per-partition tokenize → 3-gram shingle → k×md5-min,
    * bit-identical to `minhash(shingles3(text), k)` but with the md5 inner
    * loop in scalar code. Emits (doc_id, mh: array<string>). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .repartition(sp.sparkContext.defaultParallelism) // CPU-bound kernel: spread the md5 loops
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val sh = Kernel.shingles3(text)
          if (sh.isEmpty) Iterator.empty
          else {
            val sig = Array.tabulate(k) { j =>
              var min: String = null
              sh.foreach { s =>
                val hex = Kernel.md5Hex(md, j + ":" + s)
                if (min == null || hex < min) min = hex
              }
              min
            }
            Iterator.single((id, sig.toSeq))
          }
        }
      }.toDF("doc_id", "mh")
  }

  /** Kernel SimHash (same math as [[simhash32]]): tokenize → distinct →
    * md5-derived 32-bit hash → per-bit majority vote. Pure map — no
    * shuffle. Emits (doc_id, simhash). */
  def simhashKernel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val tk = Kernel.tokens(text).distinct
          if (tk.isEmpty) Iterator.empty
          else {
            val counts = new Array[Int](32)
            tk.foreach { t =>
              val h = java.lang.Long.parseLong(Kernel.md5Hex(md, t).substring(0, 8), 16)
              var b = 0
              while (b < 32) { if (((h >> b) & 1L) == 1L) counts(b) += 1; b += 1 }
            }
            var sim = 0L
            var b = 0
            while (b < 32) { if (2 * counts(b) >= tk.length) sim |= 1L << b; b += 1 }
            Iterator.single((id, sim))
          }
        }
      }.toDF("doc_id", "simhash")
  }

  /** Shared scalar kernels, tokenization identical to
    * `regexp_extract_all(lower(text), '[a-z0-9]+')`. */
  private[operators] object Kernel {
    private val token = java.util.regex.Pattern.compile("[a-z0-9]+")
    private val hexChars = "0123456789abcdef".toCharArray

    def tokens(text: String): IndexedSeq[String] = {
      val m = token.matcher(text.toLowerCase(java.util.Locale.ROOT))
      val out = IndexedSeq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }

    def shingles3(text: String): IndexedSeq[String] = {
      val tk = tokens(text)
      if (tk.length < 3) IndexedSeq.empty
      else (0 until tk.length - 2).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").distinct
    }

    def md5Hex(md: java.security.MessageDigest, s: String): String = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = hexChars((d(i) >> 4) & 0xF)
        out(2 * i + 1) = hexChars(d(i) & 0xF)
        i += 1
      }
      new String(out)
    }
  }

  /** 32-bit SimHash over the distinct token set: per bit, majority vote of
    * token-hash bits. Pure per-row expression — no shuffle at all. */
  def simhash32(text: Column): Column = {
    // hash each distinct token once, then take 32 bit-passes over the hashes
    val hs = transform(array_distinct(TextAnalysis.tokens(text)), t => hash32(t))
    val n = size(hs)
    // token-less documents have no simhash (the majority vote 2*0 >= 0
    // would set every bit, colliding all empty docs at 0xFFFFFFFF);
    // mirrors simhashKernel, which emits nothing for them
    // bit b of h, via exact double division (h < 2^32, so h / 2^b is exact)
    def bitOf(h: Column, b: Column): Column =
      floor(h / pow(lit(2.0), b)).cast(LongType) % 2
    when(n >= 1,
      aggregate(sequence(lit(0), lit(31)), lit(0L),
        (acc, b) => acc +
          when(lit(2) * size(filter(hs, h => bitOf(h, b) === 1)) >= n,
            pow(lit(2.0), b).cast(LongType)).otherwise(0L)))
      .otherwise(lit(null).cast(LongType))
  }
}
