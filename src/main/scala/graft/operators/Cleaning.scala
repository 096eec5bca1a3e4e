package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators — the C4 / Dolma web-scrape recipes a
  * training pipeline runs between raw scrape and dedup: corpus-level
  * line deduplication, PII redaction, and line-level quality rules.
  * Everything is deterministic Column arithmetic (engine-portable, so
  * every operator carries a DuckDB oracle query) and shaped for 100 TB:
  * the one corpus-wide operator ([[lineDedup]]) aggregates instead of
  * windowing so heavy-hitter lines (the empty line, boilerplate
  * headers) collapse map-side rather than piling onto one task.
  */
object Cleaning {

  /** Corpus-level EXACT line deduplication (the C4 recipe: a line that
    * appears `minOccurrences`+ times across the corpus is boilerplate —
    * navigation, cookie banners, licence footers — and every occurrence
    * except the FIRST is removed; "first" = lexicographically smallest
    * `(doc_id, line_pos)`, deterministic).
    *
    * Scale shape — aggregation, NOT a window: per-line `count` +
    * `min(struct(doc_id, pos))` is one hash agg with map-side partial
    * combine, so the corpus's hottest line (usually "") collapses to
    * one row per map task instead of shuffling every occurrence into a
    * single window partition — the skew that kills the naive
    * `row_number() OVER (PARTITION BY line)` formulation at corpus
    * scale. The join back is a plain equi-join on the line; docs
    * reassemble by sorting each doc's surviving `(pos, line)` pairs —
    * per-doc state, bounded by document size. Docs whose every line was
    * removed survive with empty text. Output: `(doc_id, text, n_lines,
    * n_removed)`. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minOccurrences: Int = 2): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences below 2 would drop every line")
    val docs = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("t"))
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("t"), "\n")).as(Seq("pos", "line")))
    val stats = lines.groupBy(col("line")).agg(
      count(lit(1)).as("occ"),
      min(struct(col("doc_id"), col("pos"))).as("first"))
    val kept = lines.join(stats, Seq("line"))
      .filter(col("occ") < minOccurrences ||
        struct(col("doc_id"), col("pos")) === col("first"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          p => p.getField("line")), "\n").as("text"),
        count(lit(1)).as("n_kept"))
    val totals = lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    totals.join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  // Deliberately unambiguous patterns (no alternation whose match LENGTH
  // could differ between a backtracking engine and RE2): greedy character
  // classes with a mandatory suffix agree on the matched span in both.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII redaction — the pre-training scrub every public corpus release
    * runs (emails, IPv4 addresses, NANP-style phone numbers →
    * `<EMAIL>`/`<IP>`/`<PHONE>` placeholders). Patterns apply IN ORDER
    * on the progressively redacted text (so a later pattern can never
    * re-match inside an earlier placeholder's span), and each count is
    * the number of spans that pattern actually replaced at its stage.
    * Map-only projection — the 100 TB cost is one codegen'd regex pass
    * per pattern. Output: `(doc_id, text, n_emails, n_ips, n_phones)`. */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    def cnt(c: Column, p: String) = size(regexp_extract_all(c, lit(p), lit(0)))
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val t3 = regexp_replace(t2, PhonePattern, "<PHONE>")
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        t3.as("text"),
        cnt(t0, EmailPattern).as("n_emails"),
        cnt(t1, Ipv4Pattern).as("n_ips"),
        cnt(t2, PhonePattern).as("n_phones"))
  }

  /** C4 line-level quality rules (Raffel et al. 2020 §2.2): keep only
    * lines that END in terminal punctuation (`.` `!` `?` `"`), carry at
    * least `minWords` alphanumeric words, and contain neither
    * "javascript" (case-folded) nor curly braces (the leaked-code /
    * cookie-notice tells); surviving lines rejoin in order. Pure Column
    * arithmetic over the line array — no explode, no shuffle: the 100 TB
    * cost is a map-only projection. Output: `(doc_id, text, n_lines,
    * n_kept)`. */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3): DataFrame = {
    require(minWords >= 1, "minWords must be positive")
    val lines = split(col(textCol), "\n")
    def keep(l: Column): Column = {
      val tl = rtrim(l)
      tl.rlike("[.!?\"]$") &&
        size(regexp_extract_all(lower(l), lit("[a-z0-9]+"), lit(0))) >= minWords &&
        !lower(l).contains("javascript") && !l.contains("{") && !l.contains("}")
    }
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        array_join(filter(lines, keep _), "\n").as("text"),
        size(lines).as("n_lines"),
        size(filter(lines, keep _)).as("n_kept"))
  }

  /** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975): goto
    * trie + BFS failure links, with each node's output list closed over
    * its failure chain — one pass over the text finds EVERY occurrence
    * of every pattern (overlapping and nested included: "she" finds
    * "she", "he", AND "hers"'s prefix state) in O(text + matches),
    * independent of pattern count. Built once per partition from the
    * broadcast pattern list. */
  private[operators] final class AhoCorasick(patterns: Array[String]) {
    private val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val outIdx = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        if (!children(s).containsKey(ch)) {
          children += new java.util.HashMap[Char, Int]()
          outIdx += Nil
          fail += 0
          children(s).put(ch, children.size - 1)
        }
        s = children(s).get(ch)
      }
      outIdx(s) = pi :: outIdx(s)
    }
    locally { // BFS failure links; close outputs over the fail chain
      val queue = scala.collection.mutable.Queue[Int]()
      children(0).forEach((_, c) => { fail(c) = 0; queue += c })
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        outIdx(s) = outIdx(s) ::: outIdx(fail(s))
        children(s).forEach { (ch, c) =>
          var f = fail(s)
          while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
          fail(c) = if (children(f).containsKey(ch) && children(f).get(ch) != c)
            children(f).get(ch) else 0
          queue += c
        }
      }
    }
    /** Scan `text`, incrementing `hits(patternIndex)` for every match
      * START position; returns total match count. */
    def scan(text: String, hits: Array[Long]): Long = {
      var s = 0
      var total = 0L
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !children(s).containsKey(ch)) s = fail(s)
        if (children(s).containsKey(ch)) s = children(s).get(ch)
        var o = outIdx(s)
        while (o.nonEmpty) { hits(o.head) += 1; total += 1; o = o.tail }
        i += 1
      }
      total
    }
  }

  /** Blocklist screening — the "bad-word / banned-phrase" filter every
    * public-corpus release runs before training: count every occurrence
    * (overlapping included — AC semantics: one count per match START
    * position) of every `patterns` phrase in the case-folded text, and
    * keep docs with at most `maxHits` total hits. Output: `(doc_id,
    * n_hits, n_patterns, keep)` — total matches, distinct patterns that
    * hit, and the screen verdict.
    *
    * Scale shape: the pattern list is a broadcast (bounded by contract —
    * real blocklists are 10²–10⁵ phrases, not corpus-sized), compiled
    * ONCE PER PARTITION into an Aho–Corasick automaton, and each doc is
    * one O(len + matches) kernel pass regardless of how many patterns
    * there are — the naive per-pattern `contains` loop is O(len ×
    * patterns) and loses by the blocklist size factor. Map-only: no
    * shuffle, no state, so the same scorer screens a stream unchanged
    * ([[graft.streaming.Streams]]).
    *
    * Case folding: patterns AND document text both fold via the SAME
    * `String.toLowerCase(Locale.ROOT)` call inside the kernel —
    * consistent by construction, so locale-sensitive characters
    * (e.g. Turkish dotted İ, ligatures) cannot silently diverge between
    * the two paths the way a JVM-pattern/Spark-`lower` split could. */
  def blocklistScreen(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], maxHits: Long = 0L): DataFrame = {
    val pats = patterns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.toArray
    require(pats.nonEmpty && pats.forall(_.nonEmpty),
      "need at least one non-empty pattern")
    require(pats.length <= 100000,
      "blocklist exceeds the broadcast contract (100k phrases)")
    val sp = df.sparkSession
    import sp.implicits._
    val pb = sp.sparkContext.broadcast(pats)
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = new AhoCorasick(pb.value)
        val nPat = pb.value.length
        it.map { case (id, raw) =>
          val t = raw.toLowerCase(java.util.Locale.ROOT)
          val hits = new Array[Long](nPat)
          val total = ac.scan(t, hits)
          var distinct = 0
          var i = 0
          while (i < nPat) { if (hits(i) > 0) distinct += 1; i += 1 }
          (id, total, distinct)
        }
      }
      .toDF("doc_id", "n_hits", "n_patterns")
      .withColumn("keep", col("n_hits") <= maxHits)
  }

  /** K-ANONYMITY / L-DIVERSITY audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) — the privacy gate a dataset release runs after
    * [[piiRedact]]: direct identifiers are scrubbed, but a COMBINATION
    * of quasi-identifier columns (language × length-bucket × date, …)
    * can still single a person out. One row per quasi-identifier
    * equivalence class:
    *
    *   - `n_rows` rows, `n_units` DISTINCT `unitCol` individuals;
    *   - `k_anonymous` — the class holds ≥ k distinct individuals
    *     (below k, those rows re-identify to a ≤(k−1)-person set);
    *   - with `sensitiveCol`: `l_distinct` distinct sensitive values
    *     and `l_diverse` (≥ l) — k-anonymity alone still leaks when a
    *     whole class shares one sensitive value (the homogeneity
    *     attack l-diversity closes).
    *
    * The release rule is then relational too: anti-join rows whose
    * class fails the audit (suppression), or coarsen the quasi columns
    * and re-audit (generalization) — both plain Spark ops downstream.
    * NULL quasi values form their own class (NULL-keyed groups — a
    * missing birthday is itself a quasi-identifier value). GOTCHA,
    * spec-pinned: the suppression anti-join must use NULL-SAFE
    * equality (`<=>`) on the quasi columns — a plain equi-join can
    * never match the NULL class, silently RELEASING exactly the rows
    * whose missing quasi value is itself identifying. One
    * partial-combining hash agg over the quasi key; distinct counts
    * ride the same agg as `count(distinct …)` expressions — state per
    * class is its own member set, bounded by the class itself. Output:
    * `(quasiCols…, n_rows, n_units, k_anonymous[, l_distinct,
    * l_diverse])`. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      unitCol: String, k: Int, sensitiveCol: Option[String] = None,
      l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be positive")
    require(l >= 1, "l must be positive")
    val base = sensitiveCol match {
      case None =>
        df.groupBy(quasiCols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col(unitCol)).as("n_units"))
      case Some(s) =>
        df.groupBy(quasiCols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col(unitCol)).as("n_units"),
            countDistinct(col(s)).as("l_distinct"))
    }
    val withK = base.withColumn("k_anonymous", col("n_units") >= k)
    sensitiveCol match {
      case None => withK
      case Some(_) =>
        withK.withColumn("l_diverse", col("l_distinct") >= l)
          .select((quasiCols.map(col) ++ Seq(col("n_rows"),
            col("n_units"), col("k_anonymous"), col("l_distinct"),
            col("l_diverse"))): _*)
    }
  }
}
