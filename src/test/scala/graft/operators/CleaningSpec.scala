package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CleaningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("CleaningSpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("lineDedup removes every repeated line except the first (doc_id, pos) occurrence") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "unique alpha\nCOOKIE BANNER\nunique beta"),
      (2L, "COOKIE BANNER\nunique gamma"),
      (3L, "COOKIE BANNER"),
      (4L, "all original content here"))
      .toDF("doc_id", "text")
    val got = Cleaning.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 holds the first (doc_id=1, pos=1) occurrence — keeps it
    assert(got(1L) === (("unique alpha\nCOOKIE BANNER\nunique beta", 3L, 0L)))
    assert(got(2L) === (("unique gamma", 2L, 1L)))
    // doc 3 loses its only line but SURVIVES with empty text
    assert(got(3L) === (("", 1L, 1L)))
    assert(got(4L) === (("all original content here", 1L, 0L)))
    // determinism under repartitioning (first-occurrence is an agg min,
    // not a partition-order accident)
    val again = Cleaning.lineDedup(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === got.map { case (k, v) => k -> v._1 })
    // raising the threshold spares a twice-repeated line
    val spared = Cleaning.lineDedup(docs, "doc_id", "text", minOccurrences = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(spared.values.sum === 0L, "occ=3 lines must survive minOccurrences=4")
  }

  test("piiRedact replaces emails, IPs, and phones in order with exact counts") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "mail a.user+tag@example.co.uk or b@x.io, host 10.0.255.1, call 555-123-4567"),
      (2L, "no pii at all in this line"),
      (3L, "192.168.0.1 and 192.168.0.2"))
      .toDF("doc_id", "text")
    val got = Cleaning.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) === (("mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>", 2, 1, 1)))
    assert(got(2L) === (("no pii at all in this line", 0, 0, 0)))
    assert(got(3L) === (("<IP> and <IP>", 0, 2, 0)))
  }

  test("c4LineFilter keeps terminal-punctuation prose lines and drops boilerplate") {
    val sp = spark; import sp.implicits._
    val text = Seq(
      "This is a proper sentence.", // kept
      "short.", // < 3 words
      "no terminal punctuation here", // no [.!?\"]
      "Enable JavaScript to continue.", // javascript
      "function f() { return 1; }", // braces
      "Is this a question? ", // kept (trailing space rtrimmed)
      "\"A quoted line ends well.\"" // kept (quote terminal)
    ).mkString("\n")
    val got = Cleaning.c4LineFilter(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(got.getString(1) === Seq(
      "This is a proper sentence.",
      "Is this a question? ",
      "\"A quoted line ends well.\"").mkString("\n"))
    assert(got.getInt(2) === 7 && got.getInt(3) === 3)
  }

  test("blocklistScreen counts nested and overlapping matches (the classic ushers case)") {
    val sp = spark; import sp.implicits._
    // "ushers": "she" @2, "he" @3 (nested inside "she"), "hers" @3 — the
    // canonical Aho-Corasick output-closure test. "a a a" holds TWO
    // overlapping "a a" matches.
    val docs = Seq(
      (1L, "ushers"),
      (2L, "a a a"),
      (3L, "SHE said HE is hers"), // case-folded: she@1(+he@2), he, hers(+he)
      (4L, "nothing to see")).toDF("doc_id", "text")
    val got = Cleaning.blocklistScreen(docs, "doc_id", "text",
        Seq("he", "she", "hers", "a a"), maxHits = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((3L, 3, false)), s"ushers: got ${got(1L)}")
    assert(got(2L) === ((2L, 1, true)))
    // "she said he is hers": she@1, he@2 (in she), he@10, hers@16, he@16 -> 5 hits
    assert(got(3L) === ((5L, 3, false)))
    assert(got(4L) === ((0L, 0, true)))
  }

  test("blocklistScreen matches a brute-force every-position reference on real docs") {
    val sp = spark; import sp.implicits._
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val pats = Seq("table part", "a a", "spark", "row scan", "zzz-no-match")
    val got = Cleaning.blocklistScreen(docs, "doc_id", "text", pats, maxHits = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val ref = docs.as[(Long, String)].collect().map { case (id, text) =>
      val t = text.toLowerCase
      val counts = pats.map { p =>
        (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length))
      }
      id -> ((counts.map(_.toLong).sum, counts.count(_ > 0)))
    }.toMap
    assert(got === ref)
    assert(got.values.exists(_._1 > 0L), "vacuous: no pattern ever matched")
  }

  test("blocklistScreen rejects empty pattern lists and dedups case-folded patterns") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "spark spark")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Cleaning.blocklistScreen(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Cleaning.blocklistScreen(docs, "doc_id", "text", Seq("ok", ""))
    }
    // "Spark" and "spark" fold to ONE pattern: 2 hits, 1 distinct
    val got = Cleaning.blocklistScreen(docs, "doc_id", "text",
      Seq("Spark", "spark")).collect().head
    assert(got.getLong(1) === 2L && got.getInt(2) === 1)
  }

  test("blocklistScreen folds locale-sensitive characters identically on both paths") {
    val sp = spark; import sp.implicits._
    // Turkish dotted İ and the ﬁ ligature are exactly the characters a
    // JVM-pattern/Spark-lower split could fold differently; both paths
    // now share one String.toLowerCase(Locale.ROOT) call in the kernel.
    val docs = Seq((1L, "news from İSTANBUL tonight"),
                   (2L, "a ﬁne day")).toDF("doc_id", "text")
    val got = Cleaning.blocklistScreen(docs, "doc_id", "text",
        Seq("İstanbul", "ﬁne"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L, "dotted-İ pattern missed its dotted-İ document")
    assert(got(2L) === 1L, "ligature pattern missed its ligature document")
  }

  test("AhoCorasick automaton equals brute every-position counting on random inputs") {
    // kernel-only property (no Spark): a 2-letter alphabet maximizes
    // overlap/nesting/failure-link traffic
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      nPat <- Gen.choose(1, 5)
      pats <- Gen.listOfN(nPat,
        Gen.choose(1, 4).flatMap(l => Gen.stringOfN(l, Gen.oneOf('a', 'b'))))
      text <- Gen.choose(0, 40).flatMap(l =>
        Gen.stringOfN(l, Gen.oneOf('a', 'b', ' ')))
    } yield (pats.distinct, text)
    val prop = Prop.forAll(genCase) { case (pats, text) =>
      val ac = new Cleaning.AhoCorasick(pats.toArray)
      val hits = new Array[Long](pats.length)
      val total = ac.scan(text, hits)
      val brute = pats.map(p =>
        (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong)
      total == brute.sum && hits.toSeq == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("kAnonymityAudit: class counts, k/l flags, NULL quasi class, " +
      "suppression composes") {
    val sp = spark; import sp.implicits._
    // (city, yob) quasi key; person = unit; disease = sensitive.
    // class (a,1980): 3 persons (1 twice), 2 diseases -> k3, l2
    // class (b,1990): 1 person, 1 disease -> fails both at k=2, l=2
    // class (NULL,1980): its own class with 2 persons, 1 disease
    val rows = Seq(
      ("a", 1980, 1L, "flu"), ("a", 1980, 1L, "flu"),
      ("a", 1980, 2L, "cold"), ("a", 1980, 3L, "flu"),
      ("b", 1990, 4L, "flu"),
      (null, 1980, 5L, "cold"), (null, 1980, 6L, "cold")
    ).toDF("city", "yob", "person", "disease")
    val out = Cleaning.kAnonymityAudit(rows, Seq("city", "yob"),
        "person", k = 2, sensitiveCol = Some("disease"), l = 2)
      .collect().map(r => (Option(r.getString(0)).getOrElse("∅"),
        r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5),
          r.getBoolean(6))).toMap
    assert(out(("a", 1980)) === ((4L, 3L, true, 2L, true)))
    assert(out(("b", 1990)) === ((1L, 1L, false, 1L, false)))
    assert(out(("∅", 1980)) === ((2L, 2L, true, 1L, false)))
    // the release rule is one anti-join on the failing classes — and it
    // MUST be null-safe (<=>): a plain equi-join can never match the
    // NULL-quasi class, silently releasing exactly the rows whose
    // missing quasi value is itself identifying (gotcha pinned in the
    // operator scaladoc)
    val failing = Cleaning.kAnonymityAudit(rows, Seq("city", "yob"),
        "person", k = 2, sensitiveCol = Some("disease"), l = 2)
      .filter(!$"k_anonymous" || !$"l_diverse")
      .select($"city".as("f_city"), $"yob".as("f_yob"))
    val released = rows.join(failing,
      $"city" <=> $"f_city" && $"yob" <=> $"f_yob", "left_anti")
    assert(released.count() === 4L) // only the (a,1980) class survives
    // the plain-equi-join mistake releases the NULL class too: 6 rows
    val leaky = rows.join(
      failing.withColumnRenamed("f_city", "city")
        .withColumnRenamed("f_yob", "yob"),
      Seq("city", "yob"), "left_anti")
    assert(leaky.count() === 6L)
    // without a sensitive column the l columns are absent
    val noL = Cleaning.kAnonymityAudit(rows, Seq("city"), "person", 2)
    assert(noL.columns.toSeq ===
      Seq("city", "n_rows", "n_units", "k_anonymous"))
  }
}
