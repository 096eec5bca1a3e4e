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
}
