package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the peeling and resize kernels: k-core
  * must agree with a local reference peeler on arbitrary random graphs
  * (and reach a true fixpoint — every surviving degree ≥ k), and
  * nearest-neighbor resize must place exactly the source pixel the
  * integer mapping names at every output coordinate.
  */
class GraphPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("graph-property-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Local reference: synchronous peel to the fixpoint. */
  private def refKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    var changed = true
    while (changed) {
      val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = und.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != und
      und = next
    }
    und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  private val genGraph = for {
    n <- Gen.choose(2, 14) // node universe
    m <- Gen.choose(1, 30)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (a, b))
    k <- Gen.choose(1, 4)
  } yield (es, k)

  test("kCore equals the local fixpoint peeler on random graphs (rounds budget respected)") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genGraph) { case (es, k) =>
      val expect = refKCore(es.toSet, k)
      // 16 rounds >> fixpoint depth for a ≤14-node graph
      val got = Graph.kCore(es.toDF("src", "dst"), "src", "dst", k, rounds = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val fixpoint = got.values.forall(_ >= k)
      got == expect && fixpoint
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local reference: synchronous support peel to the fixpoint; returns
    * each surviving canonical edge with its final support. */
  private def refKTruss(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Int] = {
    var und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    def supports(e: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val nbrs = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      e.iterator.map { case (a, b) =>
        (a, b) -> (nbrs(a) & nbrs(b)).size
      }.toMap
    }
    var changed = true
    while (changed) {
      val sup = supports(und)
      val next = und.filter(sup(_) >= k - 2)
      changed = next != und
      und = next
    }
    supports(und)
  }

  test("kTruss equals the local fixpoint support peeler on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      k <- Gen.choose(3, 5)
    } yield (es, k)
    val prop = Prop.forAll(gen) { case (es, k) =>
      val expect = refKTruss(es.toSet, k)
      // 16 rounds >> fixpoint depth for a <=14-node graph
      val got = Graph.kTruss(es.toDF("src", "dst"), "src", "dst", k, rounds = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
      val fixpoint = got.values.forall(_ >= k - 2)
      got == expect && fixpoint
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  private val genWeightedDigraph = for {
    n <- Gen.choose(2, 9)
    m <- Gen.choose(1, 22)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L)
      w <- Gen.choose(1L, 9L)
    } yield (a, b, w))
  } yield es

  /** Local reference: Bellman–Ford to the fixpoint (≤ n−1 relaxations). */
  private def refSssp(edges: Seq[(Long, Long, Long)], source: Long): Map[Long, Long] = {
    var dist = Map(source -> 0L)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b, w) =>
        dist.get(a).foreach { da =>
          if (dist.get(b).forall(_ > da + w)) { dist += b -> (da + w); changed = true }
        }
      }
    }
    dist
  }

  test("ssspBellmanFord equals the local fixpoint reference when rounds >= n-1") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genWeightedDigraph) { es =>
      val expect = refSssp(es, source = 0L)
      val got = Graph.ssspBellmanFord(es.toDF("src", "dst", "w"),
          "src", "dst", "w", source = 0L, rounds = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local reference: Adamic–Adar with the operator's decimal discipline
    * (each 1/ln(deg) addend quantized to 12 decimals, sum rounded to 6). */
  private def refAdamicAdar(edges: Set[(Long, Long)]): Map[(Long, Long), Double] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = for {
      (u, nu) <- nbrs.toSeq
      (v, nv) <- nbrs.toSeq
      if u < v && !und((u, v))
      commons = nu & nv
      if commons.nonEmpty
    } yield {
      val s = commons.toSeq.map { w =>
        java.math.BigDecimal.valueOf(1.0 / math.log(nbrs(w).size.toDouble))
          .setScale(12, java.math.RoundingMode.HALF_UP)
      }.reduce(_ add _)
      (u, v) -> java.math.BigDecimal.valueOf(s.doubleValue())
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    out.toMap
  }

  test("adamicAdar equals the local brute reference on random graphs (uncapped)") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genGraph) { case (es, _) =>
      val expect = refAdamicAdar(es.toSet)
      val got = Graph.adamicAdar(es.toDF("src", "dst"),
          "src", "dst", topN = 10000, degCap = 10000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("nodeJaccard equals the local brute reference on random graphs (uncapped)") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genGraph) { case (es, _) =>
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expect = (for {
        (u, nu) <- nbrs.toSeq
        (v, nv) <- nbrs.toSeq
        if u < v && !und((u, v))
        common = (nu & nv).size
        if common > 0
      } yield (u, v) -> common.toDouble / (nu.size + nv.size - common)).toMap
      val got = Graph.nodeJaccard(es.toDF("src", "dst"),
          "src", "dst", topN = 10000, degCap = 10000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  private val genResize = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 12)
    c <- Gen.oneOf(1, 3)
    ow <- Gen.choose(1, 15)
    oh <- Gen.choose(1, 15)
  } yield (w, h, c, ow, oh)

  test("resizeNearest places exactly the mapped source pixel at every output coordinate") {
    val prop = Prop.forAll(genResize) { case (w, h, c, ow, oh) =>
      val px = Array.tabulate[Byte](w * h * c)(i => (i * 37 + 11).toByte)
      val out = Multimodal.resizeNearest(px, w, h, c, ow, oh)
      out.length == ow * oh * c &&
        (0 until oh).forall { y =>
          val sy = (y.toLong * h / oh).toInt
          (0 until ow).forall { x =>
            val sx = (x.toLong * w / ow).toInt
            (0 until c).forall { ch =>
              out((y * ow + x) * c + ch) == px((sy * w + sx) * c + ch)
            }
          }
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local reference: the exact synchronous parity-scheduled local-move
    * rule — integer score 2m·k_uc − deg·tot' in BigInt, ties to the
    * smaller community id, only `node % 2 == round % 2` nodes move. */
  private def refLouvain(edges: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    if (und.isEmpty) return Map.empty
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val m = und.size.toLong
    var lab: Map[Long, Long] = adj.keySet.map(n => n -> n).toMap
    for (i <- 1 to rounds) {
      val tot: Map[Long, Long] = lab.toSeq.groupBy(_._2)
        .view.mapValues(_.map(x => deg(x._1)).sum).toMap
      lab = lab.map { case (u, cur) =>
        if (u % 2 != i % 2) u -> cur
        else {
          val kuc: Map[Long, Long] = adj(u).map(lab).groupBy(identity)
            .view.mapValues(_.size.toLong).toMap
          val stay = (cur, BigInt(2 * m) * BigInt(kuc.getOrElse(cur, 0L)) -
            BigInt(deg(u)) * BigInt(tot(cur) - deg(u)))
          val moves = kuc.keys.filter(_ != cur).toSeq.map { c =>
            (c, BigInt(2 * m) * BigInt(kuc(c)) - BigInt(deg(u)) * BigInt(tot(c)))
          }
          u -> (stay +: moves).minBy { case (c, s) => (-s, c) }._1
        }
      }
    }
    lab
  }

  test("louvainMove equals the local parity-scheduled reference on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      r <- Gen.choose(1, 4)
    } yield (es, r)
    val prop = Prop.forAll(gen) { case (es, r) =>
      val expect = refLouvain(es.toSet, r)
      if (expect.isEmpty) true // all self-loops: operator requires no rows
      else {
        val got = Graph.louvainMove(es.toDF("src", "dst"), "src", "dst", r)
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
        got == expect
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local reference for the two-pass Louvain: phase 1 via
    * [[refLouvain]], then an exact weighted coarse replay (BigInt
    * scores, self-loops twice in degree, parity schedule on super-node
    * ids) and the projection. */
  private def refLouvainTwoPass(edges: Set[(Long, Long)], r1: Int,
      r2: Int): Map[Long, Long] = {
    val l1 = refLouvain(edges, r1)
    if (l1.isEmpty) return Map.empty
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    val ce: Map[(Long, Long), Long] = und.toSeq.groupBy { case (a, b) =>
        val (ca, cb) = (l1(a), l1(b)); (math.min(ca, cb), math.max(ca, cb))
      }.view.mapValues(_.size.toLong).toMap
    val m = und.size.toLong
    val nodes2 = l1.values.toSet
    val selfw = ce.collect { case ((a, b), w) if a == b => a -> w }
    val adj2: Map[Long, Seq[(Long, Long)]] = ce.toSeq
      .collect { case ((a, b), w) if a != b => Seq(a -> (b, w), b -> (a, w)) }
      .flatten.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg2: Map[Long, Long] = nodes2.map { n =>
      n -> (adj2.getOrElse(n, Seq()).map(_._2).sum +
        2 * selfw.getOrElse(n, 0L))
    }.toMap
    var lab: Map[Long, Long] = nodes2.map(n => n -> n).toMap
    for (i <- 1 to r2) {
      val tot = lab.toSeq.groupBy(_._2)
        .view.mapValues(_.map(x => deg2(x._1)).sum).toMap
      lab = lab.map { case (u, cur) =>
        if (u % 2 != i % 2) u -> cur
        else {
          val kuc = adj2.getOrElse(u, Seq()).groupBy { case (v, _) => lab(v) }
            .view.mapValues(_.map(_._2).sum).toMap
          val stay = (cur, BigInt(2 * m) * BigInt(kuc.getOrElse(cur, 0L)) -
            BigInt(deg2(u)) * BigInt(tot(cur) - deg2(u)))
          val moves = kuc.keys.filter(_ != cur).toSeq.map { c =>
            (c, BigInt(2 * m) * BigInt(kuc(c)) - BigInt(deg2(u)) * BigInt(tot(c)))
          }
          u -> (stay +: moves).minBy { case (c, s) => (-s, c) }._1
        }
      }
    }
    l1.map { case (n, c) => n -> lab(c) }
  }

  test("louvainTwoPass equals the local coarsened reference on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      r1 <- Gen.choose(1, 3)
      r2 <- Gen.choose(1, 3)
    } yield (es, r1, r2)
    val prop = Prop.forAll(gen) { case (es, r1, r2) =>
      val expect = refLouvainTwoPass(es.toSet, r1, r2)
      if (expect.isEmpty) true
      else {
        val got = Graph.louvainTwoPass(es.toDF("src", "dst"), "src", "dst",
            r1, r2)
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
        got == expect
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local reference: replay the seeded-mix walk rule step by step. */
  private def refWalks(edges: Set[(Long, Long)], walks: Int, len: Int,
      seed: Long): Set[(Long, Long, Long, Long)] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    for (start <- adj.keys; wk <- 0L until walks.toLong) {
      var cur = start
      out += ((start, wk, 0L, cur))
      var t = 1
      var alive = true
      while (t <= len && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val h = (1000003L * (cur % 1048573L) + 10007L * t +
              100003L * (((start % 1048573L) * 31L + wk) % 1048573L) +
              seed % 2147483647L) % 2147483647L
            cur = nbrs((h % nbrs.size).toInt)
            out += ((start, wk, t.toLong, cur))
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }

  /** Local reference: node2vec's weighted choice — exact cumulative
    * integer ranges over neighbors ranked by id, seeded mix mod total. */
  private def refN2vWalks(edges: Set[(Long, Long)], walks: Int, len: Int,
      seed: Long, wr: Long, wc: Long, wf: Long): Set[(Long, Long, Long, Long)] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    for (start <- adj.keys; wk <- 0L until walks.toLong) {
      var prev = start
      var cur = start
      out += ((start, wk, 0L, cur))
      var t = 1
      var alive = true
      while (t <= len && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val ws = nbrs.map { x =>
              if (x == prev) wr
              else if (edges.contains((prev, x))) wc else wf
            }
            val tot = ws.sum
            val h = (1000003L * (cur % 1048573L) + 10007L * t +
              100003L * (((start % 1048573L) * 31L + wk) % 1048573L) +
              seed % 2147483647L) % 2147483647L
            val r = h % tot
            var idx = 0
            var cum = 0L
            while (cum + ws(idx) <= r) { cum += ws(idx); idx += 1 }
            prev = cur
            cur = nbrs(idx)
            out += ((start, wk, t.toLong, cur))
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }

  test("node2vecWalks equals the local weighted-range replay on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      w <- Gen.choose(1, 2)
      l <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 1000L)
      wr <- Gen.choose(1, 5)
      wc <- Gen.choose(1, 5)
      wf <- Gen.choose(1, 5)
    } yield (es, w, l, seed, wr, wc, wf)
    val prop = Prop.forAll(gen) { case (es, w, l, seed, wr, wc, wf) =>
      val expect = refN2vWalks(es.toSet, w, l, seed, wr, wc, wf)
      val got = Graph.node2vecWalks(es.toDF("src", "dst"), "src", "dst",
          w, l, seed, wr, wc, wf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("randomWalks equals the local seeded-mix replay on random directed graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      w <- Gen.choose(1, 3)
      l <- Gen.choose(1, 5)
      seed <- Gen.choose(0L, 1000L)
    } yield (es, w, l, seed)
    val prop = Prop.forAll(gen) { case (es, w, l, seed) =>
      val dedup = es.toSet
      val expect = refWalks(dedup, w, l, seed)
      val got = Graph.randomWalks(es.toDF("src", "dst"), "src", "dst", w, l, seed)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local Luby replay: same md5-string priorities, same
    * strict-beats-all-undecided-neighbors rounds. */
  private def refLubyMis(edges: Set[(Long, Long)], rounds: Int): Set[Long] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    val adj = (und ++ und.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val prio = adj.keySet.map(n => n -> md5hex(n.toString)).toMap
    var undec = adj.keySet
    val mis = scala.collection.mutable.Set.empty[Long]
    for (_ <- 1 to rounds) {
      val winners = undec.filter { n =>
        val nbrs = adj(n).filter(undec)
        nbrs.isEmpty || nbrs.forall(m => prio(n) > prio(m))
      }
      val knocked = winners.flatMap(adj(_))
      mis ++= winners
      undec = undec -- winners -- knocked
    }
    mis.toSet
  }

  test("lubyMis equals the local tournament replay, is independent, and drains to maximality") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genGraph) { case (es, _) =>
      val clean: Set[(Long, Long)] = es.toSet.filter(p => p._1 != p._2)
      val got = Graph.lubyMis(es.toDF("src", "dst"), "src", "dst", rounds = 10)
        .collect().map(_.getLong(0)).toSet
      val expect = refLubyMis(es.toSet, 10)
      val und = clean.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val adjacentInside = und.exists { case (a, b) => got(a) && got(b) }
      // maximality: every non-member node with an edge has a member nbr
      val nodes = und.flatMap { case (a, b) => Seq(a, b) }
      val maximal = nodes.forall { n =>
        got(n) || und.exists { case (a, b) =>
          (a == n && got(b)) || (b == n && got(a))
        }
      }
      got == expect && !adjacentInside && maximal
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Brute clustering-coefficient reference: enumerate triangles and
    * wedges directly, mirror the operator's decimal-addend local mean. */
  private def refClustering(edges: Set[(Long, Long)]): Option[(Long, Long, Double, Double)] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    if (und.isEmpty) return None
    val adj = (und ++ und.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val t = nodes.map { v =>
      val nb = adj(v).toSeq
      v -> nb.combinations(2).count { case Seq(x, y) => adj(x)(y) }.toLong
    }.toMap
    val w = nodes.map(v => v -> adj(v).size.toLong * (adj(v).size - 1) / 2).toMap
    val tsum = t.values.sum; val wsum = w.values.sum
    val global =
      if (wsum > 0)
        java.math.BigDecimal.valueOf(tsum.toDouble / wsum.toDouble)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      else Double.NaN
    val withW = nodes.filter(w(_) > 0)
    val local =
      if (withW.isEmpty) Double.NaN
      else {
        val lsum = withW.toSeq.map(v => BigDecimal(t(v).toDouble / w(v).toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        java.math.BigDecimal.valueOf(lsum.toDouble / withW.size.toDouble)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    Some((tsum, wsum, global, local))
  }

  test("clusteringCoefficients equals the brute triangle/wedge reference on random graphs") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genGraph) { case (es, _) =>
      val clean = es.filter(p => p._1 != p._2)
      val r = Graph.clusteringCoefficients(es.toDF("src", "dst"), "src", "dst")
        .collect().head
      refClustering(es.toSet) match {
        case None => clean.isEmpty || (r.getLong(2) == 0L)
        case Some((tsum, wsum, g, l)) =>
          r.getLong(2) == tsum && r.getLong(3) == wsum &&
            (if (wsum > 0) r.getDouble(4) == g else r.isNullAt(4)) &&
            (if (!l.isNaN) r.getDouble(5) == l else r.isNullAt(5))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  /** Exact-rational assortativity reference: r = (4mA − B²)/(2mC − B²)
    * over BigInt sums, then the operator's double division. */
  private def refAssortativity(edges: Set[(Long, Long)]): Option[(Long, Option[Double])] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    if (und.isEmpty) return None
    val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = BigInt(und.size)
    val A = und.toSeq.map { case (a, b) => BigInt(deg(a)) * deg(b) }.sum
    val B = und.toSeq.map { case (a, b) => BigInt(deg(a) + deg(b)) }.sum
    val C = und.toSeq.map { case (a, b) =>
      BigInt(deg(a)) * deg(a) + BigInt(deg(b)) * deg(b) }.sum
    val num = 4 * m * A - B * B
    val den = 2 * m * C - B * B
    val r =
      if (den == 0) None
      else Some(java.math.BigDecimal
        .valueOf(num.toDouble / den.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    Some((und.size.toLong, r))
  }

  test("degreeAssortativity equals the exact-rational reference on random graphs") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genGraph) { case (es, _) =>
      val row = Graph.degreeAssortativity(es.toDF("src", "dst"), "src", "dst")
        .collect().head
      refAssortativity(es.toSet) match {
        case None => row.getLong(0) == 0L && row.isNullAt(1)
        case Some((m, None)) => row.getLong(0) == m && row.isNullAt(1)
        case Some((m, Some(r))) => row.getLong(0) == m && row.getDouble(1) == r
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  /** Truncated-BFS harmonic reference mirroring the operator's decimal
    * 1/d addends. */
  private def refHarmonic(edges: Set[(Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Double] = {
    val e = edges.filter { case (a, b) => a != b }
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val totals = scala.collection.mutable.Map[Long, BigDecimal]()
    for (s <- sources.distinct) {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      for (t <- 1 to rounds) {
        val nf = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(dist.contains)
        nf.foreach(v => dist(v) = t)
        frontier = nf
      }
      for ((v, d) <- dist if d > 0)
        totals(v) = totals.getOrElse(v, BigDecimal(0)) +
          BigDecimal(1.0 / d.toDouble)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    totals.map { case (v, x) =>
      v -> java.math.BigDecimal.valueOf(x.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }.toMap
  }

  test("harmonicCentrality equals the truncated-BFS reference on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      r <- Gen.choose(1, 5)
      nSrc <- Gen.choose(1, 3)
      srcs <- Gen.listOfN(nSrc, Gen.choose(0L, 13L))
    } yield (es, r, srcs)
    val prop = Prop.forAll(gen) { case (es, r, srcs) =>
      val got = Graph.harmonicCentrality(es.toDF("src", "dst"), "src", "dst",
          srcs.toDF("source"), r)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      got == refHarmonic(es.toSet, srcs, r)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Local Brandes reference, truncated at `rounds` BFS levels, with
    * the operator's exact decimal-addend arithmetic: each dependency
    * addend is one IEEE expression rounded to 12 decimals HALF_UP
    * before summation (partition-order-free by construction). */
  private def refBetweenness(edges: Set[(Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Double] = {
    val e = edges.filter { case (a, b) => a != b }
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val radj = e.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val totals = scala.collection.mutable.Map[Long, BigDecimal]()
    for (s <- sources.distinct) {
      val depth = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> BigInt(1))
      var frontier = Set(s)
      for (t <- 1 to rounds) {
        val cand = scala.collection.mutable.Map[Long, BigInt]()
          .withDefaultValue(BigInt(0))
        for (u <- frontier; v <- adj.getOrElse(u, Nil)) cand(v) += sigma(u)
        val nf = cand.keySet.filterNot(depth.contains).toSet
        for (v <- nf) { depth(v) = t; sigma(v) = cand(v) }
        frontier = nf
      }
      val delta = scala.collection.mutable.Map[Long, BigDecimal]()
        .withDefaultValue(BigDecimal(0))
      for (d <- rounds to 1 by -1) {
        val upd = scala.collection.mutable.Map[Long, BigDecimal]()
          .withDefaultValue(BigDecimal(0))
        for (w <- depth.collect { case (n, dd) if dd == d => n };
             p <- radj.getOrElse(w, Nil) if depth.get(p).contains(d - 1)) {
          val add = sigma(p).toDouble * (1.0 + delta(w).toDouble) /
            sigma(w).toDouble
          upd(p) += BigDecimal(add)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        for ((p, a) <- upd) delta(p) += a
      }
      for ((n, _) <- depth if n != s)
        totals(n) = totals.getOrElse(n, BigDecimal(0)) + delta(n)
    }
    // mirror the operator's final expression exactly: the DECIMAL total
    // is cast to DOUBLE first, then round(·, 6) (Spark's double round =
    // BigDecimal.valueOf(d).setScale(6, HALF_UP))
    totals.map { case (n, v) =>
      n -> java.math.BigDecimal.valueOf(v.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }.toMap
  }

  /** Local HyperBall reference replaying the operator's register
    * derivation and estimator arithmetic exactly (md5 hex string ops,
    * integer max-merge, exact-integer denominator, the same final IEEE
    * expression). */
  private def refHyperBall(edges: Set[(Long, Long)],
      rounds: Int): Map[Long, Double] = {
    val e = edges.filter { case (a, b) => a != b }
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val reg = nodes.map { n =>
      val h = md5hex(n.toString)
      val bucket = Integer.parseInt(h.substring(0, 1), 16)
      val pay = h.substring(1, 16)
      val zh = pay.takeWhile(_ == '0').length
      val extra =
        if (zh >= pay.length) 0
        else pay.charAt(zh) match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
      n -> (bucket, zh * 4 + extra + 1)
    }.toMap
    val outAdj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var sk: Map[Long, Map[Int, Int]] =
      nodes.map(n => n -> Map(reg(n)._1 -> reg(n)._2)).toMap
    for (_ <- 1 to rounds) {
      sk = sk.map { case (n, own) =>
        val merged = (own.toSeq ++
          outAdj.getOrElse(n, Nil).flatMap(d => sk(d).toSeq))
          .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        n -> merged
      }
    }
    sk.map { case (n, m) =>
      val present = m.size
      val psum = m.values.map(r => BigInt(1) << (61 - r)).sum
      val denom = psum + BigInt(16 - present) * (BigInt(1) << 61)
      val est =
        if (present < 16) 16.0 * math.log(16.0 / (16 - present).toDouble)
        else 0.673 * 256.0 * 2305843009213693952.0 / denom.toDouble
      n -> java.math.BigDecimal.valueOf(est)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }

  test("hyperBallReach equals the local register replay on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      r <- Gen.choose(1, 4)
    } yield (es, r)
    val prop = Prop.forAll(gen) { case (es, r) =>
      val expect = refHyperBall(es.toSet, r)
      val got = Graph.hyperBallReach(es.toDF("src", "dst"), "src", "dst", r)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("betweenness equals the local truncated-Brandes reference on random graphs") {
    val sp = spark; import sp.implicits._
    val gen = for {
      (es, _) <- genGraph
      r <- Gen.choose(1, 4)
      nSrc <- Gen.choose(1, 3)
      srcs <- Gen.listOfN(nSrc, Gen.choose(0L, 13L))
    } yield (es, r, srcs)
    val prop = Prop.forAll(gen) { case (es, r, srcs) =>
      val expect = refBetweenness(es.toSet, srcs, r)
      val got = Graph.betweenness(es.toDF("src", "dst"), "src", "dst",
          srcs.toDF("source"), r)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
