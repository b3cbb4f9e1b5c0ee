package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.ops.Graph
import graft.oracle.OpsOracle
import org.apache.spark.sql.functions._

/** Link-graph operator checks: hand-computed integer PageRank on a tiny
  * graph, parity with the sequential oracle on a real doc sample, the
  * reliable-checkpoint mode, and partition invariance.
  */
class GraphSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .limit(40).cache()

  test("pageRank matches a hand-computed integer trace (dangling + fan-out)") {
    // 1→0, 2→0, 2→1, 3→1; node 0 dangling. Two iterations, worked by hand
    // from the integer contract (base 150000; floors throughout).
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(0L -> 2043905L, 1L -> 960155L, 2L -> 497968L, 3L -> 497968L)
  }

  test("linkEdges matches the sequential oracle derivation") {
    val seq = docs.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val expected = OpsOracle.linkEdgesSeq(seq)
    val got = Graph.linkEdges(docs).as[(Long, Long)].collect().toSeq.sorted
    got shouldBe expected
    // structural invariants of the derivation
    all(got.map(_._2)) should be >= 0L
    got.foreach { case (s, d) => d should be <= s }
  }

  test("pageRank parity with the sequential oracle; partition-invariant; mass bounded") {
    val seq = docs.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val nodes = docs.select($"doc_id")
    val edges = Graph.linkEdges(docs)
    val expected = OpsOracle.pageRankSeq(seq.map(_._1), OpsOracle.linkEdgesSeq(seq),
      iters = 4)
    val got = Graph.pageRank(nodes, edges, iters = 4)
      .as[(Long, Long)].collect().toSeq.sorted
    got shouldBe expected
    // repartitioning the edge table must not move a single micro-unit
    val got2 = Graph.pageRank(nodes.repartition(7), edges.repartition(5), iters = 4)
      .as[(Long, Long)].collect().toSeq.sorted
    got2 shouldBe expected
    // floors only ever LOSE mass: total stays within (0, N * initMicro]
    val total = got.map(_._2).sum
    total should be <= 40L * 1000000L
    total should be > 0L
  }

  test("pageRank reliable-checkpoint mode returns identical ranks") {
    val tmp = java.nio.file.Files.createTempDirectory("graph-ckpt").toString
    try {
      val nodes = docs.select($"doc_id")
      val edges = Graph.linkEdges(docs)
      val fast = Graph.pageRank(nodes, edges, iters = 3)
        .as[(Long, Long)].collect().toSeq.sorted
      val reliable = Graph.pageRank(nodes, edges, iters = 3,
        reliableCheckpointDir = Some(tmp))
        .as[(Long, Long)].collect().toSeq.sorted
      reliable shouldBe fast
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("trustrank concentrates mass on paths into the seed set (hand trace)") {
    // same tiny graph, seeds = {0}: base (150000·4 div 1 = 600000) and the
    // dangling pool land only on node 0; after 2 iterations only node 0
    // carries mass (nothing links INTO 1..3 from a ranked node).
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("doc_id")
    val r = Graph.pageRank(nodes, edges, iters = 2, seeds = Some(seeds))
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(0L -> 4000000L, 1L -> 0L, 2L -> 0L, 3L -> 0L)
  }

  test("trustrank parity with the sequential oracle; None == uniform contract") {
    val seq = docs.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val nodes = docs.select($"doc_id")
    val edges = Graph.linkEdges(docs)
    val seedIds = seq.map(_._1).filter(_ % 7 == 0)
    val expected = OpsOracle.pageRankSeq(seq.map(_._1), OpsOracle.linkEdgesSeq(seq),
      iters = 4, seeds = Some(seedIds.toSet))
    val got = Graph.pageRank(nodes, edges, iters = 4,
        seeds = Some(seedIds.toDF("doc_id")))
      .as[(Long, Long)].collect().toSeq.sorted
    got shouldBe expected
    // seeds=None must stay bit-identical to the uniform oracle contract
    Graph.pageRank(nodes, edges, iters = 4, seeds = None)
      .as[(Long, Long)].collect().toSeq.sorted shouldBe
      OpsOracle.pageRankSeq(seq.map(_._1), OpsOracle.linkEdgesSeq(seq), iters = 4)
  }

  test("hits matches a hand-computed integer trace") {
    // same tiny graph as the pageRank trace; M = 4e6. Round 1: in-sums
    // (2e6, 2e6, 0, 0) normalize to auths (2e6, 2e6, 0, 0); hub raws
    // (0, 2e6, 4e6, 2e6) normalize to (0, 1e6, 2e6, 1e6). Round 2 is a
    // fixed point (raw auths 3e6/3e6 rescale to the same 2e6/2e6).
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.hits(nodes, edges, iters = 2)
      .as[(Long, Long, Long)].collect().map { case (v, a, h) => v -> (a, h) }.toMap
    r shouldBe Map(0L -> (2000000L, 0L), 1L -> (2000000L, 1000000L),
      2L -> (0L, 2000000L), 3L -> (0L, 1000000L))
  }

  test("hits parity with the sequential oracle; partition-invariant; reliable ckpt") {
    val seq = docs.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val nodes = docs.select($"doc_id")
    val edges = Graph.linkEdges(docs)
    val expected = OpsOracle.hitsSeq(seq.map(_._1), OpsOracle.linkEdgesSeq(seq),
      iters = 3)
    val got = Graph.hits(nodes, edges, iters = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    got shouldBe expected
    // L1 contract: each normalized family's mass is within (0, N * initMicro]
    got.map(_._2).sum should be <= 40L * 1000000L
    got.map(_._3).sum should be <= 40L * 1000000L
    got.map(_._2).sum should be > 0L
    // repartitioning must not move a micro-unit; nor may the reliable path
    Graph.hits(nodes.repartition(7), edges.repartition(5), iters = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted shouldBe expected
    val tmp = java.nio.file.Files.createTempDirectory("hits-ckpt").toString
    try {
      Graph.hits(nodes, edges, iters = 3, reliableCheckpointDir = Some(tmp))
        .as[(Long, Long, Long)].collect().toSeq.sorted shouldBe expected
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("cocitation: shared-source pairs counted, hub sources capped out") {
    // s1,s2 → {a,b}; s3 → {a,b,c} (fanout 3 — dropped at maxFanout=2);
    // s4 → {b,c}
    val edges = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L), (13L, 2L), (13L, 3L)).toDF("src", "dst")
    val all = Graph.cocitation(edges, minShared = 1, maxFanout = 2)
      .as[(Long, Long, Long)].collect().toSet
    all shouldBe Set((1L, 2L, 2L), (2L, 3L, 1L))
    // threshold filters the singleton pair; uncapped, the hub adds (1,3)
    Graph.cocitation(edges, minShared = 2, maxFanout = 2)
      .as[(Long, Long, Long)].collect().toSet shouldBe Set((1L, 2L, 2L))
    Graph.cocitation(edges, minShared = 1, maxFanout = 3)
      .as[(Long, Long, Long)].collect().toSet shouldBe
      Set((1L, 2L, 3L), (2L, 3L, 2L), (1L, 3L, 1L))
  }

  test("coupling: shared-target pairs counted, hub targets capped out") {
    // 20 → {1,2,5}; 21 → {1,3,5}; 22 → {2,3}; every target has in-deg 2
    // except 9, linked by everyone (in-deg 3 — capped out at maxInDeg=2)
    val edges = Seq((20L, 1L), (20L, 2L), (20L, 5L), (21L, 1L), (21L, 3L),
      (21L, 5L), (22L, 2L), (22L, 3L), (20L, 9L), (21L, 9L), (22L, 9L))
      .toDF("src", "dst")
    Graph.coupling(edges, minShared = 1, maxInDeg = 2)
      .as[(Long, Long, Long)].collect().toSet shouldBe
      Set((20L, 21L, 2L), (20L, 22L, 1L), (21L, 22L, 1L))
    // threshold keeps only the {1,5}-sharing pair; raising the cap admits
    // the hub and every pair gains one shared target
    Graph.coupling(edges, minShared = 2, maxInDeg = 2)
      .as[(Long, Long, Long)].collect().toSet shouldBe Set((20L, 21L, 2L))
    Graph.coupling(edges, minShared = 1, maxInDeg = 3)
      .as[(Long, Long, Long)].collect().toSet shouldBe
      Set((20L, 21L, 3L), (20L, 22L, 2L), (21L, 22L, 2L))
  }

  test("resolveRedirects: hand-traced chains, log-round doubling, cycle guard") {
    // chain 5→3→1 and alias 4→1; 0,1,2 terminal
    val nodes = (0L to 5L).toDF("doc_id")
    val edges = Seq((5L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val r = Graph.resolveRedirects(nodes, edges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    r shouldBe Map(0L -> (0L, 0L), 1L -> (1L, 0L), 2L -> (2L, 0L),
      3L -> (1L, 1L), 4L -> (1L, 1L), 5L -> (1L, 2L))

    // a 9-hop chain settles (doubling: 4 rounds, not 9) with exact hop counts
    val chainNodes = (0L to 9L).toDF("doc_id")
    val chain = (1L to 9L).map(i => (i, i - 1)).toDF("src", "dst")
    val rc = Graph.resolveRedirects(chainNodes, chain)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    rc shouldBe (0L to 9L).map(i => i -> (0L, i)).toMap

    // partition invariance
    Graph.resolveRedirects(chainNodes.repartition(7), chain.repartition(5))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap shouldBe rc

    // a cyclic alias map must fail the round cap, not hang
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    an[IllegalStateException] should be thrownBy
      Graph.resolveRedirects(Seq(1L, 2L).toDF("doc_id"), cyc).collect()
  }

  test("redirectEdges: acyclic by construction; resolveRedirects terminal on sample") {
    val e = Graph.redirectEdges(docs).as[(Long, Long)].collect().toSeq
    e should not be empty
    e.foreach { case (s, d) => d should be < s } // strictly decreasing → acyclic
    val resolved = Graph.resolveRedirects(docs.select($"doc_id"),
      Graph.redirectEdges(docs)).cache()
    resolved.count() shouldBe 40L
    // every final target is terminal (not itself a redirect source)
    val srcs = e.map(_._1).toSet
    resolved.select($"final_id").as[Long].collect()
      .foreach(f => srcs should not contain f)
    // hops of a redirect doc is >= 1, of a terminal doc exactly 0
    resolved.as[(Long, Long, Long)].collect().foreach { case (v, f, h) =>
      if (srcs(v)) { h should be >= 1L; f should not be v }
      else { h shouldBe 0L; f shouldBe v }
    }
  }

  test("topAnchors: counts, top-k cut, deterministic tie-break") {
    val anchors = Seq(
      (10L, 1L, "spark"), (11L, 1L, "spark"), (12L, 1L, "query"),
      (13L, 1L, "query"), (14L, 1L, "agg"), (15L, 1L, "batch"),
      (10L, 2L, "scan")).toDF("src", "dst", "anchor")
    val got = Graph.topAnchors(anchors, k = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    // ties at n=2 and n=1 break by anchor text: query < spark, agg < batch
    got shouldBe Set((1L, "query", 2L, 1L), (1L, "spark", 2L, 2L),
      (1L, "agg", 1L, 3L), (2L, "scan", 1L, 1L))
  }

  test("anchorEdges: anchors are source tokens; dst derivation invariants") {
    val e = Graph.anchorEdges(docs).cache()
    e.count() should be > 0L
    val toks = docs.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(' ').toSet }.toMap
    e.as[(Long, Long, String)].collect().foreach { case (s, d, a) =>
      d should be <= s
      toks(s) should contain(a)
    }
  }

  test("anchorSpam: dominance share, tie toward lowest anchor, degree floor") {
    val anchors = Seq(
      // target 1: spark×4 of 5 mentions → 800‰, flagged
      (10L, 1L, "spark"), (11L, 1L, "spark"), (12L, 1L, "spark"),
      (13L, 1L, "spark"), (14L, 1L, "query"),
      // target 2: 2/2 uniform but below the degree floor → not flagged
      (10L, 2L, "scan"), (11L, 2L, "scan"),
      // target 3: tie 2-2 → top anchor is the lexicographically lowest
      (10L, 3L, "batch"), (11L, 3L, "batch"), (12L, 3L, "agg"), (13L, 3L, "agg"))
      .toDF("src", "dst", "anchor")
    val got = Graph.anchorSpam(anchors, minMentions = 3, minSharePm = 700)
      .as[(Long, Long, Long, String, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    got(1L) shouldBe ((5L, 4L, "spark", 800L, true))
    got(2L) shouldBe ((2L, 2L, "scan", 1000L, false))
    got(3L) shouldBe ((4L, 2L, "agg", 500L, false))
  }

  test("neighborhood2: hand-traced levels, d1 exclusion, live mid cap") {
    // 1→0, 2→1, 3→2, 2→0, 4→1: d1(0)={1,2}, d1(1)={2,4}, d1(2)={3}
    val nodes = (0L to 4L).toDF("doc_id")
    val edges = Seq((1L, 0L), (2L, 1L), (3L, 2L), (2L, 0L), (4L, 1L))
      .toDF("src", "dst")
    // uncapped: 2-hop(0) via mid 1: {2 (excl: ∈d1), 4} → {4}; via mid 2: {3}
    //           2-hop(1) via mid 2: {3}; 2-hop(2): none (3 has no inlinks)
    val un = Graph.neighborhood2(nodes, edges, maxMidIn = 64)
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    un shouldBe Map(0L -> (2L, 2L), 1L -> (2L, 1L), 2L -> (1L, 0L),
      3L -> (0L, 0L), 4L -> (0L, 0L))
    // maxMidIn=1 drops mids 0 and 1 (in-deg 2): 2-hop(0) keeps only mid 2
    val capped = Graph.neighborhood2(nodes, edges, maxMidIn = 1)
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    capped shouldBe Map(0L -> (2L, 1L), 1L -> (2L, 1L), 2L -> (1L, 0L),
      3L -> (0L, 0L), 4L -> (0L, 0L))
    // harmonic micro-units
    Graph.neighborhood2(nodes, edges).where($"doc_id" === 0L)
      .select($"harmonic_micro").as[Long].head() shouldBe 3000000L
  }

  test("degreeHistogram: bit-length buckets on a constructed degree table") {
    val degs = Seq((0L, 0L, 1L), (1L, 1L, 2L), (2L, 3L, 4L), (3L, 8L, 0L))
      .toDF("doc_id", "out_deg", "in_deg")
    val got = Graph.degreeHistogram(degs)
      .as[(String, Long, Long)].collect().toSet
    got shouldBe Set(
      ("out", 0L, 1L), ("out", 1L, 1L), ("out", 2L, 1L), ("out", 4L, 1L),
      ("in", 0L, 1L), ("in", 1L, 1L), ("in", 2L, 1L), ("in", 3L, 1L))
  }

  test("degreeStats sums match the edge count; absent directions are zero") {
    val nodes = docs.select($"doc_id")
    val edges = Graph.linkEdges(docs).cache()
    val nEdges = edges.count()
    val d = Graph.degreeStats(nodes, edges).cache()
    d.count() shouldBe 40L
    d.agg(sum($"out_deg")).as[Long].head() shouldBe nEdges
    d.agg(sum($"in_deg")).as[Long].head() shouldBe nEdges
    // doc 0 can only self-link (dst ∈ {0}), so it is always dangling
    d.where($"doc_id" === 0L).select($"out_deg").as[Long].head() shouldBe 0L
  }
}
