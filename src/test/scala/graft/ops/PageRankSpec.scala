package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer fixed-point PageRank: hand-traced iterations on a tiny
  * graph, equivalence with a naive driver-side reference on a seeded
  * random graph, and partitioning independence (the determinism
  * contract: order-free integer sums + floor divisions only).
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference: same integer contract, computed locally. */
  private def naive(edges: Seq[(Long, Long, Long)], iters: Int,
                    scale: Long = 1000000L): Map[Long, Long] = {
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> scale).toMap
    val teleport = scale * 150L / 1000L
    for (_ <- 1 to iters) {
      // nodes without in-edges leave the rank table after one round
      // (inner join in rankFp); their out-edges then contribute nothing
      val contribs = edges.flatMap { case (s, d, w) =>
        r.get(s).map(rs => d -> (rs * 850L / 1000L * w / outw(s)))
      }
      r = contribs.groupBy(_._1).map { case (d, cs) =>
        d -> (teleport + cs.map(_._2).sum)
      }
    }
    r
  }

  test("one iteration on a hand-traced triangle") {
    // 1->2 (w2), 1->3 (w1), 2->3 (w1), 3->1 (w1); scale 1000.
    // outw: 1->3, 2->1, 3->1. r0 = 1000 each; damped = 850.
    // r1(2) = 150 + (850*2)/3 = 150 + 566 = 716
    // r1(3) = 150 + (850*1)/3 + 850/1 = 150 + 283 + 850 = 1283
    // r1(1) = 150 + 850/1 = 1000
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.rankFp(edges, iters = 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000L, 2L -> 716L, 3L -> 1283L))
  }

  test("matches the naive reference on a seeded random graph, 3 iters") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = (1 to 400).map { _ =>
      val s = rnd.nextInt(n).toLong
      var d = rnd.nextInt(n).toLong
      if (d == s) d = (d + 1) % n
      (s, d, 1L + rnd.nextInt(5).toLong)
    }.distinct
    val df = edges.toDF("src", "dst", "w")
    val got = PageRank.rankFp(df, iters = 3).as[(Long, Long)].collect().toMap
    val want = naive(edges, iters = 3)
    // rankFp emits nodes with >= 1 in-edge only
    val inNodes = edges.map(_._2).toSet
    assert(got.keySet == inNodes)
    assert(got == want.view.filterKeys(inNodes).toMap)
  }

  test("partitioning independence: 1 vs 13 partitions, identical ranks") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, 1L + rnd.nextInt(3).toLong)
    }.distinct.filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst", "w")
    val a = PageRank.rankFp(df.repartition(1), iters = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = PageRank.rankFp(df.repartition(13), iters = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("topK returns k rows ordered by (rank desc, node asc)") {
    val edges = PageRank.coTransactionEdges(spark, "/root/testdata/sf0.001")
    val top = PageRank.topK(spark, edges, iters = 2, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(top.size == 10)
    val resorted = top.sortBy { case (n, r) => (-r, n) }
    assert(top == resorted)
  }

  test("topK: driver tail and distributed tier agree (path equality)") {
    val edges = PageRank.coTransactionEdges(spark, "/root/testdata/sf0.001")
    val local = PageRank.topK(spark, edges, iters = 3, k = 25,
        localMaxEdges = Long.MaxValue)
      .as[(Long, Long)].collect().toSeq
    val dist = PageRank.topK(spark, edges, iters = 3, k = 25,
        localMaxEdges = 0L)
      .as[(Long, Long)].collect().toSeq
    assert(local == dist)
  }

  test("co-transaction graph is symmetric (every node has out-edges)") {
    val edges = PageRank.coTransactionEdges(spark, "/root/testdata/sf0.001")
    val srcs = edges.select("src").distinct().as[Long].collect().toSet
    val dsts = edges.select("dst").distinct().as[Long].collect().toSet
    assert(srcs == dsts)
  }
}
