package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle/clustering stats on hand graphs with known answers, plus
  * the orientation invariant (counts are a graph property, so any
  * relabeling of node ids must not change them).
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def statsOf(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    val r = Triangles.stats(pairs).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("K4: 4 triangles, 12 wedges, clustering 1") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(statsOf(k4) == ((4L, 6L, 12L, 4L, 1000L)))
  }

  test("path a-b-c: one wedge, no triangle") {
    assert(statsOf(Seq((1L, 2L), (2L, 3L))) == ((3L, 2L, 1L, 0L, 0L)))
  }

  test("5-cycle: 5 wedges, no triangle") {
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(statsOf(c5) == ((5L, 5L, 5L, 0L, 0L)))
  }

  test("K4 minus one edge: 2 triangles, 8 wedges, clustering 750") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(statsOf(g) == ((4L, 5L, 8L, 2L, 750L)))
  }

  test("star K1,5: pure hub, wedges but no triangles") {
    val star = (2L to 6L).map(i => (1L, i))
    assert(statsOf(star) == ((6L, 5L, 10L, 0L, 0L)))
  }

  test("counts are invariant under node relabeling") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L), (4L, 5L))
    val relabeled = g.map { case (a, b) => (1000L - 7L * a, 1000L - 7L * b) }
    assert(statsOf(g) == statsOf(relabeled))
  }

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int) = {
    val pairs = edges.toDF("a", "b")
    Triangles.kCorePeel(pairs, k, rounds)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("kCorePeel: pendant chain peels round by round, core is stable") {
    // K3 {1,2,3} + chain 3-4-5: 2-core is the K3, reached in 2 rounds
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(peel(g, k = 2, rounds = 3) ==
      Seq((1, 4L, 4L), (2, 3L, 3L), (3, 3L, 3L)))
  }

  test("kCorePeel: k above max degree empties the graph, rows survive") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(peel(k4, k = 4, rounds = 2) == Seq((1, 0L, 0L), (2, 0L, 0L)))
    assert(peel(k4, k = 3, rounds = 2) == Seq((1, 4L, 6L), (2, 4L, 6L)))
  }

  test("stats: driver tail and distributed tier agree (path equality)") {
    val rnd = new scala.util.Random(7)
    val edges = (for {
      a <- 1 to 60; b <- (a + 1) to 60 if rnd.nextDouble() < 0.15
    } yield (a.toLong, b.toLong)).toDF("a", "b")
    val local = Triangles.stats(edges, localMaxEdges = Long.MaxValue)
      .collect().head.toSeq
    val dist = Triangles.stats(edges, localMaxEdges = 0L)
      .collect().head.toSeq
    assert(local == dist)
  }

  test("kCorePeel: driver tail and distributed tier agree (path equality)") {
    val rnd = new scala.util.Random(11)
    val edges = (for {
      a <- 1 to 80; b <- (a + 1) to 80 if rnd.nextDouble() < 0.08
    } yield (a.toLong, b.toLong)).toDF("a", "b")
    val local = Triangles.kCorePeel(edges, k = 3, rounds = 4,
        localMaxEdges = Long.MaxValue)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val dist = Triangles.kCorePeel(edges, k = 3, rounds = 4,
        localMaxEdges = 0L)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(local == dist)
  }

  test("triangle-heavy random graph matches the brute-force count") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for {
      a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.3
    } yield (a.toLong, b.toLong)).toSeq
    val es = edges.toSet
    val brute = (for {
      a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
      if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) && es((a.toLong, c.toLong))
    } yield 1).size.toLong
    val (_, ne, _, tri, _) = statsOf(edges)
    assert(ne == edges.size.toLong)
    assert(tri == brute)
  }
}
