package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

class GraphSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("connected components labels a chain by its minimum node") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs multi-round propagation),
    // separate pair 10-11, separate triangle 20-21-22
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("self-loops and duplicate edges are harmless") {
    import spark.implicits._
    val edges = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("large-star/small-star agrees with min-label propagation") {
    import spark.implicits._
    // chain + pair + triangle + self-loop: same fixture family as above
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 30L)).toDF("src", "dst")
    val star = Graph.connectedComponentsStar(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val prop = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(star == prop + (30L -> 30L) || star == prop) // prop includes 30 via self-loop
    assert(star(4L) == 1L && star(11L) == 10L && star(22L) == 20L)
  }

  test("large-star/small-star handles a 60-node chain (high diameter)") {
    import spark.implicits._
    val edges = (1L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.connectedComponentsStar(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 60 && got.values.forall(_ == 1L))
  }

  test("star variant matches propagation on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val star = Graph.connectedComponentsStar(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val prop = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("non-convergence within maxIter throws instead of returning wrong labels") {
    import spark.implicits._
    // a 10-node chain has diameter 9: 2 rounds of 1-hop propagation
    // cannot finish — the old behavior silently returned partial labels
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(edges, "src", "dst", maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    val e2 = intercept[IllegalStateException] {
      Graph.connectedComponentsStar(edges, "src", "dst", maxIter = 1).collect()
    }
    assert(e2.getMessage.contains("did not converge"))
  }

  test("triangle counting on a known graph") {
    import spark.implicits._
    // triangle 1-2-3; square 10-11-12-13 (no triangle); triangle 20-21-22
    // sharing edge with 20-22-23 => 2 triangles there; duplicate +
    // reversed edges must not double-count
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L), (20L, 23L))
      .toDF("src", "dst")
    val got = Graph.triangleCount(edges, "src", "dst")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((11L, 12L, 3L))) // 11 nodes, 12 distinct edges, 3 triangles
  }

  test("quantized PageRank: hub dominates a star, mass bounded, deterministic") {
    import spark.implicits._
    // undirected star: hub 0 <-> leaves 1..8, plus an isolated-ish pair 100<->101
    val half = (1L to 8L).map(i => (0L, i)) :+ (100L, 101L)
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val pr = Graph.pageRankQuantized(edges, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size == 11) // hub + 8 leaves + the detached pair
    // hub collects all leaf mass: strictly above every leaf and the pair
    assert((1L to 8L).forall(i => pr(0L) > pr(i)), s"hub not dominant: $pr")
    assert(pr(0L) > pr(100L))
    // leaves are symmetric -> identical ranks; so is the detached pair
    assert((1L to 8L).map(pr).toSet.size == 1)
    assert(pr(100L) == pr(101L))
    // integral truncation only loses mass: total <= SCALE
    assert(pr.values.sum <= Graph.PageRankScale)
    // exactly reproducible run-to-run (the oracle-exactness property)
    val pr2 = Graph.pageRankQuantized(edges, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == pr2)
  }
}
