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
}
