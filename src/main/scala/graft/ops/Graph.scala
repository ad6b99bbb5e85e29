package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the clustering step of near-duplicate removal: LSH/Jaccard emits
  * duplicate PAIRS, but dropping one doc per pair over-deletes when
  * duplicates chain (A~B, B~C); the right unit is the connected
  * component, keeping one canonical doc per component.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum label
  * in its closed 1-hop neighborhood; fixpoint when no label changes.
  * Each round is one shuffle on node id (join + groupBy-min with
  * map-side partial aggregation), and rounds = graph diameter. Dup
  * clusters are near-cliques (diameter 2-3), so the loop runs ~3
  * rounds regardless of corpus size; for general high-diameter graphs
  * the two-phase large-star/small-star scheme (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) converges
  * in O(log^2 n) rounds and drops in here unchanged.
  *
  * Scale notes: `localCheckpoint` after every round truncates lineage —
  * without it the plan doubles per iteration and Catalyst analysis,
  * not the data, becomes the bottleneck. The convergence probe is a
  * `limit(1).count` on changed labels, so the per-round action cost is
  * bounded by the first changed partition, not a full scan.
  */
object Graph {

  /** @return (node, component) for every node appearing in `edges`;
    *         component = the minimum node id reachable from the node. */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val adj = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = adj.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbors = adj
        .join(labels, adj("b") === labels("node"))
        .select(adj("a").as("node"), col("lab"))
      val next = labels.union(viaNeighbors)
        .groupBy("node").agg(min("lab").as("lab"))
        .localCheckpoint(true)
      converged = next.as("n")
        .join(labels.as("o"), "node")
        .filter(col("n.lab") =!= col("o.lab"))
        .limit(1).count() == 0L
      labels = next
      i += 1
    }
    labels
  }
}
