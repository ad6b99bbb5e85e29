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
  * Rounds = graph diameter. Dup clusters are near-cliques (diameter
  * 2-3), so the loop runs ~3 rounds regardless of corpus size; for
  * general high-diameter graphs the two-phase large-star/small-star
  * scheme (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) converges in O(log^2 n) rounds and drops in here
  * unchanged.
  *
  * Per-round cost is ONE job with ONE shuffle: the adjacency is
  * hash-partitioned on its probe key once up front and self-loops are
  * folded in, so the propagation join needs no exchange on either side
  * (labels come out of the previous round's groupBy already hashed on
  * `node`), and only the post-join groupBy(node) exchanges. The old
  * label rides the self-loop contribution through the aggregation, so
  * convergence is a filter+limit probe over the round's checkpointed
  * in-memory result — no join, no shuffle, no lineage recompute.
  * `localCheckpoint` after every round truncates lineage; without it
  * the plan doubles per iteration and Catalyst analysis, not the data,
  * becomes the bottleneck.
  */
object Graph {

  /** @return (node, component) for every node appearing in `edges`;
    *         component = the minimum node id reachable from the node. */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // Materialize the edge list ONCE before fanning it out: it appears
    // twice in the symmetrization union and four times in the final
    // adjacency lineage, and Spark does not dedupe common subplans —
    // without this an expensive upstream (e.g. LSH candidate
    // generation) would execute 4x inside the adjacency job.
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint(true)
    val sym = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
    // Closed neighborhood: a self-loop per node makes each node's own
    // label a contribution of the propagation join, removing the
    // labels-union branch (and its extra scan) from the loop body.
    val adj = sym
      .union(sym.select(col("a"), col("a").as("b")))
      .distinct()
      .repartition(col("b"))
      .localCheckpoint(true)
    var labels = adj.filter(col("a") === col("b"))
      .select(col("a").as("node"), col("a").as("lab"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val contrib = adj.join(labels, adj("b") === labels("node"))
        .select(adj("a").as("node"), col("lab"),
          (adj("a") === adj("b")).as("self"))
      // Convergence probe RIDES the round's own materialization as an
      // observed metric (the localCheckpoint action runs under
      // withAction, so the metric fires with it) — previously a
      // separate filter+limit job per round.
      val obs = new org.apache.spark.sql.Observation()
      val next = contrib
        .groupBy("node")
        .agg(min("lab").as("lab"),
          max(when(col("self"), col("lab"))).as("old"))
        .observe(obs,
          count(when(col("lab") =!= col("old"), 1)).as("changed"))
        .localCheckpoint(true)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      labels = next.select("node", "lab")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); labels would be partially " +
          "propagated — raise maxIter or use connectedComponentsStar")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * rewrites (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): O(log² n) rounds instead of
    * O(diameter) — the scale path for high-diameter graphs (chains,
    * meshes) where 1-hop min-label propagation needs a round per hop.
    *
    * Edges stay oriented large→small throughout. Each phase is one
    * window-min shuffle plus a distinct:
    *  - large-star(x): every neighbor n > x re-attaches to
    *    min(Γ⁺(x)) — computed over the symmetrized edge list;
    *  - small-star(x): every out-neighbor (all < x) and x itself
    *    attach to min(out(x) ∪ {x}) — computed over the directed list.
    * Fixpoint: the edge set is exactly {(node, component-min)}; the
    * convergence probe is an except-limit over two checkpointed
    * rounds.
    *
    * @return (node, component) for every node appearing in `edges`.
    */
  def connectedComponentsStar(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Materialize the input ONCE: it fans out into the node list
    // (twice) and the canonicalized edge set, and Spark does not
    // dedupe common subplans — without this an expensive upstream
    // (LSH candidate generation) would execute three times.
    val input = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .localCheckpoint(true)
    // All nodes, including isolated-by-canonicalization ones (self
    // loops in the input), must appear in the output.
    val nodes = input.select(col("s").as("n")).union(input.select(col("d").as("n")))
      .distinct().localCheckpoint(true)
    var e = input
      .select(greatest(col("s"), col("d")).as("u"), least(col("s"), col("d")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var eCount = e.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val wSym = Window.partitionBy(col("u"))
      // No distinct after large: duplicate edges don't change small's
      // window-min and small dedupes its own output — one less shuffle
      // per alternation.
      val large = sym
        .withColumn("m", least(min(col("v")).over(wSym), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      val wDir = Window.partitionBy(col("u"))
      val withMin = large.withColumn("m", min(col("v")).over(wDir))
      // the round's cardinality rides its own materialization as an
      // observed metric — previously a separate count job per round
      val obs = new org.apache.spark.sql.Observation()
      val small = withMin.select(col("v").as("u"), col("m").as("v"))
        .union(withMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      // Both sides are distinct sets, so equal cardinality plus an
      // empty one-sided difference proves equality; the except runs
      // only once the edge set has stopped shrinking.
      val smallCount = obs.get("n").asInstanceOf[Long]
      converged = smallCount == eCount &&
        small.exceptAll(e).limit(1).count() == 0L
      e = small
      eCount = smallCount
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds; " +
          "the edge set was still changing — labels would be wrong. " +
          "Raise maxIter (rounds needed is O(log² n)).")
    nodes.join(e, nodes("n") === e("u"), "left")
      .select(nodes("n").as("node"), coalesce(col("v"), nodes("n")).as("lab"))
  }

  /** Exact triangle count over an undirected edge list — the classic
    * distributed graph-analytics primitive (clustering coefficient,
    * community density).
    *
    * Edges canonicalize to u < v, so each triangle {a < b < c} is
    * counted exactly once as the join (a,b) ⋈ (b,c) ⋈ (a,c). Two
    * shuffle joins; the first join's fan-out is Σ deg²(v) over
    * canonical orientation, which the u < v direction already bounds
    * (every vertex keeps only its higher neighbors — the standard
    * degree-ordering trick that caps fan-out at O(m^1.5) pairs). At
    * scale, hot vertices are handled by AQE skew splitting on the
    * `b`-join.
    *
    * @return one row: (n_nodes, n_edges, n_triangles). */
  def triangleCount(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // appears 3× below; materialize once
    val nNodes = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .distinct().count()
    val nEdges = e.count()
    val ab = e.select(col("u").as("a"), col("v").as("b"))
    val bc = e.select(col("u").as("b"), col("v").as("c"))
    val ac = e.select(col("u").as("a2"), col("v").as("c2"))
    val tri = ab.join(bc, "b")
      .join(ac, col("a") === col("a2") && col("c") === col("c2"))
      .count()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, tri)).toDF("n_nodes", "n_edges", "n_triangles")
  }

  /** Integer scale for [[pageRankQuantized]]: ranks are micro-units of
    * 1e-9 (a node's true rank ≈ pr / 1e9). */
  val PageRankScale: Long = 1000000000L

  /** PageRank with damping 0.85 over a fixed number of iterations, ALL
    * arithmetic in integer units of 1/[[PageRankScale]] with integral
    * division — so every iteration is exactly reproducible across
    * engines and partitionings (long sums are order-independent; the
    * usual double-valued PageRank is not, which is why it can't carry a
    * zero-tolerance oracle). Quantization truncates ≤1 unit (1e-9) per
    * division — far below any ranking-relevant gap after the standard
    * 10 iterations.
    *
    * Per iteration: contributions = one equi-join of edges against the
    * previous ranks (both sides hash on `src`) + a groupBy(dst) with
    * map-side partial sums — the textbook scale shape. Dangling-node
    * mass is dropped, not redistributed (documented choice; the oracle
    * replays it). `localCheckpoint` per round truncates lineage exactly
    * as [[connectedComponents]] does.
    *
    * @param edges directed (src -> dst); symmetrize first for an
    *              undirected graph
    * @return (node, pr) for every node appearing in `edges` */
  def pageRankQuantized(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1,100], got $iters")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    // node count rides the node set's own materialization (one job)
    val obsN = new org.apache.spark.sql.Observation()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .observe(obsN, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val n = obsN.get("n").asInstanceOf[Long]
    require(n > 0, "pageRank needs a non-empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = (PageRankScale * 15L) / (100L * n)
    var pr = nodes.withColumn("pr", lit(PageRankScale / n))
    for (i <- 1 to iters) {
      val sums = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(coalesce(s, cast(0 as bigint)) * 85) div 100")).as("pr"))
      // lineage/plan-depth cut every 3rd iteration instead of every
      // iteration: each eager localCheckpoint is a full blocking job,
      // and 10 of them cost more wall-clock than the deeper 3-iteration
      // plan segments they avoid (measured ~25% off the query; integer
      // ranks make the cadence value-invisible — the oracle pins that).
      // The LAST iteration always checkpoints so callers get a
      // shallow-plan result.
      if (i % 3 == 0 || i == iters) pr = pr.localCheckpoint(true)
    }
    pr
  }
}
