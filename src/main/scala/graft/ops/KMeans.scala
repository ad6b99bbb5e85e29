package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lloyd's k-means over an embedding column — the "production
  * coarse-quantizer fit" the IVF path ([[Similarity.ivfTopK]]) is
  * parameterized by.
  *
  * Scale shape per iteration:
  *  - cell assignment is [[Similarity.nearestCell]]'s scan-side argmax
  *    over the broadcast centroid array — NO shuffle of the corpus;
  *  - the per-(cell, dim) sufficient statistics go through ONE
  *    partial-aggregated shuffle whose post-map volume is at most
  *    #partitions × k × dims rows (the posexplode happens before the
  *    map-side combine, so the dims×rows explosion never crosses the
  *    wire);
  *  - the new means are k×dims values — driver-sized, exactly what the
  *    next iteration's broadcast needs. Because [[Similarity.nearestCell]]
  *    collects its centroid frame at plan-build time, each iteration
  *    runs as one independent job: no lineage growth, no checkpointing.
  *
  * Sums use decimal accumulation (order-independent, exact) so results
  * are reproducible across partitionings and engines.
  */
object KMeans {

  /** Per-(cell, dim) sufficient statistics after nearest-centroid
    * assignment: decimal-exact value sum (`s`, as double) and member
    * count (`n`). This is the shuffle stage of one Lloyd iteration and
    * the oracle-checked gate surface. */
  def assignStats(corpus: DataFrame, centroids: DataFrame, scale: Int = 8): DataFrame =
    Similarity.nearestCell(corpus, centroids)
      .select(col("cell"), posexplode(col("embedding")))
      .withColumnRenamed("col", "v")
      .groupBy(col("cell"), col("pos"))
      .agg(
        // widen float -> double BEFORE the decimal round: engines
        // disagree on direct float->decimal (DuckDB truncates the
        // 7-digit float repr; Spark rounds the widened double) — the
        // double path rounds identically everywhere
        sum(col("v").cast(DoubleType).cast(DecimalType(28, scale)))
          .cast(DoubleType).as("s"),
        count(lit(1)).as("n"))

  /** One Lloyd step: new centroid = element-wise mean of the cell's
    * members; a cell that captured no points keeps its previous
    * centroid (the standard empty-cluster fallback). Returns
    * (cid, embedding) shaped exactly like the input centroids. */
  def step(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val means = assignStats(corpus, centroids)
      .withColumn("m", (col("s") / col("n")).cast(FloatType))
      .groupBy(col("cell").as("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("next"))
    centroids.select(col("cid"), col("embedding").as("prev"))
      .join(means, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("next"), col("prev")).as("embedding"))
  }

  /** Full fit: deterministic init (the k lowest-`idCol` rows, cid
    * 0..k-1), then `iters` Lloyd steps. Returns (cid, embedding) as a
    * LOCAL (driver-materialized) frame.
    *
    * Each step's k×dims result is collected and re-created as a local
    * DataFrame before the next step: [[step]]'s empty-cell fallback is a
    * `coalesce(next, prev)` join that keeps the previous centroid frame
    * in lineage, and without the cut iteration i would re-execute every
    * prior iteration's corpus scan when [[Similarity.nearestCell]]
    * collects its centroids — O(iters²) corpus scans. The collect moves
    * exactly the k×dims values the next broadcast needs anyway. */
  def fit(corpus: DataFrame, k: Int, iters: Int, idCol: String = "id"): DataFrame = {
    // each iteration collects k×dims values to the driver (localize) and
    // broadcasts them back (nearestCell) — k must stay quantizer-sized
    require(k > 0 && k <= Similarity.MaxCollectedCentroids,
      s"k-means fit localizes k centroids per iteration; k=$k is outside " +
      s"(0, ${Similarity.MaxCollectedCentroids}] — a coarse quantizer is at " +
      s"most a few thousand cells")
    val spark = corpus.sparkSession
    val w = Window.orderBy(col(idCol))
    // the k seed rows collapse to one task — k is small by definition
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .withColumn("cid", row_number().over(w).cast(LongType) - 1)
      .select(col("cid"), col("embedding"))
    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
    var i = 0
    while (i < iters) { centroids = localize(step(corpus, centroids)); i += 1 }
    if (iters > 0) centroids else localize(centroids)
  }
}
