package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.KMeans

class KMeansSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("fit recovers two well-separated clusters") {
    import spark.implicits._
    // cluster A around (1, 0), cluster B around (0, 1); seeds (rows 0
    // and 1) start one in each cluster
    val corpus = (Seq(
      (0L, vec(1.0, 0.1)), (2L, vec(0.9, 0.0)), (4L, vec(1.1, 0.1)), (6L, vec(0.95, 0.05)),
      (1L, vec(0.1, 1.0)), (3L, vec(0.0, 0.9)), (5L, vec(0.1, 1.1)), (7L, vec(0.05, 0.95))
    )).toDF("id", "embedding")
    val fitted = KMeans.fit(corpus, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(fitted.keySet == Set(0L, 1L))
    val c0 = fitted(0L); val c1 = fitted(1L)
    // centroid 0 ends in cluster A's corner, centroid 1 in B's
    assert(c0(0) > 0.8f && c0(1) < 0.2f, s"c0=$c0")
    assert(c1(0) < 0.2f && c1(1) > 0.8f, s"c1=$c1")
    // exact means of the 4 members each
    assert(math.abs(c0(0) - (1.0f + 0.9f + 1.1f + 0.95f) / 4) < 1e-4)
    assert(math.abs(c1(1) - (1.0f + 0.9f + 1.1f + 0.95f) / 4) < 1e-4)
  }

  test("a cell that captures nothing keeps its previous centroid") {
    import spark.implicits._
    val corpus = Seq((0L, vec(1.0, 0.0)), (1L, vec(0.9, 0.1))).toDF("id", "embedding")
    val centroids = Seq((0L, vec(1.0, 0.0)), (1L, vec(-1.0, -1.0))).toDF("cid", "embedding")
    // all points are closer (by cosine) to centroid 0
    val next = KMeans.step(corpus, centroids)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(next(1L) == Seq(-1.0f, -1.0f)) // untouched
    assert(math.abs(next(0L)(0) - 0.95f) < 1e-4)
  }

  test("fit materializes centroids between steps — no corpus scan in the result plan") {
    import spark.implicits._
    val corpus = (Seq(
      (0L, vec(1.0, 0.1)), (2L, vec(0.9, 0.0)),
      (1L, vec(0.1, 1.0)), (3L, vec(0.0, 0.9))
    )).toDF("id", "embedding")
    val fitted = KMeans.fit(corpus, k = 2, iters = 3)
    // The returned frame must be a local relation: step()'s
    // coalesce(next, prev) join would otherwise keep every prior
    // iteration's corpus scan in lineage, and iteration i would
    // re-execute them all (O(iters²) scans) when nearestCell collects.
    val plan = fitted.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected LocalRelation, got:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"lineage not cut:\n$plan")
  }

  test("fit on the embeddings table returns k centroids of the right arity") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding")
    val fitted = KMeans.fit(e, k = 4, iters = 2).collect()
    assert(fitted.length == 4)
    assert(fitted.forall(_.getSeq[Float](1).length == 64))
  }

  test("fit refuses a corpus-sized k instead of collecting it per iteration") {
    import spark.implicits._
    val e = Seq((1L, Array(1f, 0f))).toDF("id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      KMeans.fit(e, k = graft.ops.Similarity.MaxCollectedCentroids + 1, iters = 1)
    }
    assert(ex.getMessage.contains("quantizer"))
  }
}
