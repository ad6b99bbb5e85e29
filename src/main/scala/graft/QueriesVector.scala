package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity-search families over the `embeddings` table.
  *
  * Outputs are rank-only (ids, not scores): both engines compute the
  * same cosine ordering, but double-vs-float accumulation details could
  * differ in the last ulps — ranks are stable because neighbor gaps are
  * orders of magnitude larger. */
object QueriesVector {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  // --- brute-force exact cosine top-5 for the first 5 vectors
  private def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    Similarity.bruteForceTopK(
      e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding"),
      e.select($"vec_id".as("id"), $"embedding"),
      k = 5)
  }

  private val cosineTopKSql =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS id, embedding AS ce FROM embeddings),
      |scored AS (
      |  SELECT qid, id,
      |    list_dot_product(CAST(qe AS DOUBLE[]), CAST(ce AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[]))) * sqrt(list_dot_product(CAST(ce AS DOUBLE[]), CAST(ce AS DOUBLE[])))) AS cos
      |  FROM c CROSS JOIN q WHERE qid != id)
      |SELECT qid, id, CAST(rank AS INT) AS rank FROM (
      |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 5""".stripMargin

  // --- LSH-bucketed ANN: same-bucket exact top-3 (the scale path)
  private def lshAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    Similarity.lshTopK(
      e.filter($"vec_id" < 20).select($"vec_id".as("qid"), $"embedding"),
      e.select($"vec_id".as("id"), $"embedding"),
      k = 3, numPlanes = 4)
  }

  private val lshAnnSql: String = {
    val planes = Similarity.hyperplane(4, 64)
    val bucketExpr = (v: String) =>
      planes.zipWithIndex.map { case (plane, p) =>
        val lst = plane.map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(CAST($v AS DOUBLE[]), CAST($lst AS DOUBLE[])) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qe,
       |    ${bucketExpr("embedding")} AS bucket
       |  FROM embeddings WHERE vec_id < 20),
       |c AS (
       |  SELECT vec_id AS id, embedding AS ce,
       |    ${bucketExpr("embedding")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT qid, id,
       |    list_dot_product(CAST(qe AS DOUBLE[]), CAST(ce AS DOUBLE[])) /
       |      (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[]))) * sqrt(list_dot_product(CAST(ce AS DOUBLE[]), CAST(ce AS DOUBLE[])))) AS cos
       |  FROM c JOIN q USING (bucket) WHERE qid != id)
       |SELECT qid, id, CAST(rank AS INT) AS rank FROM (
       |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 3""".stripMargin
  }

  // --- embedding-cosine near-duplicate pairs (dedup variant): LSH
  //     bucket restriction + quantized cosine threshold
  private def embNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.cosineNearDupPairs(
      emb(s, dir).select($"vec_id".as("id"), $"embedding"),
      thresholdQ = 3000L, numPlanes = 4)
  }

  private val embNearDupSql: String = {
    val planes = Similarity.hyperplane(4, 64)
    val bucketExpr = (v: String) =>
      planes.zipWithIndex.map { case (plane, p) =>
        val lst = plane.map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(CAST($v AS DOUBLE[]), CAST($lst AS DOUBLE[])) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT vec_id AS id, embedding, ${bucketExpr("embedding")} AS bucket,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |p AS (
       |  SELECT l.id AS i, r.id AS j,
       |    CAST(floor(
       |      list_dot_product(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) /
       |        (l.nrm * r.nrm) * 10000.0) AS BIGINT) AS cos_q
       |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id)
       |SELECT i, j, cos_q FROM p WHERE cos_q >= 3000""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> (cosineTopK _),
    "q_lsh_ann" -> (lshAnn _),
    "q_emb_neardup" -> (embNearDup _))

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" -> cosineTopKSql,
    "q_lsh_ann" -> lshAnnSql,
    "q_emb_neardup" -> embNearDupSql)
}
