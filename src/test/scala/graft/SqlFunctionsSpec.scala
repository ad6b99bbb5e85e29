package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected composite SQL functions (GraftExtensions): each must
  * return exactly what its graft.ops Column-API counterpart returns —
  * the SQL surface is the same operator, reachable from text queries.
  */
class SqlFunctionsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private val samples = Seq(
    "Reach me at bob.smith+x@mail.example.com or 10.0.255.7 ok",
    "call 555-123-4567 today; backup 555.987.6543.",
    "no pii here, just  spaced   Text! 42",
    "")

  test("scrub_pii SQL function matches ops.TextPrep.scrubPii") {
    import spark.implicits._
    val df = samples.toDF("text")
    df.createOrReplaceTempView("sqlfn_t")
    val viaSql = spark.sql("SELECT scrub_pii(text) AS s FROM sqlfn_t")
      .collect().map(_.getString(0)).toSeq
    val viaOps = graft.ops.TextPrep.scrubPii(df, "text")
      .select("scrubbed").collect().map(_.getString(0)).toSeq
    assert(viaSql == viaOps)
    assert(viaSql.head.contains("<EMAIL>") && viaSql.head.contains("<IP>"))
    assert(viaSql(1).contains("<PHONE>"))
  }

  test("token_count and hash60 SQL functions match their Column operators") {
    import spark.implicits._
    val df = samples.toDF("text")
    df.createOrReplaceTempView("sqlfn_t")
    val viaSql = spark
      .sql("SELECT token_count(text) AS n, hash60(text) AS h FROM sqlfn_t")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val viaOps = df.select(
        size(split(col("text"), " ")).as("n"),
        graft.ops.Dedup.hash60(col("text")).as("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(viaSql == viaOps)
  }

  test("composite functions stay codegen projections — no Exchange, no UDF node") {
    import spark.implicits._
    samples.toDF("text").createOrReplaceTempView("sqlfn_t")
    val plan = spark.sql(
      "SELECT scrub_pii(text), token_count(text), hash60(norm_text(text)) FROM sqlfn_t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"unexpected UDF node in:\n$plan")
  }
}
