package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

class LayoutSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("range layout write yields partition pruning on the derived column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_year", year($"o_orderdate"))
    Layout.writeRangeLayout(orders, dir, "o_year", "o_orderdate")

    val pruned = Layout.readPruned(spark, dir).filter($"o_year" === 1997)
    val plan = pruned.queryExecution.executedPlan.toString

    // the year filter must land in PartitionFilters (directory pruning),
    // and the pruned scan must touch only the 1997 directory's files
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).take(200).contains("o_year"),
      s"expected o_year in PartitionFilters:\n$plan")
    // row counts survive the layout round-trip (collect() drives THIS
    // Dataset's queryExecution, so its scan metrics populate below)
    assert(pruned.collect().length ==
      orders.filter($"o_year" === 1997).count().toInt)

    // post-pruning scan metrics: only the 1997 directory's files are read
    val allFiles = Layout.readPruned(spark, dir).inputFiles.length
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    val filesRead = scans.head.metrics("numFiles").value
    assert(filesRead > 0 && filesRead < allFiles,
      s"pruning should read fewer than all $allFiles files, read $filesRead")
  }
}
