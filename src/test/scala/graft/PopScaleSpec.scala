package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fia._

/** Population scaling over the fixture pipeline output. */
class PopScaleSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("carbon per acre: positive, finite, spanning the annualized years") {
    val tables = Ingest.load(spark, "src/test/resources/fixture", Seq("XX"))
    val tidy = Tidy.fiaTidy(tables)
    val midpt = FiaAnnualize.annualize(spark, tidy, useMortyr = false)
    val est = EstimateCarbon.fiaEstimate(spark, midpt)
    val pop = PopScale.carbonPerAcre(est, stateArea = 1000.0)
      .orderBy("YEAR").collect()
    assert(pop.length == 11) // 2005..2015
    val y2005 = pop.find(_.getAs[Int]("YEAR") == 2005).get
    assert(y2005.getAs[Double]("AREA_TOTAL") > 0)
    assert(y2005.getAs[Double]("carbon_ton_acre") > 0)
    // the 2010-only empty plot contributes area (aDI=1) but no carbon
    val y2010 = pop.find(_.getAs[Int]("YEAR") == 2010).get
    assert(y2010.getAs[Double]("AREA_TOTAL") > 0)
  }
}
