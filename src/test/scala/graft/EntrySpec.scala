package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  test("flagship entry returns rows (driver smoke contract)") {
    val spark = GraftSession.local(4)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
