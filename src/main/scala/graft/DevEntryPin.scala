package graft

import org.apache.spark.sql.functions._

/** Dev harness: prints the flagship-entry pin values EntrySpec asserts
  * (row count, CARBON_AG null/non-null split, xxhash64 checksum over the
  * keyed, 1e-6-rounded carbon output). Run after any deliberate NSVB /
  * annualize semantics change and update the spec with the new values. */
object DevEntryPin {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    val nullCarbon = df.filter(col("CARBON_AG").isNull).count()
    // bit_xor: order-independent, no ANSI long-sum overflow
    val checksum = df.select(xxhash64(
        col("tree_ID"), col("YEAR"), round(col("CARBON_AG"), 6)).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    println(s"[entrypin] rows=$n nullCarbon=$nullCarbon nonNull=${n - nullCarbon} checksum=$checksum")
    spark.stop()
  }
}
