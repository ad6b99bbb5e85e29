package graft

import org.apache.spark.sql.functions._

/** Throwaway: stage-by-stage timing of the DV-aware change data feed
  * at a scale tier, to find which leg grows with table size. */
object DevCdfDvTime {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(30)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(cpus)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val chain = s"/tmp/graft_scale_${k}x/cdfdv"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    spark.range(10).count()
    for (_ <- 1 to 2) {
      t("list v0")(graft.ops.Layout.listDataFiles(spark, s"$chain/v0").size)
      t("list v1")(graft.ops.Layout.listDataFiles(spark, s"$chain/v1").size)
      t("limit0 v0 count")(
        spark.read.parquet(s"$chain/v0").limit(0).count())
      t("dv read count")(
        spark.read.parquet(s"$chain/v1/_dv").count())
      t("full feed")(
        graft.ops.Upsert.changeDataFeed(spark, chain, 0L, 1L)
          .agg(count(lit(1))).collect()(0).getLong(0))
    }
    spark.stop()
  }
}
