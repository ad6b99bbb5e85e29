package graft

import org.apache.spark.sql.functions._

/** Dev probe: does `spark.read.parquet` on a `_`-prefixed directory
  * actually return rows (manifest sidecar cache hit), or does Spark's
  * hidden-path filter silently drop it? */
object DevManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val dir = "/tmp/graft_manifest_probe/_manifest"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val n = spark.read.parquet(dir).count()
    println(s"MANIFEST_DIR_READ_COUNT=$n")
    spark.stop()
  }
}
