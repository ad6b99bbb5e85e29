package graft

import org.apache.spark.sql.functions._

/** Dev probe: FS metadata round-trips per lakehouse publish and per
  * read (round-13 verdict #1 — adjudicate the r12 lakehouse bench
  * delta with op-count evidence instead of wall-clock guesses). Counts
  * every operation issued through the [[graft.ops.Fs]] substrate —
  * the mandated route for all lakehouse metadata I/O — keyed by
  * `op:artifact`, for:
  *
  *   - one in-place SQL MERGE publish on a versioned table,
  *   - one in-place SQL DELETE publish,
  *   - one `graft_table(...)` CURRENT resolution + scan plan,
  *
  * each after a warm-up commit so JIT and session setup don't ride the
  * audit. On a local FS each op is ~µs; on an object store each is an
  * RPC — this table IS the commit latency model at 100 TB.
  *
  * Run: sbt "runMain graft.DevCommitOps" */
object DevCommitOps {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops.Fs

    val base = s"/tmp/graft_devcommitops_${System.nanoTime()}"
    val tbl = s"$base/tbl"
    spark.range(100000)
      .select($"id".as("k"), ($"id" % 97).as("v"))
      .repartitionByRange(8, $"k").sortWithinPartitions($"k")
      .write.parquet(s"$tbl/v0")
    Fs.writeTextAtomic(Fs.of(tbl, spark),
      new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")

    def upd(lo: Long, n: Long) = spark.range(n)
      .select(($"id" + lo).as("k"), lit(-1L).as("v"))

    def audit(label: String)(body: => Unit): Unit = {
      Fs.Audit.enable()
      val t0 = System.nanoTime()
      body
      val ms = (System.nanoTime() - t0) / 1e6
      val t = Fs.Audit.disable()
      println(f"== $label%-28s total=${t.values.sum}%3d ops  $ms%8.1f ms")
      t.toSeq.sortBy(-_._2).foreach { case (k, n) =>
        println(f"   $n%4d  $k")
      }
    }

    // warm-up commits (JIT, codegen, FS init)
    upd(0, 64).createOrReplaceTempView("u_warm")
    spark.sql(s"""MERGE INTO '$tbl' USING (SELECT * FROM u_warm) ON k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""").collect()
    spark.sql(s"SELECT count(*) FROM graft_table('$tbl')").collect()

    upd(1000, 64).createOrReplaceTempView("u1")
    audit("MERGE publish")(spark.sql(
      s"""MERGE INTO '$tbl' USING (SELECT * FROM u1) ON k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())

    audit("DELETE publish")(spark.sql(
      s"DELETE FROM '$tbl' ON k WHERE k >= 50000 AND k < 50064").collect())

    audit("read: resolve + count")(spark.sql(
      s"SELECT count(*) FROM graft_table('$tbl')").collect())

    audit("read: pruned readWhere")(
      graft.ops.Upsert.readWhere(spark, graft.streaming.Streams
        .currentSnapshot(tbl).get, $"k" === 42L).collect())

    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(base))
    spark.stop()
  }
}
