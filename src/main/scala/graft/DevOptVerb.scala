package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Round-15 optimization probe: WHICH jobs run inside one lakehouse
  * UPDATE/DELETE commit cycle (job call sites + descriptions), so the
  * redundant ones can be named and cut (guide §1.5/§7).
  *
  * Usage: runMain graft.DevOptVerb [sfDir]
  */
object DevOptVerb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val st = js.stageInfos.maxByOption(_.stageId)
        val name = st.map(_.name).getOrElse("?")
        val graft = st.map(_.details).getOrElse("").linesIterator
          .find(l => l.contains("graft.") && !l.contains("DevOptVerb"))
          .getOrElse("").trim
        // which SQL execution this job serves: AQE stage sub-jobs carry
        // the ROOT execution id, so jobs group by ACTION — the unit the
        // optimization cuts operate on
        val exec = Option(js.properties)
          .map(p => Option(p.getProperty("spark.sql.execution.id"))
            .getOrElse("-")).getOrElse("-")
        log.add(s"exec=$exec ${js.stageInfos.size}st $name | $graft")
      }
    })
    def leg[T](label: String)(f: => T): T = {
      log.clear()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"\n=== $label: ${(System.nanoTime() - t0) / 1e9}%.3f s, ${log.size} jobs ===")
      log.forEach(s => println(s"  job: $s"))
      // per-execution tally: N executions (driver round-trip actions) and
      // the AQE stage sub-jobs each one spawned
      val byExec = new java.util.TreeMap[String, Integer]()
      log.forEach { s =>
        val e = s.split(" ")(0)
        byExec.merge(e, 1, (a, b) => a + b)
      }
      println(s"  executions: ${byExec.size}; jobs per exec: $byExec")
      r
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = s"/tmp/graft_devopt_verb_${System.getProperty("user.name", "u")}"
    val tbl = s"$base/table"
    val fs = graft.ops.Fs.of(base, spark)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    e.select($"vec_id".as("id"), $"embedding").write.parquet(s"$tbl/v0")
    graft.ops.Fs.writeTextAtomic(fs,
      new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
    // warm pass (codegen, broadcast machinery), then measured pass
    spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
      "transform(embedding, x -> -x) WHERE id >= 40 AND id % 7 = 2").collect()
    leg("SQL UPDATE")(
      spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
        "transform(embedding, x -> -x) WHERE id >= 40 AND id % 5 = 2").collect())
    leg("SQL DELETE")(
      spark.sql(s"DELETE FROM '$tbl' ON id WHERE id >= 40 AND id % 5 = 4").collect())
    // the batch verb (MERGE → upsertByKeys): the key set rides the
    // persisted batch, distinct+broadcast localized inside commit
    e.select(($"vec_id" + 100000).as("id"), $"embedding")
      .limit(500).createOrReplaceTempView("devopt_merge_batch")
    leg("SQL MERGE")(
      spark.sql(s"MERGE INTO '$tbl' USING (SELECT * FROM devopt_merge_batch) " +
        "ON id WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").collect())
    spark.stop()
  }
}
