package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    val only: Option[Set[String]] =
      rest.headOption.map(_.split(",").toSet) // dev-only filter; driver passes 2 args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(cpus.toInt)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // drop previous queries' checkpoint blocks — queries are
      // independent; accumulated blocks only add memory pressure
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        // A failed query must surface as an explicit RED row in the
        // driver's correctness artifact, never as silence: the driver's
        // compare iterates over output dirs PRESENT, so round 6's eight
        // events failures simply vanished from CORRECTNESS_r06.json.
        // Write a 1-row parquet whose schema can't match any oracle.
        try {
          import spark.implicits._
          Seq(errors(name)).toDF("_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name marker write failed too: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Always present (usually "{}") so its absence is itself a signal;
    // entries name every query that errored and got a marker dir above.
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
    // Fail-loud guard: an empty verify dir or an empty/missing
    // oracle_sql.json must never ship silently as a green round
    // (round 3's correctness artifact reached the judge as "{}").
    val writtenDirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        Option(d.listFiles()).getOrElse(Array.empty)
          .exists(_.getName.endsWith(".parquet")))
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    val oracleBytes = if (Files.exists(oraclePath)) Files.size(oraclePath) else 0L
    val expected = SparkEntry.queries.count { case (name, _) => only.forall(_.contains(name)) }
    println(s"[verify] ${writtenDirs.length}/$expected query dirs written, " +
      s"oracle_sql.json $oracleBytes bytes, ${SparkEntry.oracleSql.size} oracles")
    if (writtenDirs.isEmpty || oracleBytes <= 2) {
      System.err.println("[verify] FATAL: empty verify output — refusing to ship " +
        s"(dirs=${writtenDirs.length}, oracleBytes=$oracleBytes)")
      sys.exit(1)
    }
    // Per-query fail-loud: a query that threw in the write loop above
    // would otherwise just be missing from the output dir, and the
    // driver's compare iterates over dirs PRESENT — the failure would
    // silently vanish from the correctness artifact instead of gating.
    if (writtenDirs.length < expected) {
      val written = writtenDirs.map(_.getName).toSet
      val missing = SparkEntry.queries.keys
        .filter(n => only.forall(_.contains(n)) && !written.contains(n))
      System.err.println(s"[verify] FATAL: ${expected - writtenDirs.length} " +
        s"queries failed to write: ${missing.mkString(",")}")
      sys.exit(1)
    }
    // Errored queries DID write (their _error marker row keeps them
    // visible as red in the driver's artifact) but the run still fails.
    if (errors.nonEmpty) {
      System.err.println(s"[verify] FATAL: ${errors.size} queries errored " +
        s"(marker rows written): ${errors.keys.mkString(",")}")
      sys.exit(1)
    }
  }
}
