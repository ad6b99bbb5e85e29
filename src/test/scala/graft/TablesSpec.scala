package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guards `Tables.normalizeTs` against testdata regenerations changing
  * the physical `ts` encoding of events.parquet. Round 6 shipped with
  * only the INT64-nanos branch; the driver regenerated the files as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark: TIMESTAMP_NTZ) and
  * every events query broke. This spec writes the same instants in all
  * three encodings the loader must accept and asserts they normalize to
  * identical microsecond values, so the next regeneration can't recur.
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  // Known instants (micros since epoch), including a value whose nanos
  // representation exceeds 2^53 — the double-division rounding hazard.
  private val micros = Seq(0L, 1L, 1696118400000000L, 1696118400123456L)

  private def writeEncodings(base: String): Map[String, String] = {
    import spark.implicits._
    // full events shape so the streaming path (groupBy event_type,
    // max(value)) analyzes against the fixture too
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, if (i % 2 == 0) "view" else "click", i.toDouble, "{}")
    }
    val baseDf = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val asLong = baseDf.withColumn("ts", expr("us * 1000")).drop("us") // epoch-nanos INT64
    val asTs = baseDf
      .withColumn("ts", timestamp_micros(col("us"))).drop("us") // TIMESTAMP (adjusted UTC)
    val asNtz = asTs.withColumn("ts", col("ts").cast(TimestampNTZType)) // NTZ micros
    val out = Map(
      "nanos_long" -> asLong, "micros_utc" -> asTs, "micros_ntz" -> asNtz)
    out.map { case (name, df) =>
      val p = s"$base/$name/events.parquet"
      df.write.mode("overwrite").parquet(p)
      name -> s"$base/$name"
    }
  }

  test("normalizeTs yields identical micros across all three physical encodings") {
    val base = java.nio.file.Files.createTempDirectory("tables-enc").toString
    val dirs = writeEncodings(base)
    val got = dirs.map { case (name, dir) =>
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$name: expected TimestampType after normalize, got ${df.schema("ts").dataType}")
      name -> df.select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
        .collect().sorted.toSeq
    }
    val expected = micros.sorted
    got.foreach { case (name, vals) =>
      assert(vals == expected, s"$name normalized to $vals, expected $expected")
    }
  }

  test("normalizeTs rejects an unknown encoding loudly") {
    import spark.implicits._
    val bad = Seq("a", "b").toDF("ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(bad, "ts"))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("windowedEventCounts streams both timestamp-typed encodings") {
    val base = java.nio.file.Files.createTempDirectory("tables-stream").toString
    val dirs = writeEncodings(base)
    Seq("micros_utc", "micros_ntz", "nanos_long").foreach { name =>
      val q = graft.streaming.Streams.windowedEventCounts(spark, dirs(name))
        .writeStream.outputMode("complete")
        .format("memory").queryName(s"enc_$name")
        .start()
      q.processAllAvailable()
      q.stop()
      val n = spark.sql(s"SELECT sum(n) FROM enc_$name").collect()(0).getLong(0)
      assert(n == micros.size, s"$name: expected ${micros.size} events through the stream, got $n")
    }
  }
}
