package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans — schema comes from the files, and
  * Catalyst pushes projections/filters down into the scan. `events.ts`
  * is stored as INT64 TIMESTAMP(NANOS), which Spark surfaces as a long
  * (see GraftSession's nanosAsLong flag); we normalize it here to a
  * microsecond TimestampType column so downstream code sees a timestamp.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  private def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType =>
        // nanos since epoch -> microsecond timestamp. Must be integral
        // `div`: `/` on longs is DOUBLE division, and epoch-nanos exceed
        // 2^53, so the quotient would round (±1us on ~half the rows).
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
