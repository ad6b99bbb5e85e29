package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans — schema comes from the files, and
  * Catalyst pushes projections/filters down into the scan. `events.ts`
  * has been generated in two physical encodings across testdata
  * regenerations: INT64 TIMESTAMP(NANOS) (surfaces as a long under
  * GraftSession's nanosAsLong flag) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (surfaces as TIMESTAMP_NTZ). We normalize
  * both here to a session-TZ TimestampType column so downstream code
  * always sees the same type regardless of the file encoding.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  private[graft] def normalizeEvents(df: DataFrame): DataFrame =
    normalizeTs(df, "ts")

  /** Normalize a timestamp column to TimestampType across the physical
    * encodings the testdata has shipped with. Cheap (projection-only)
    * and idempotent; safe to apply to any of the three types.
    */
  private[graft] def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        // nanos since epoch -> microsecond timestamp. Must be integral
        // `div`: `/` on longs is DOUBLE division, and epoch-nanos exceed
        // 2^53, so the quotient would round (±1us on ~half the rows).
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        // MICROS with isAdjustedToUTC=false reads as NTZ; the session TZ
        // is pinned to UTC (GraftSession), so this cast is value-preserving
        // and restores the type every downstream unix_micros() expects.
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.$colName has unsupported type $other; expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
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
