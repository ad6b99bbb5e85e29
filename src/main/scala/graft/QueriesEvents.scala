package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{AsOf, Fills}

/** Event-stream families over `events`: window fills (W1), as-of
  * attachment (J15), tumbling time buckets (the batch shape of the
  * streaming agg), JSON extraction, and grain dedup.
  *
  * Timestamp note: `events.ts` is nanosecond parquet; Spark truncates
  * to microseconds. All ordering/bucketing goes through `unix_micros`
  * (Spark) / `epoch_us` (DuckDB) with `event_id` tie-breaks so both
  * engines see the same total order, and raw timestamps never appear
  * in output. */
object QueriesEvents {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  // --- W1: fill value down-then-up per user over event time
  //     (nulls injected deterministically on 'view' events)
  private def windowFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ev(s, dir).select(
      $"event_id", $"user_id", unix_micros($"ts").as("us"),
      when($"event_type" === "view", lit(null).cast(DoubleType)).otherwise($"value").as("v"))
    Fills.fillDownUp(base, Seq("user_id"), Seq(col("us"), col("event_id")), Seq("v"))
      .select($"event_id", $"user_id", $"v".as("v_filled"))
  }

  private val windowFillSql =
    """WITH base AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id,
      |  coalesce(
      |    last_value(v IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY us, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    first_value(v IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY us, event_id
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS v_filled
      |FROM base""".stripMargin

  // --- J15: as-of — attach each user's most recent signup value at or
  //     before each event
  private def asOfSignup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ev(s, dir).select(
      $"event_id", $"user_id", $"event_type", $"value", unix_micros($"ts").as("us"))
    AsOf.attachLastMarker(
      base,
      keyCols = Seq("user_id"),
      orderCols = Seq(col("us"), col("event_id")),
      markerCond = col("event_type") === "signup",
      value = col("value"),
      as = "signup_value")
      .select($"event_id", $"user_id", $"signup_value")
  }

  private val asOfSignupSql =
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_value
      |FROM events""".stripMargin

  // --- tumbling 6h buckets (batch shape of the streaming windowed agg);
  //     sums avoided on arbitrary doubles — count/min/max are engine-exact
  private def timeBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .withColumn("bucket", (unix_micros($"ts") / lit(21600000000L)).cast(LongType))
      .groupBy($"bucket", $"event_type")
      .agg(count(lit(1)).as("n"), min($"value").as("min_v"), max($"value").as("max_v"))
  }

  private val timeBucketsSql =
    """SELECT epoch_us(ts) // 21600000000 AS bucket, event_type,
      |  count(*) AS n, min(value) AS min_v, max(value) AS max_v
      |FROM events GROUP BY 1, 2""".stripMargin

  // --- JSON extraction + integer aggregation
  private def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count($"k").as("n_k"))
  }

  private val jsonExtractSql =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
      |FROM events GROUP BY event_type""".stripMargin

  // --- grain dedup: first event per (user, event_type) by time
  private def firstPerGrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy(unix_micros($"ts").asc, $"event_id".asc)
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
  }

  private val firstPerGrainSql =
    """SELECT user_id, event_type, event_id, value FROM events
      |QUALIFY row_number() OVER
      |  (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id) = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_fill" -> (windowFill _),
    "q_asof_signup" -> (asOfSignup _),
    "q_time_buckets" -> (timeBuckets _),
    "q_json_extract" -> (jsonExtract _),
    "q_first_per_grain" -> (firstPerGrain _))

  val oracles: Map[String, String] = Map(
    "q_window_fill" -> windowFillSql,
    "q_asof_signup" -> asOfSignupSql,
    "q_time_buckets" -> timeBucketsSql,
    "q_json_extract" -> jsonExtractSql,
    "q_first_per_grain" -> firstPerGrainSql)
}
