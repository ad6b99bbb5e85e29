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

  // --- forward as-of: each event picks up the user's NEXT purchase
  //     time at or after it (time-to-conversion shape)
  private def asOfNext(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ev(s, dir).select(
      $"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
    AsOf.attachNextMarker(
      base,
      keyCols = Seq("user_id"),
      orderCols = Seq(col("us"), col("event_id")),
      markerCond = col("event_type") === "purchase",
      value = col("us"),
      as = "next_purchase_us")
      .select($"event_id", $"user_id", $"next_purchase_us")
  }

  private val asOfNextSql =
    """SELECT event_id, user_id,
      |  first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_us
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

  // --- gaps-and-islands sessionization (30-min gap): per-session stats.
  //     The batch shape of the streaming session window; one shuffle total
  //     (sessionize windows + the session rollup share the user_id hash).
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ev(s, dir).select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    graft.ops.Sessionize
      .sessionize(base, Seq("user_id"), $"us", $"event_id", gap = 1800000000L)
      .groupBy($"user_id", $"session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        (max($"us") - min($"us")).as("dur_us"),
        min($"event_id").as("first_event"))
  }

  private val sessionizeSql =
    """WITH base AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
      |lagged AS (
      |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      |  FROM base),
      |sess AS (
      |  SELECT user_id, event_id, us,
      |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_seq
      |  FROM lagged)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  max(us) - min(us) AS dur_us, min(event_id) AS first_event
      |FROM sess GROUP BY 1, 2""".stripMargin

  // --- per-user trend slope (OLS of value on event index), integer-exact:
  //     y scaled to micro-units (value has ≤2 decimals, exactly
  //     representable ×1e6), x centered as x' = 2x-(n+1) so Σx' = 0 and
  //     slope = 2Σx'y/Σx'² — all sums are BIGINT, division is the only
  //     float op and is identical in both engines.
  private def userSlope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    val wAll = Window.partitionBy($"user_id")
    ev(s, dir)
      .select($"event_id", $"user_id", $"value", unix_micros($"ts").as("us"))
      .withColumn("x", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("xc", lit(2L) * $"x" - ($"n" + lit(1L)))
      .withColumn("ys", round($"value" * lit(1.0e6)).cast(LongType))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n"),
        sum($"xc" * $"ys").as("sxy"),
        sum($"xc" * $"xc").as("sxx"))
      .filter($"n" >= 2)
      .select(
        $"user_id", $"n",
        ((lit(2L) * $"sxy").cast(DoubleType) / $"sxx".cast(DoubleType) / lit(1.0e6))
          .as("slope"))
  }

  private val userSlopeSql =
    """WITH base AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      |idx AS (
      |  SELECT user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS x,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM base),
      |terms AS (
      |  SELECT user_id, n, 2 * x - (n + 1) AS xc,
      |    CAST(round(value * 1000000.0) AS BIGINT) AS ys
      |  FROM idx),
      |agg AS (
      |  SELECT user_id, count(*) AS n, sum(xc * ys) AS sxy, sum(xc * xc) AS sxx
      |  FROM terms GROUP BY 1)
      |SELECT user_id, n,
      |  CAST(2 * sxy AS DOUBLE) / CAST(sxx AS DOUBLE) / 1000000.0 AS slope
      |FROM agg WHERE n >= 2""".stripMargin

  // --- decile binning per event type (ntile over a total order)
  private def valueDeciles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value".asc, $"event_id".asc)
    ev(s, dir)
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"event_type", $"decile")
      .agg(count(lit(1)).as("n"), min($"value").as("min_v"), max($"value").as("max_v"))
  }

  private val valueDecilesSql =
    """WITH d AS (
      |  SELECT event_type, value,
      |    ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
      |  FROM events)
      |SELECT event_type, decile, count(*) AS n, min(value) AS min_v, max(value) AS max_v
      |FROM d GROUP BY 1, 2""".stripMargin

  // --- retention cohorts: users bucketed by first-seen WEEK, counted
  //     as active per later week. Two aggregation shuffles (per-user
  //     first week; per (cohort_week, week) distinct users) — at scale
  //     the per-user grain dominates and partial aggregation carries it.
  private def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select(
      $"user_id", date_trunc("week", $"ts".cast(TimestampType)).cast(DateType).as("week"))
    val cohort = e.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    e.join(cohort, "user_id")
      .groupBy($"cohort_week", $"week")
      .agg(countDistinct($"user_id").as("active_users"))
  }

  private val retentionCohortsSql =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
      |cohort AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
      |SELECT c.cohort_week, e.week, count(DISTINCT e.user_id) AS active_users
      |FROM e JOIN cohort c USING (user_id)
      |GROUP BY c.cohort_week, e.week""".stripMargin

  // --- conversion funnel: signup -> first click after signup -> first
  //     purchase after that click; one row of stage counts. Conditional
  //     per-user aggregates, each stage gated on the previous stage's
  //     timestamp — three per-user aggregation passes, no self-join of
  //     the event log against itself.
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select(
      $"user_id", $"event_type", unix_micros($"ts").as("us"))
    val s1 = e.groupBy($"user_id")
      .agg(min(when($"event_type" === "signup", $"us")).as("t_signup"))
    val s2 = e.join(s1, "user_id")
      .groupBy($"user_id", $"t_signup")
      .agg(min(when($"event_type" === "click" && $"us" >= $"t_signup", $"us"))
        .as("t_click"))
    val s3 = e.join(s2, "user_id")
      .groupBy($"user_id", $"t_signup", $"t_click")
      .agg(min(when($"event_type" === "purchase" && $"us" >= $"t_click", $"us"))
        .as("t_purchase"))
    s3.agg(
      count($"t_signup").as("n_signup"),
      count($"t_click").as("n_click_after"),
      count($"t_purchase").as("n_purchase_after"))
  }

  private val funnelSql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN us END) AS t_signup
      |  FROM e GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, t_signup,
      |    min(CASE WHEN event_type = 'click' AND us >= t_signup THEN us END) AS t_click
      |  FROM e JOIN s1 USING (user_id) GROUP BY e.user_id, t_signup),
      |s3 AS (
      |  SELECT e.user_id, t_signup, t_click,
      |    min(CASE WHEN event_type = 'purchase' AND us >= t_click THEN us END) AS t_purchase
      |  FROM e JOIN s2 USING (user_id) GROUP BY e.user_id, t_signup, t_click)
      |SELECT count(t_signup) AS n_signup,
      |  count(t_click) AS n_click_after,
      |  count(t_purchase) AS n_purchase_after
      |FROM s3""".stripMargin

  // --- bucketed interval join (ops.IntervalJoin): high-value (>=300) trigger
  //     events open a 2-hour window per event_type; every same-type
  //     event inside a window joins to it. event_type has ~5 distinct
  //     values, so a plain equi-join on the key is quasi-cross — the
  //     time-bucket equi-key is what bounds candidates. The oracle
  //     replays it as a BETWEEN join; counts/max are exact.
  private def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select(
      $"event_id", $"event_type", unix_micros($"ts").as("us"), $"value")
    val windows = e.filter($"value" >= 300.0)
      .select($"event_id".as("window_id"), $"event_type",
        $"us".as("w_start"), ($"us" + 7200000000L).as("w_end"))
    graft.ops.IntervalJoin.bucketedIntervalJoin(
        windows, e, Seq("event_type"), "w_start", "w_end", "us",
        bucketUs = 3600000000L)
      .groupBy($"window_id", $"event_type")
      .agg(count(lit(1)).as("n_in_window"), max($"value").as("max_value"))
  }

  private val intervalJoinSql =
    """WITH e AS (
      |  SELECT event_id, event_type, epoch_us(ts) AS us, value FROM events),
      |w AS (
      |  SELECT event_id AS window_id, event_type,
      |    us AS w_start, us + 7200000000 AS w_end
      |  FROM e WHERE value >= 300.0)
      |SELECT w.window_id, w.event_type,
      |  count(*) AS n_in_window, max(e.value) AS max_value
      |FROM w JOIN e ON e.event_type = w.event_type
      |  AND e.us >= w.w_start AND e.us < w.w_end
      |GROUP BY 1, 2""".stripMargin

  // --- keyless interval OVERLAP join (ops.IntervalJoin
  //     .bucketedOverlapJoin): which user sessions overlap each trigger
  //     window. There is NO shared equi-key — exactly the case where
  //     Spark's native plan is a nested loop — so time-bucket
  //     co-residency is the only candidate cutter; the first-common-
  //     bucket condition dedups without a distinct pass.
  private def overlapJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select(
      $"event_id", $"user_id", unix_micros($"ts").as("us"), $"value")
    val windows = e.filter($"value" >= 300.0)
      .select($"event_id".as("window_id"),
        $"us".as("w_start"), ($"us" + 7200000000L).as("w_end"))
    val sessions = graft.ops.Sessionize
      .sessionize(e.select($"event_id", $"user_id", $"us"),
        Seq("user_id"), $"us", $"event_id", gap = 1800000000L)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"us").as("s_start"), (max($"us") + 1L).as("s_end"))
    graft.ops.IntervalJoin.bucketedOverlapJoin(
        windows, sessions, Seq.empty,
        "w_start", "w_end", "s_start", "s_end", bucketUs = 3600000000L)
      .groupBy($"window_id")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct($"user_id").as("n_users"))
  }

  private val overlapJoinSql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events),
      |w AS (
      |  SELECT event_id AS window_id, us AS w_start, us + 7200000000 AS w_end
      |  FROM e WHERE value >= 300.0),
      |lagged AS (
      |  SELECT user_id, event_id, us,
      |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      |  FROM e),
      |sess AS (
      |  SELECT user_id, us,
      |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_seq
      |  FROM lagged),
      |si AS (
      |  SELECT user_id, session_seq, min(us) AS s_start, max(us) + 1 AS s_end
      |  FROM sess GROUP BY 1, 2)
      |SELECT w.window_id, count(*) AS n_sessions,
      |  count(DISTINCT s.user_id) AS n_users
      |FROM w JOIN si s ON w.w_start < s.s_end AND s.s_start < w.w_end
      |GROUP BY 1""".stripMargin

  // --- TWO-TABLE as-of join (ops.AsOf.joinAsOf, the trades×quotes
  //     API): non-signup events pick up the user's most recent signup
  //     value at or before them from a SEPARATE deduped signup table.
  //     The oracle is DuckDB's native ASOF LEFT JOIN — the union-trick
  //     window implementation must match the real as-of engine exactly.
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select(
      $"event_id", $"user_id", $"event_type", $"value", unix_micros($"ts").as("us"))
    val leftT = e.filter($"event_type" =!= "signup")
      .select($"event_id", $"user_id", $"us")
    val rightT = e.filter($"event_type" === "signup")
      .groupBy($"user_id", $"us").agg(min($"value").as("signup_value"))
    graft.ops.AsOf.joinAsOf(
        leftT, rightT, Seq("user_id"), "us", "us", Seq("signup_value"))
      .select($"event_id", $"user_id", $"signup_value_asof")
  }

  private val asofJoinSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
      |l AS (SELECT event_id, user_id, us FROM e WHERE event_type != 'signup'),
      |r AS (SELECT user_id, us, min(value) AS signup_value
      |      FROM e WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, r.signup_value AS signup_value_asof
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us""".stripMargin

  // --- as-of join with TOLERANCE (merge_asof's staleness bound): same
  //     trades×signups shape as q_asof_join, but a signup older than 7
  //     days no longer attaches. DuckDB's native ASOF cannot express
  //     tolerance, so the oracle replays the union-trick window SQL
  //     with the same (time, src) order and the staleness CASE —
  //     an independent formulation, not the operator's own code path.
  private val asofTolUs = 7L * 24 * 3600 * 1000000 // 7 days in micros
  private def asofTol(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select(
      $"event_id", $"user_id", $"event_type", $"value", unix_micros($"ts").as("us"))
    val leftT = e.filter($"event_type" =!= "signup")
      .select($"event_id", $"user_id", $"us")
    val rightT = e.filter($"event_type" === "signup")
      .groupBy($"user_id", $"us").agg(min($"value").as("signup_value"))
    graft.ops.AsOf.joinAsOf(
        leftT, rightT, Seq("user_id"), "us", "us", Seq("signup_value"),
        tolerance = Some(lit(asofTolUs)))
      .select($"event_id", $"user_id", $"signup_value_asof")
  }

  private def asofTolSql =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
       |l AS (SELECT event_id, user_id, us FROM e WHERE event_type != 'signup'),
       |r AS (SELECT user_id, us, min(value) AS signup_value
       |      FROM e WHERE event_type = 'signup' GROUP BY 1, 2),
       |u AS (
       |  SELECT user_id, us, 1 AS src, event_id,
       |         CAST(NULL AS DOUBLE) AS sv, CAST(NULL AS BIGINT) AS rus FROM l
       |  UNION ALL
       |  SELECT user_id, us, 0 AS src, NULL, signup_value, us FROM r),
       |w AS (
       |  SELECT *,
       |    last_value(CASE WHEN src = 0 THEN rus END IGNORE NULLS) OVER win AS m_us,
       |    last_value(CASE WHEN src = 0 THEN sv END IGNORE NULLS) OVER win AS m_sv
       |  FROM u
       |  WINDOW win AS (PARTITION BY user_id ORDER BY us, src
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_id, user_id,
       |  CASE WHEN us - m_us <= $asofTolUs THEN m_sv END AS signup_value_asof
       |FROM w WHERE src = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_tol" -> (asofTol _),
    "q_asof_join" -> (asofJoin _),
    "q_overlap_join" -> (overlapJoin _),
    "q_interval_join" -> (intervalJoin _),
    "q_window_fill" -> (windowFill _),
    "q_asof_signup" -> (asOfSignup _),
    "q_asof_next" -> (asOfNext _),
    "q_retention" -> (retentionCohorts _),
    "q_funnel" -> (funnel _),
    "q_time_buckets" -> (timeBuckets _),
    "q_json_extract" -> (jsonExtract _),
    "q_first_per_grain" -> (firstPerGrain _),
    "q_sessionize" -> (sessionize _),
    "q_user_slope" -> (userSlope _),
    "q_value_deciles" -> (valueDeciles _))

  val oracles: Map[String, String] = Map(
    "q_asof_tol" -> asofTolSql,
    "q_asof_join" -> asofJoinSql,
    "q_overlap_join" -> overlapJoinSql,
    "q_interval_join" -> intervalJoinSql,
    "q_window_fill" -> windowFillSql,
    "q_asof_signup" -> asOfSignupSql,
    "q_asof_next" -> asOfNextSql,
    "q_retention" -> retentionCohortsSql,
    "q_funnel" -> funnelSql,
    "q_time_buckets" -> timeBucketsSql,
    "q_json_extract" -> jsonExtractSql,
    "q_first_per_grain" -> firstPerGrainSql,
    "q_sessionize" -> sessionizeSql,
    "q_user_slope" -> userSlopeSql,
    "q_value_deciles" -> valueDecilesSql)
}
