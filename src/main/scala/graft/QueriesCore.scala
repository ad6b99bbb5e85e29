package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.fia.Division
import graft.ops.FallbackJoin

/** Projection / filter / scalar-derivation and join operator families
  * (SURVEY §2.2 P1-P15, §2.3 J1-J11) over the testdata tables. */
object QueriesCore {

  import Queries.dsum

  // --- P1/P2/P3: prune + filter + cast (filters push to the parquet scan)
  private def filterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1998-06-01").cast(TimestampType) && $"l_quantity" > 5)
      .select(
        $"l_orderkey", $"l_linenumber",
        $"l_quantity".cast(IntegerType).as("qty_int"), $"l_returnflag")
  }

  private val filterProjectSql =
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty_int, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_quantity > 5""".stripMargin

  // --- P4/P5: composite key derive + split (fia_add/split_composite_ids,
  //     R/fia_ids.R:16-80)
  private def compositeIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(
        concat_ws("_", $"o_custkey", $"o_orderkey").as("order_ID"),
        $"o_totalprice")
      .withColumn("custkey_back", split_part($"order_ID", lit("_"), lit(1)).cast(LongType))
      .withColumn("orderkey_back", split_part($"order_ID", lit("_"), lit(2)).cast(LongType))
  }

  private val compositeIdsSql =
    """SELECT concat_ws('_', o_custkey, o_orderkey) AS order_ID, o_totalprice,
      |  CAST(split_part(concat_ws('_', o_custkey, o_orderkey), '_', 1) AS BIGINT) AS custkey_back,
      |  CAST(split_part(concat_ws('_', o_custkey, o_orderkey), '_', 2) AS BIGINT) AS orderkey_back
      |FROM orders""".stripMargin

  // --- P6/P13: coalesce + greatest scalar fills
  private def coalesceFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).select(
      $"l_orderkey", $"l_linenumber",
      coalesce(when($"l_discount" === 0.0, lit(null)).otherwise($"l_discount"), $"l_tax")
        .as("disc_or_tax"),
      greatest($"l_quantity", lit(10.0)).as("qty_floor10"))
  }

  private val coalesceFillSql =
    """SELECT l_orderkey, l_linenumber,
      |  coalesce(nullif(l_discount, 0.0), l_tax) AS disc_or_tax,
      |  greatest(l_quantity, 10.0) AS qty_floor10
      |FROM lineitem""".stripMargin

  // --- P7/P8: sentinel 999 round-trip (R/expand_data.R:25-39,
  //     R/interpolate_data.R:62-65)
  private def sentinelRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withNulls = Tables.lineitem(s, dir).select(
      $"l_orderkey", $"l_linenumber",
      when($"l_linenumber" === 3, lit(null)).otherwise($"l_linenumber").as("code"))
    withNulls
      .withColumn("code_sentinel", coalesce($"code", lit(999)))
      .withColumn("code_restored",
        when($"code_sentinel" === 999, lit(null)).otherwise($"code_sentinel"))
  }

  private val sentinelRoundtripSql =
    """SELECT l_orderkey, l_linenumber,
      |  nullif(l_linenumber, 3) AS code,
      |  coalesce(nullif(l_linenumber, 3), 999) AS code_sentinel,
      |  nullif(coalesce(nullif(l_linenumber, 3), 999), 999) AS code_restored
      |FROM lineitem""".stripMargin

  // --- P9/P10: threshold rewrite + 3-valued masking (case_when with
  //     null-condition keeping the otherwise branch, R/adjust_mortality.R:96-129)
  private def caseRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = when($"l_returnflag" === "N", lit(null).cast(DoubleType)).otherwise($"l_tax")
    Tables.lineitem(s, dir).select(
      $"l_orderkey", $"l_linenumber",
      when($"l_quantity" < 10 || $"l_discount" > 0.08, lit(2))
        .when($"l_quantity" > 40, lit(1))
        .otherwise(lit(0)).as("status_flag"),
      // cond is null for returnflag N -> falls through to l_quantity,
      // matching R if_else(cond, NA, x, missing = x)
      when(base > 0.05, lit(null)).otherwise($"l_quantity").as("masked_qty"))
  }

  private val caseRewriteSql =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_quantity < 10 OR l_discount > 0.08 THEN 2
      |       WHEN l_quantity > 40 THEN 1 ELSE 0 END AS status_flag,
      |  CASE WHEN (CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_tax END) > 0.05
      |       THEN NULL ELSE l_quantity END AS masked_qty
      |FROM lineitem""".stripMargin

  // --- P11: getDivision (R/getDivision.R:7-33) as pure column expressions
  private def divisionDerive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir).select(
      $"n_nationkey", $"n_name",
      Division.province($"n_name").as("province"),
      Division.division($"n_name").as("division"))
  }

  private val divisionDeriveSql =
    """WITH t AS (SELECT n_nationkey, n_name, trim(n_name) AS tn FROM nation),
      |p AS (
      |  SELECT n_nationkey, n_name,
      |    CASE WHEN length(tn) = 0 THEN ''
      |         WHEN length(tn) = 4 THEN substr(tn, 1, 3)
      |         WHEN length(tn) = 7 THEN substr(tn, 1, length(tn) - 3)
      |         ELSE substr(tn, 1, length(tn) - 2) END AS province
      |  FROM t)
      |SELECT n_nationkey, n_name, province,
      |  CASE WHEN length(province) = 0 THEN ''
      |       ELSE substr(province, 1, length(province) - 1) || '0' END AS division
      |FROM p""".stripMargin

  // --- J7-J9 + A3: star-schema broadcast joins + grouped agg
  private def starJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(su), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"p_brand")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val starJoinSql =
    """SELECT r_name, p_brand,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, p_brand""".stripMargin

  // --- J3: null-safe join keys (dplyr na_matches="na" -> eqNullSafe)
  private def nullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d1 = Tables.orders(s, dir).select(
      $"o_orderkey",
      when($"o_custkey" % 50 === 0, lit(null)).otherwise($"o_custkey" % 50).as("k"))
    val d2 = Tables.customer(s, dir)
      .select(when($"c_custkey" % 50 === 0, lit(null)).otherwise($"c_custkey" % 50).as("k2"))
      .groupBy($"k2").agg(count(lit(1)).as("cnt"))
    d1.join(d2, $"k" <=> $"k2", "left").select($"o_orderkey", $"k", $"cnt")
  }

  private val nullSafeJoinSql =
    """WITH d1 AS (SELECT o_orderkey, nullif(o_custkey % 50, 0) AS k FROM orders),
      |d2 AS (SELECT nullif(c_custkey % 50, 0) AS k2, count(*) AS cnt
      |       FROM customer GROUP BY 1)
      |SELECT d1.o_orderkey, d1.k, d2.cnt
      |FROM d1 LEFT JOIN d2 ON d1.k IS NOT DISTINCT FROM d2.k2""".stripMargin

  // --- J4: full join (empty-plot restore shape, R/fia_tidy.R:104-136)
  private def fullJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val d1 = o.filter($"o_orderstatus" === "F")
      .groupBy(year($"o_orderdate").cast(IntegerType).as("yr"))
      .agg(count(lit(1)).as("cnt_f"))
    val d2 = o.filter($"o_orderstatus" === "O")
      .groupBy(year($"o_orderdate").cast(IntegerType).as("yr"))
      .agg(dsum($"o_totalprice", 2).as("sum_o"))
    d1.join(d2, Seq("yr"), "full")
  }

  private val fullJoinSql =
    """WITH d1 AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS cnt_f
      |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      |d2 AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_o
      |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
      |SELECT coalesce(d1.yr, d2.yr) AS yr, d1.cnt_f, d2.sum_o
      |FROM d1 FULL JOIN d2 ON d1.yr = d2.yr""".stripMargin

  // --- J6: equi + range-residual broadcast join (TPA rules,
  //     R/interpolate_data.R:70-77); stays a BroadcastHashJoin on the
  //     equi key with the range as residual condition — no shuffle.
  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tiers = s.createDataFrame(Seq(
      ("R", 0, 10, 74.965282), ("R", 10, 25, 6.018046), ("R", 25, 100, 1.234),
      ("A", 0, 10, 74.965282), ("A", 10, 25, 6.018046), ("A", 25, 100, 1.234),
      ("N", 0, 10, 60.0), ("N", 10, 25, 5.5), ("N", 25, 100, 0.999)))
      .toDF("flag", "lo", "hi", "rate")
    Tables.lineitem(s, dir)
      .join(
        broadcast(tiers),
        $"l_returnflag" === $"flag" && $"l_quantity" >= $"lo" && $"l_quantity" < $"hi",
        "left")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"rate")
  }

  private val rangeJoinSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, t.rate
      |FROM lineitem
      |LEFT JOIN (VALUES
      |  ('R', 0, 10, 74.965282), ('R', 10, 25, 6.018046), ('R', 25, 100, 1.234),
      |  ('A', 0, 10, 74.965282), ('A', 10, 25, 6.018046), ('A', 25, 100, 1.234),
      |  ('N', 0, 10, 60.0), ('N', 10, 25, 5.5), ('N', 25, 100, 0.999)
      |) t(flag, lo, hi, rate)
      |ON l_returnflag = t.flag AND l_quantity >= t.lo AND l_quantity < t.hi""".stripMargin

  // --- J10/J11: multi-level coefficient fallback (predictCRM2's
  //     applyAllLevels/combineLevels2 rewritten to joins + coalesce)
  private def coefFallback(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir)
    val l1 = p.filter($"p_partkey" % 7 === 0)
      .select($"p_partkey", ($"p_retailprice" * 2).as("coef"))
    val l2 = p.filter($"p_brand".like("Brand#1%"))
      .groupBy($"p_brand").agg(min($"p_retailprice").as("coef"))
    val l3 = p.groupBy($"p_brand").agg(max($"p_retailprice").as("coef"))
    FallbackJoin(
      p.select($"p_partkey", $"p_brand"),
      Seq((l1, Seq("p_partkey")), (l2, Seq("p_brand")), (l3, Seq("p_brand"))),
      valueCols = Seq("coef"),
      levelCol = Some("lvl"))
      .select($"p_partkey", $"coef", $"lvl")
  }

  private val coefFallbackSql =
    """WITH l1 AS (SELECT p_partkey, p_retailprice * 2 AS c1 FROM part WHERE p_partkey % 7 = 0),
      |l2 AS (SELECT p_brand, min(p_retailprice) AS c2 FROM part
      |       WHERE p_brand LIKE 'Brand#1%' GROUP BY 1),
      |l3 AS (SELECT p_brand, max(p_retailprice) AS c3 FROM part GROUP BY 1)
      |SELECT p.p_partkey, coalesce(l1.c1, l2.c2, l3.c3) AS coef,
      |  CASE WHEN l1.c1 IS NOT NULL THEN 1
      |       WHEN l2.c2 IS NOT NULL THEN 2
      |       WHEN l3.c3 IS NOT NULL THEN 3 END AS lvl
      |FROM part p
      |LEFT JOIN l1 ON p.p_partkey = l1.p_partkey
      |LEFT JOIN l2 ON p.p_brand = l2.p_brand
      |LEFT JOIN l3 ON p.p_brand = l3.p_brand""".stripMargin

  // --- J16: explicit cross join (legacy year-grid shape,
  //     scripts/06-check-annualized.R:61-68)
  private def crossJoinGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select($"r_name", $"n_name", ($"r_regionkey" * 100 + $"n_nationkey").as("cell"))
  }

  private val crossJoinGridSql =
    """SELECT r_name, n_name, r_regionkey * 100 + n_nationkey AS cell
      |FROM region CROSS JOIN nation""".stripMargin

  // --- semi/anti joins (existence tests without multiplicity blowup —
  // the shape a curation pipeline uses for allowlist/denylist filtering;
  // plans as BroadcastHashJoin LeftSemi/LeftAnti, fact never duplicated)
  private def semiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hot = Tables.orders(s, dir)
      .filter(year($"o_orderdate") === 1995)
      .select($"o_custkey")
    Tables.customer(s, dir)
      .join(hot, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_mktsegment")
  }

  private val semiJoinSql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_custkey IN
      |  (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)""".stripMargin

  private def antiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
  }

  private val antiJoinSql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_semi_join" -> (semiJoin _),
    "q_anti_join" -> (antiJoin _),
    "q_cross_join" -> (crossJoinGrid _),
    "q_filter_project" -> (filterProject _),
    "q_composite_ids" -> (compositeIds _),
    "q_coalesce_fill" -> (coalesceFill _),
    "q_sentinel_roundtrip" -> (sentinelRoundtrip _),
    "q_case_rewrite" -> (caseRewrite _),
    "q_division" -> (divisionDerive _),
    "q_star_join" -> (starJoin _),
    "q_nullsafe_join" -> (nullSafeJoin _),
    "q_full_join" -> (fullJoin _),
    "q_range_join" -> (rangeJoin _),
    "q_coef_fallback" -> (coefFallback _))

  val oracles: Map[String, String] = Map(
    "q_semi_join" -> semiJoinSql,
    "q_anti_join" -> antiJoinSql,
    "q_cross_join" -> crossJoinGridSql,
    "q_filter_project" -> filterProjectSql,
    "q_composite_ids" -> compositeIdsSql,
    "q_coalesce_fill" -> coalesceFillSql,
    "q_sentinel_roundtrip" -> sentinelRoundtripSql,
    "q_case_rewrite" -> caseRewriteSql,
    "q_division" -> divisionDeriveSql,
    "q_star_join" -> starJoinSql,
    "q_nullsafe_join" -> nullSafeJoinSql,
    "q_full_join" -> fullJoinSql,
    "q_range_join" -> rangeJoinSql,
    "q_coef_fallback" -> coefFallbackSql)
}
