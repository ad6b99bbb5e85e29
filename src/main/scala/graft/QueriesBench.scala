package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classic multi-join analytics shapes plus remaining window/array/join
  * machinery: TPC-H-style Q3/Q4/Q5, ranking-function suite, RANGE-frame
  * rolling windows, higher-order array functions, a bloom-filter runtime
  * join prune, and the salted skew join as an oracle-gated query.
  *
  * These exercise the shuffle-heavy end of the engine (big-big joins,
  * window sorts) that the reference-derived gates (mostly broadcast-side
  * joins, SURVEY §2.3) do not stress.
  */
object QueriesBench {

  import Queries.dsum

  // --- TPC-H Q3 shape: two big-big joins + grouped revenue + top-k.
  //     The customer filter broadcasts; orders⋈lineitem shuffles on the
  //     join key once, and the final top-10 is a TakeOrderedAndProject
  //     (bounded per-partition heaps), not a global sort.
  private def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" < lit("1998-07-01").cast(TimestampType))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val l = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > lit("1998-07-01").cast(TimestampType))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  private val shippingPrioritySql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-07-01'
      |  AND l_shipdate > TIMESTAMP '1998-07-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  // --- TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
  //     (interval arithmetic on the probe side), then a tiny aggregate.
  private def orderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
    o.join(
        l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  private val orderPrioritySql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  // --- TPC-H Q5 shape: 6-table snowflake, local-supplier condition
  //     (c_nationkey = s_nationkey). All dims broadcast; the only
  //     shuffles are lineitem⋈orders and the final 5-row aggregate.
  private def localSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  private val localSupplierSql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  // --- Ranking-function suite: rank / dense_rank / row_number / ntile /
  //     cume_dist over a deterministic (value, key) order. One window
  //     sort per partition; no second shuffle.
  private def rankWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir).select(
      $"o_custkey", $"o_orderkey",
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      row_number().over(w).as("rn"),
      ntile(4).over(w).as("quartile"),
      cume_dist().over(w).as("cd"))
  }

  private val rankWindowsSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(rank()       OVER w AS INT) AS rnk,
      |  CAST(dense_rank() OVER w AS INT) AS drnk,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  CAST(ntile(4)     OVER w AS INT) AS quartile,
      |  cume_dist()       OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin

  // --- RANGE-frame rolling window: trailing 30-day spend per customer.
  //     Distinct from the ROWS frames used by the fill operators (W1,
  //     SURVEY §2.5): frame membership is by value distance on the
  //     ordering key. Decimal inside the frame sum keeps both engines
  //     bit-identical regardless of intra-frame order.
  private def rollingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NTZ → epoch seconds (session tz is UTC, so this is a pure relabel)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".cast(TimestampType).cast(LongType))
      .rangeBetween(-30L * 86400L, 0L)
    Tables.orders(s, dir).select(
      $"o_custkey", $"o_orderkey", $"o_orderdate",
      sum($"o_totalprice".cast(DecimalType(28, 2))).over(w)
        .cast(DoubleType).as("spend_30d"),
      count(lit(1)).over(w).as("n_orders_30d"))
  }

  private val rollingWindowSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) OVER w AS DOUBLE) AS spend_30d,
      |  count(*) OVER w AS n_orders_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)""".stripMargin

  // --- Higher-order array functions over tokenized text: transform /
  //     filter / aggregate / array_distinct all run inside whole-stage
  //     codegen — no UDF, no shuffle (narrow map over the scan).
  private def hofArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("words", split($"text", " "))
      .select(
        $"doc_id",
        size($"words").cast(LongType).as("n_words"),
        size(filter($"words", w => length(w) > 5)).cast(LongType).as("n_long"),
        aggregate($"words", lit(0L), (acc, x) => acc + length(x)).as("total_chars"),
        size(array_distinct($"words")).cast(LongType).as("n_distinct"))
  }

  private val hofArraySql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      |SELECT doc_id,
      |  CAST(len(words) AS BIGINT) AS n_words,
      |  CAST(len(list_filter(words, w -> length(w) > 5)) AS BIGINT) AS n_long,
      |  CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS total_chars,
      |  CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct
      |FROM t""".stripMargin

  // --- Bloom-filter runtime join prune: build a compact filter over the
  //     selective build side's keys, push it into the probe scan as a
  //     cheap predicate, then run the exact join on the survivors. At
  //     100 TB this is the difference between shuffling the whole fact
  //     table and shuffling ~the matching rows (false positives are
  //     removed by the real join, so the result is exact — the oracle is
  //     the plain join).
  private def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sel = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val bf = sel.stat.bloomFilter("o_orderkey", 300000L, 0.01)
    val bfB = s.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    Tables.lineitem(s, dir)
      .filter(mightContain($"l_orderkey"))
      .join(sel, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        count(lit(1)).as("n"))
  }

  private val bloomJoinSql =
    """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag""".stripMargin

  // --- Salted skew join as an oracle-gated query (ops.SkewJoin): the
  //     salt spreads each hot key across reducers; the aggregate after
  //     it proves row multiplicity is unchanged vs the plain join.
  private def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_quantity", $"l_linenumber")
    val o = Tables.orders(s, dir)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    graft.ops.SkewJoin.saltedJoin(l, o, Seq("l_orderkey"), salt = 8)
      .groupBy($"o_orderstatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
  }

  private val saltedJoinSql =
    """SELECT o_orderstatus, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shipping_priority" -> (shippingPriority _),
    "q_order_priority" -> (orderPriority _),
    "q_local_supplier" -> (localSupplier _),
    "q_rank_windows" -> (rankWindows _),
    "q_rolling_window" -> (rollingWindow _),
    "q_hof_array" -> (hofArray _),
    "q_bloom_join" -> (bloomJoin _),
    "q_salted_join" -> (saltedJoin _))

  val oracles: Map[String, String] = Map(
    "q_shipping_priority" -> shippingPrioritySql,
    "q_order_priority" -> orderPrioritySql,
    "q_local_supplier" -> localSupplierSql,
    "q_rank_windows" -> rankWindowsSql,
    "q_rolling_window" -> rollingWindowSql,
    "q_hof_array" -> hofArraySql,
    "q_bloom_join" -> bloomJoinSql,
    "q_salted_join" -> saltedJoinSql)
}
