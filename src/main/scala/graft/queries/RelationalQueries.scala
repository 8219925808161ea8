package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface over the TPC-H-ish driver tables.
  *
  * The reference engine has no relational operators (SURVEY.md §2.3/§2.4) —
  * these come free from Spark SQL; each query here exists to pin exact,
  * DuckDB-verifiable semantics for scans, joins (broadcast + shuffle),
  * aggregation, windows, rollup and anti-joins.
  *
  * Numeric determinism convention (oracle hash parity): money/measure
  * aggregates are computed in DECIMAL (exact, order-independent) and cast to
  * DOUBLE at the end, then round(4) (resp. round(6)): DuckDB's
  * decimal->double cast divides the int128 unscaled value by the scale
  * factor in floating point (a double-rounding), while Spark converts the
  * exact decimal — at >= 5e9 sums the two can differ by 1 ulp, and the
  * final decimal-digit round lands both on the identical double; raw
  * column values pass through untouched; ratios are DOUBLE divisions of
  * exactly-equal numerators/denominators. Every LIMIT has a deterministic
  * ORDER BY tiebreak.
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
  /** exact decimal revenue term: extendedprice * (1 - discount) */
  private def revenueTerm(price: org.apache.spark.sql.Column, disc: org.apache.spark.sql.Column) =
    dec(price) * (lit(1).cast("decimal(18,4)") - dec(disc))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(dec(col("l_quantity"))).cast("double"), 4).as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double"), 4).as("sum_base_price"),
        round(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double"), 4).as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
      | round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
      | round(CAST(SUM(%REV%) AS DOUBLE), 4) AS sum_disc_price,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
      .replace("%REV%", revenueSql)

  /** Top-10 orders by revenue for one market segment (broadcast dim join →
    * shuffle agg → global top-k; deterministic tiebreak on orderkey). */
  def q3Top10(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double"), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3Top10Sql: String =
    """SELECT l_orderkey, round(CAST(SUM(%REV%) AS DOUBLE), 4) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin
      .replace("%REV%", revenueSql)

  /** Revenue by nation for one region — 6-way join; small dims broadcast. */
  def q5Nation(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double"), 4).as("revenue"))
  }

  val q5NationSql: String =
    """SELECT n_name, round(CAST(SUM(%REV%) AS DOUBLE), 4) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin.replace("%REV%", revenueSql)

  /** Per-supplier running quantity + row_number. The synthetic lineitem is
    * NOT TPC-H-unique on (orderkey, linenumber) — duplicate full sort keys
    * exist at sf0.1 — so l_quantity joins the sort key: rows tied on every
    * sort column are then identical in all output columns, making the
    * running sum order-insensitive. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).cast("int").as("rn"),
        sum(dec(col("l_quantity"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"))
  }

  val windowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      | CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS INT) AS rn,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
      |FROM lineitem""".stripMargin

  /** Top-3 orders per customer by total price (rank window). */
  def top3PerCust(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("int").as("rk"))
      .filter(col("rk") <= 3)
  }

  val top3PerCustSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
      |FROM orders QUALIFY rk <= 3""".stripMargin

  /** Customers with no orders (anti-join). */
  def custNoOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  val custNoOrdersSql: String =
    "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"

  /** Part stats per brand: counts, distinct types, price extremes, avg size. */
  def brandStats(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).groupBy("p_brand").agg(
      count(lit(1)).as("n_parts"),
      countDistinct(col("p_type")).as("n_types"),
      min(col("p_retailprice")).as("min_price"),
      max(col("p_retailprice")).as("max_price"),
      (sum(col("p_size").cast("long")).cast("double") / count(lit(1))).as("avg_size"))

  val brandStatsSql: String =
    """SELECT p_brand, COUNT(*) AS n_parts, COUNT(DISTINCT p_type) AS n_types,
      | min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
      | CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_size
      |FROM part GROUP BY p_brand""".stripMargin

  /** Full cube over priority/status (all grouping sets). */
  def cubeOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).cube("o_orderpriority", "o_orderstatus").agg(
      count(lit(1)).as("n"),
      round(sum(dec(col("o_totalprice"))).cast("double"), 4).as("total"))

  val cubeOrdersSql: String =
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      | round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  /** Set operations: brands selling both small and large parts (INTERSECT)
    * and small-only brands (EXCEPT). */
  def brandSetOps(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val small = p.filter(col("p_size") <= 10).select("p_brand").distinct()
    val large = p.filter(col("p_size") > 40).select("p_brand").distinct()
    small.intersect(large).withColumn("cls", lit("both"))
      .unionByName(small.except(large).withColumn("cls", lit("small_only")))
  }

  val brandSetOpsSql: String =
    """WITH small AS (SELECT DISTINCT p_brand FROM part WHERE p_size <= 10),
      |large AS (SELECT DISTINCT p_brand FROM part WHERE p_size > 40)
      |SELECT p_brand, 'both' AS cls FROM (SELECT p_brand FROM small INTERSECT SELECT p_brand FROM large)
      |UNION ALL
      |SELECT p_brand, 'small_only' AS cls FROM (SELECT p_brand FROM small EXCEPT SELECT p_brand FROM large)""".stripMargin

  /** Correlated EXISTS: customers with at least one high-value order. */
  def custHighValue(s: SparkSession, dir: String): DataFrame = {
    val threshold = 100000.0
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > threshold),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  val custHighValueSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)""".stripMargin

  /** Statistical aggregates: sample stddev/variance + Pearson correlation
    * (rounded — engines differ in summation order at ~1e-15). */
  def lineitemStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
      round(var_samp(col("l_extendedprice")), 2).as("var_price"),
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"))

  val lineitemStatsSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      | round(stddev_samp(l_quantity), 6) AS sd_qty,
      | round(var_samp(l_extendedprice), 2) AS var_price,
      | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the interpolation formula; the
    * percentile_approx sketch variant is NOT oracle-able and lives in the
    * engine API only). */
  def pricePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).groupBy("o_orderstatus").agg(
      round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
      round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
      round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))

  val pricePercentilesSql: String =
    """SELECT o_orderstatus,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** String-function breadth: case/substring/replace + edit distance. */
  def docStringOps(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      upper(substring(col("text"), 1, 12)).as("head_upper"),
      length(regexp_replace(col("text"), "the", "THE")).as("len_replaced"),
      levenshtein(substring(col("text"), 1, 20), substring(col("text"), 11, 20)).as("edit_dist"))

  val docStringOpsSql: String =
    """SELECT doc_id,
      | upper(substr(text, 1, 12)) AS head_upper,
      | CAST(length(regexp_replace(text, 'the', 'THE', 'g')) AS INT) AS len_replaced,
      | CAST(levenshtein(substr(text, 1, 20), substr(text, 11, 20)) AS INT) AS edit_dist
      |FROM documents""".stripMargin

  /** Rollup over returnflag/linestatus (grouping-set aggregation). */
  def rollupReturns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).rollup("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n"),
      round(sum(dec(col("l_quantity"))).cast("double"), 4).as("qty"))

  val rollupReturnsSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** Hourly event rollup (batch twin of the streaming tumbling window). */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("total"))

  val eventsHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h, event_type,
      | COUNT(*) AS n, round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sessionization: 30-min-gap sessions per user (lag + cumulative-sum
    * windows — batch twin of mapGroupsWithState sessionization). */
  def eventsSessions(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800000000L // 30 min in microseconds
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("total"))
  }

  val eventsSessionsSql: String =
    """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
      |s AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM l),
      |sid AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS INT) AS session_id FROM s)
      |SELECT user_id, session_id, COUNT(*) AS n, min(event_id) AS first_event,
      | max(event_id) AS last_event,
      | round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total
      |FROM sid GROUP BY user_id, session_id""".stripMargin

  /** As-of join: each event picks up the user's most recent STRICTLY
    * earlier purchase (point-in-time correctness — no future leakage).
    * Custom operator (Spark lacks as-of joins); DuckDB native ASOF JOIN is
    * the oracle. */
  def eventsAsofPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    graft.operators.AsOfJoin.join(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      purchases, key = "user_id", leftTime = "ts", rightTime = "ts",
      valueCols = Seq("event_id", "value"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("asof_event_id"), col("asof_value"))
  }

  val eventsAsofPurchaseSql: String =
    """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
      |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS us,
      |       p.event_id AS asof_event_id, p.value AS asof_value
      |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts > p.ts""".stripMargin

  /** Market-segment order stats (fact->dim shuffle join + distinct agg). */
  def mktSegmentRev(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        round(sum(dec(col("o_totalprice"))).cast("double"), 4).as("total"))

  val mktSegmentRevSql: String =
    """SELECT c_mktsegment, COUNT(DISTINCT o_orderkey) AS n_orders,
      | round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
      |FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg _,
    "q3_top10" -> q3Top10 _,
    "q5_nation" -> q5Nation _,
    "window_running" -> windowRunning _,
    "top3_per_cust" -> top3PerCust _,
    "cust_no_orders" -> custNoOrders _,
    "brand_stats" -> brandStats _,
    "cube_orders" -> cubeOrders _,
    "lineitem_stats" -> lineitemStats _,
    "price_percentiles" -> pricePercentiles _,
    "doc_string_ops" -> docStringOps _,
    "brand_setops" -> brandSetOps _,
    "cust_high_value" -> custHighValue _,
    "rollup_returns" -> rollupReturns _,
    "events_hourly" -> eventsHourly _,
    "events_sessions" -> eventsSessions _,
    "events_asof_purchase" -> eventsAsofPurchase _,
    "mkt_segment_rev" -> mktSegmentRev _)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q3_top10" -> q3Top10Sql,
    "q5_nation" -> q5NationSql,
    "window_running" -> windowRunningSql,
    "top3_per_cust" -> top3PerCustSql,
    "cust_no_orders" -> custNoOrdersSql,
    "brand_stats" -> brandStatsSql,
    "cube_orders" -> cubeOrdersSql,
    "lineitem_stats" -> lineitemStatsSql,
    "price_percentiles" -> pricePercentilesSql,
    "doc_string_ops" -> docStringOpsSql,
    "brand_setops" -> brandSetOpsSql,
    "cust_high_value" -> custHighValueSql,
    "rollup_returns" -> rollupReturnsSql,
    "events_hourly" -> eventsHourlySql,
    "events_sessions" -> eventsSessionsSql,
    "events_asof_purchase" -> eventsAsofPurchaseSql,
    "mkt_segment_rev" -> mktSegmentRevSql)
}
