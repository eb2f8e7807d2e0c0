package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.2/2.4/2.5/2.6/2.7/2.8) over
  * the TPC-H-ish fixtures, each with a DuckDB oracle.
  *
  * Money sums use the integer-cents trick: summing 60k doubles accumulates
  * ~1e-2 fp error across engines, which can flip a round-to-2-decimals hash;
  * round(price*100) per row is exact, and BIGINT sums are exact in both.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: multi-aggregate groupBy with exact money arithmetic.
    "q1_agg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus").agg(
          F.sum("l_quantity").cast("long").as("sum_qty"),
          F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).as("sum_base_price_c"),
          F.sum(F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000)
            .cast("long")).as("sum_disc_price_e4"),
          F.round(F.sum("l_quantity") / F.count(F.lit(1)), 4).as("avg_qty"),
          F.count(F.lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Star join with broadcast dims: revenue per nation.
    "q2_join_agg" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val n = t(s, d, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(F.broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).as("revenue_c"),
          F.count(F.lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // Top-k without full sort (TakeOrderedAndProject).
    "q3_topk" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      o.join(F.broadcast(c), o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
        .limit(10)
    }),

    // Window lead + row_number over the event stream (W1/W2).
    "q4_window" -> ((s, d) => {
      val e = t(s, d, "events")
      val w = Window.partitionBy("user_id").orderBy("event_id")
      // ts is TIMESTAMP_NTZ in the parquet; pin to UTC instants for
      // unix_micros (session TZ is UTC, so the cast is deterministic).
      val tsL = (c: Column) => F.unix_micros(c.cast("timestamp_ltz"))
      e.select(F.col("event_id"), F.col("user_id"),
          F.row_number().over(w).as("rn"),
          F.coalesce(
            tsL(F.lead("ts", 1).over(w)) - tsL(F.col("ts")),
            F.lit(-1L)).as("delta_us"))
        .orderBy("event_id")
    }),

    // Running money sum with explicit frame (W-frame).
    "q5_running" -> ((s, d) => {
      val o = t(s, d, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(F.col("o_orderkey"), F.col("o_custkey"),
          F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w).as("running_c"))
        .orderBy("o_orderkey")
    }),

    // Left-anti: customers with no high-value order (J3/O4).
    "q6_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").where(F.col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // Left-semi: distinct event users that are also customers (J4).
    "q7_semi" -> ((s, d) => {
      val e = t(s, d, "events").select(F.col("user_id")).distinct()
      val c = t(s, d, "customer")
      e.join(c, e("user_id") === c("c_custkey"), "left_semi")
        .orderBy("user_id")
    }),

    // Scalar-function sampler incl. JSON-ish extraction from props.
    "q8_scalar" -> ((s, d) => {
      val e = t(s, d, "events")
      e.select(F.col("event_id"),
          F.get_json_object(F.col("props"), "$.k").cast("long").as("k"),
          F.upper(F.col("event_type")).as("etype_u"),
          F.length(F.col("event_type")).cast("long").as("etype_len"),
          F.round(F.abs(F.col("value")) + F.pmod(F.col("event_id"), F.lit(7)), 2).as("vmix"))
        .orderBy("event_id")
    }),

    // Union + distinct set op over two key universes (O3).
    "q9_setops" -> ((s, d) => {
      val e = t(s, d, "events").select(F.col("user_id").as("k"))
      val c = t(s, d, "customer").select(F.col("c_custkey").as("k"))
      e.union(c).distinct().orderBy("k")
    }),

    // Multi-way join + filter pushdown + grouped count distinct.
    "q10_multijoin" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(F.broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .where(F.col("l_quantity") > 40)
        .groupBy("n_name")
        .agg(F.countDistinct("o_orderkey").as("big_orders"),
             F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).as("rev_c"))
        .orderBy("n_name")
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join_agg" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q3_topk" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_window" ->
      """SELECT event_id, user_id,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  coalesce(epoch_us(lead(ts, 1) OVER w) - epoch_us(ts), -1) AS delta_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,

    "q5_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q6_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q7_semi" ->
      """SELECT DISTINCT user_id FROM events
        |WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = user_id)
        |ORDER BY user_id""".stripMargin,

    "q8_scalar" ->
      """SELECT event_id,
        |  CAST(trim(replace(replace(props, '{"k":', ''), '}', '')) AS BIGINT) AS k,
        |  upper(event_type) AS etype_u,
        |  CAST(length(event_type) AS BIGINT) AS etype_len,
        |  round(abs(value) + (event_id % 7), 2) AS vmix
        |FROM events ORDER BY event_id""".stripMargin,

    "q9_setops" ->
      """SELECT DISTINCT k FROM (
        |  SELECT user_id AS k FROM events
        |  UNION ALL SELECT c_custkey FROM customer)
        |ORDER BY k""".stripMargin,

    "q10_multijoin" ->
      """SELECT n_name,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS big_orders,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_quantity > 40
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
