package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Relational operator coverage (SURVEY.md §2.2–§2.7) over the driver's
  * TPC-H-ish tables, each with a DuckDB-equivalent oracle. Aggregate
  * arithmetic goes through DECIMAL so sums are order-independent and
  * engine/oracle agree bit-for-bit (double summation order differs).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1: hash aggregate with partial (map-side) combine
    "q10_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // summed as DECIMAL (order-independent, exact), then cast to
          // DOUBLE so the value REPRESENTATION reaching the driver's
          // hasher is reader-independent: Spark's DECIMAL(28,2) parquet
          // and DuckDB's native DECIMAL(38,2) sum stringify differently
          // even when numerically identical (round-1 q10 hash mismatch)
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J2-style broadcast hash join + aggregate
    "q11_join_revenue" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(28,2)").as("revenue"),
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // O3: deterministic top-k (tie-broken by unique key)
    "q12_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // W-family: ranking window, top-3 per partition
    "q13_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy("o_custkey", "rn")
    }),

    // J1-family: anti join
    "q14_antijoin_customers" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // semi join
    "q15_semijoin_customers" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // U-family: except / intersect
    "q16_setops_nations" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      val cus = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      sup.except(cus).withColumn("op", lit("except"))
        .unionByName(sup.intersect(cus).withColumn("op", lit("intersect")))
        .select("op", "nationkey")
        .orderBy("op", "nationkey")
    }),

    // X8: JSON property access on the events stream table
    "q17_json_events" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // rollup (metrics-style hierarchy)
    "q18_rollup_customers" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name")
        .createOrReplaceTempView("q18_joined")
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_cust FROM q18_joined
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    // array aggregation (collect + sort + join)
    "q19_array_lines" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("lines"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q10_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q11_join_revenue" ->
      """SELECT c_mktsegment,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS revenue,
        | CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q12_topk_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q13_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, order_date FROM (
        | SELECT o_custkey, o_orderkey,
        |   CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS INT) AS rn,
        |   strftime(o_orderdate, '%Y-%m-%d') AS order_date
        | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q14_antijoin_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q15_semijoin_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q16_setops_nations" ->
      """SELECT 'except' AS op, nationkey FROM (
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        |  EXCEPT SELECT DISTINCT c_nationkey FROM customer)
        |UNION ALL
        |SELECT 'intersect' AS op, nationkey FROM (
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        |  INTERSECT SELECT DISTINCT c_nationkey FROM customer)
        |ORDER BY op, nationkey""".stripMargin,

    "q17_json_events" ->
      """SELECT event_type,
        | CAST(SUM(k) AS BIGINT) AS sum_k, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_rollup_customers" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q19_array_lines" ->
      """SELECT l_orderkey,
        | array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        | CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
