package graft.operators

/** DuckDB oracle SQL for q01–q20 — semantically identical to the Spark
  * plans in [[CoreQueries]], with matching column aliases and the same
  * deterministic ORDER BY. Integer-exact where possible; doubles are
  * rounded identically on both sides. DuckDB-specific care: SUM(int)
  * returns HUGEINT → cast to BIGINT; events.ts is TIMESTAMP_NS → cast
  * to TIMESTAMP (micros) to match Spark's timestamp precision.
  */
object CoreOracles {
  val sql: Map[String, String] = Map(
    "q01_case_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus <> 'P' AND o_totalprice > 500.0
        |  AND o_orderkey NOT IN (42, 4242)
        |ORDER BY o_orderkey""".stripMargin,

    "q02_event_unpivot" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |) WHERE value IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q03_event_union" ->
      """SELECT * FROM (
        |  SELECT user_id AS entity_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  UNION ALL
        |  SELECT o_custkey, 'ORDER_PLACED', o_orderdate FROM orders
        |  UNION ALL
        |  SELECT o_custkey, 'SHIPPED', l_shipdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |) ORDER BY entity_id, ts, event_type""".stripMargin,

    "q04_distinct_events" ->
      """SELECT user_id, event_type, MIN(CAST(ts AS TIMESTAMP)) AS first_ts
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q05_dim_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q06_lead_lag" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), c AS (
        |  SELECT user_id, event_id,
        |         CASE WHEN event_type = 'purchase' AND (prev_type IS NULL OR prev_type <> 'purchase')
        |                THEN 'TO_PURCHASE'
        |              WHEN event_type <> 'purchase' AND prev_type = 'purchase'
        |                THEN 'FROM_PURCHASE' END AS transition,
        |         ts
        |  FROM t
        |)
        |SELECT user_id, event_id, transition, ts FROM c
        |WHERE transition IS NOT NULL
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q07_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM t
        |), g AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
        |  FROM s
        |)
        |SELECT user_id, session_num, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM g GROUP BY user_id, session_num
        |ORDER BY user_id, session_num""".stripMargin,

    "q08_last_per_key" ->
      """WITH t AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_type, ts AS last_ts, value AS last_value, event_id AS last_event_id
        |FROM t WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q09_conditional_agg" ->
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |       CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
        |       ROUND(AVG(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q10_quantiles" ->
      """SELECT n_name, COUNT(*) AS n_open,
        |       ROUND(quantile_cont(days_pending, 0.5), 4) AS p50_days,
        |       ROUND(quantile_cont(days_pending, 0.75), 4) AS p75_days,
        |       ROUND(quantile_cont(days_pending, 0.95), 4) AS p95_days
        |FROM (
        |  SELECT n_name,
        |         CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS DOUBLE) AS days_pending
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE o_orderstatus = 'O'
        |)
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
  )
}
