package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational/temporal operators q01–q20 (SURVEY.md §2).
  *
  * Each re-expresses a capability of the reference R library
  * (`/root/reference/R/events.R`, `scratch/...`) Spark-first: declarative
  * DataFrame plans, window functions for the reference's vector tricks,
  * broadcast joins for dims, aggregate-then-window for time series.
  *
  * Every query has a deterministic total order (ORDER BY all output
  * columns or a unique key) and aliases that match the DuckDB oracle
  * exactly.
  */
object CoreQueries {

  /** q01: filtered scan with exclusion predicates.
    * Mirrors EventCaseExclusions (reference constants.R:2): dummy-key and
    * merged-case exclusions applied to every case scan. Filters + column
    * pruning push into the parquet scan.
    */
  def q01CaseScan(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") =!= "P" &&
        col("o_totalprice") > 500.0 &&
        !col("o_orderkey").isin(42L, 4242L))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** q02: unpivot measure columns into a long (metric, value) event log.
    * Mirrors event_getDateCols + tidyr::gather (reference events.R:22,48):
    * N date columns of BRIEFF → long event rows.
    */
  def q02EventUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .filter(col("value").isNotNull)
      .orderBy("l_orderkey", "l_linenumber", "metric")
  }

  /** q03: union heterogeneous event sources into one unified log.
    * Mirrors event_all (reference events.R:923): every extractor's output
    * rbind-ed into a single (entity, type, date) fact log.
    */
  def q03EventUnion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("entity_id"), col("event_type"), col("ts"))
    val placed = Tables.orders(spark, dir)
      .select(col("o_custkey").as("entity_id"),
        lit("ORDER_PLACED").as("event_type"), col("o_orderdate").as("ts"))
    val shipped = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("entity_id"),
        lit("SHIPPED").as("event_type"), col("l_shipdate").as("ts"))
    ev.unionByName(placed).unionByName(shipped)
      .orderBy("entity_id", "ts", "event_type")
  }

  /** q04: dedup events per (entity, type) keeping the earliest.
    * Mirrors event_ssoc's distinct(BFCORLID, DATE) (reference events.R:409),
    * made deterministic (min instead of first-encountered).
    */
  def q04DistinctEvents(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(min(col("ts")).as("first_ts"))
      .orderBy("user_id", "event_type")
  }

  /** q05: multi-hop broadcast dim join + rollup aggregation.
    * Mirrors the STAFF lookup join (reference events.R:95) and the ro.csv
    * joins (scratch/other/pending-nods.R). Dims are broadcast — no shuffle
    * on the fact side beyond the final aggregation.
    */
  def q05DimJoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("r_name", "n_name")
  }

  /** q06: lead/lag transition detection over per-entity ordered log.
    * Mirrors .parseVSOLocs (reference events.R:139): LOC_PLUS1 via shifted
    * vectors → here a lag() window; emits TO_/FROM_ 'purchase' transitions.
    */
  def q06LeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("transition",
        when(col("event_type") === "purchase" &&
          (col("prev_type").isNull || col("prev_type") =!= "purchase"), "TO_PURCHASE")
        .when(col("event_type") =!= "purchase" && col("prev_type") === "purchase", "FROM_PURCHASE"))
      .filter(col("transition").isNotNull)
      .select("user_id", "event_id", "transition", "ts")
      .orderBy("user_id", "ts", "event_id")
  }

  /** q07: gap-based sessionization via cumulative sum of breaks.
    * Mirrors .parseDecisionLocs' group_by(cumsum(!grepl(...))) segmentation
    * (reference events.R:214): a running sum over an ordered per-entity
    * log splits it into contiguous segments. Gap rule: >30 min starts a
    * new session. One shuffle on user_id; both windows share it.
    */
  def q07Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_num", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_num")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_num")
  }

  /** q08: latest event per (entity, type) with deterministic tie-break.
    * Mirrors .parseRemReturnLocs (reference events.R:263): last checkout to
    * location 96 wins (row_number()==n() → here row_number over desc).
    */
  def q08LastPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("ts").as("last_ts"),
        col("value").as("last_value"), col("event_id").as("last_event_id"))
      .orderBy("user_id", "event_type")
  }

  /** q09: count + N conditional aggregates per group.
    * Mirrors scratch/hearings/by-ro.R: count(*) plus
    * sum(case when HEARING_DISP='H' then 1 end) family per RO.
    */
  def q09ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_pending"),
        sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0)).as("n_high_value"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy("o_orderpriority")
  }

  /** q10: group quantiles of pending ages.
    * Mirrors scratch/other/pending-nods.R: quantile(days_pending,
    * .5/.75/.95) per RO of open NODs. Interpolated percentiles ≡ DuckDB
    * quantile_cont.
    */
  def q10Quantiles(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("2002-01-01 00:00:00"))
    val days = datediff(cutoff.cast("date"), col("o_orderdate").cast("date"))
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("days_pending", days.cast("double"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_open"),
        round(expr("percentile(days_pending, 0.5)"), 4).as("p50_days"),
        round(expr("percentile(days_pending, 0.75)"), 4).as("p75_days"),
        round(expr("percentile(days_pending, 0.95)"), 4).as("p95_days"))
      .orderBy("n_name")
  }
}
