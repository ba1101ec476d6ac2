package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q47–q48: the reference's generic event-extraction utilities.
  *
  * q47 re-expresses `event_getDateCols(cols, labs)` (reference
  * events.R:22-48): the ONE parameterized unpivot all 20 `event_*`
  * extractors are instances of — a caller-chosen column list with paired
  * caller-chosen labels becomes a long (entity, event_type, value) log.
  * q48 re-expresses `event_getPriorLocs`' STAFF self-join (reference
  * events.R:95-100): a dim row resolving attributes of its PARENT row in
  * the same dim (staff → parent location → name).
  */
object EventLog {

  /** Parameterized unpivot: `cols(i)` becomes rows labeled `labels(i)`.
    * Identity columns pass through. The unpivot is a zero-shuffle
    * projection (Spark Expand) — each input row emits cols.size output
    * rows map-side, so the utility composes with any downstream agg
    * without its own exchange.
    */
  def unpivotLog(df: DataFrame, idCols: Seq[String], cols: Seq[String],
      labels: Seq[String], typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(cols.size == labels.size, "cols and labels must pair up")
    val renamed = df.select(
      (idCols.map(col) ++ cols.zip(labels).map { case (c, l) => col(c).as(l) }): _*)
    renamed.unpivot(idCols.map(col).toArray, labels.map(col).toArray,
      typeCol, valueCol)
  }

  /** q47: three differently-parameterized invocations of [[unpivotLog]]
    * (different tables, column-set sizes, and labels) unioned into one
    * log — the generic form of the reference's per-extractor gathers.
    */
  def q47ParamUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    def shaped(df: DataFrame, caseCol: String, lineCol: Option[String]): DataFrame =
      df.select(col(caseCol).as("case_key"),
        lineCol.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("line"),
        col("event_type"), col("value"))
    val measures = shaped(
      unpivotLog(li, Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice"), Seq("QTY", "PRICE")),
      "l_orderkey", Some("l_linenumber"))
    val rates = shaped(
      unpivotLog(li, Seq("l_orderkey", "l_linenumber"),
        Seq("l_discount", "l_tax"), Seq("DISCOUNT", "TAX")),
      "l_orderkey", Some("l_linenumber"))
    val totals = shaped(
      unpivotLog(ord, Seq("o_orderkey"), Seq("o_totalprice"), Seq("TOTAL")),
      "o_orderkey", None)
    measures.unionByName(rates).unionByName(totals)
      .filter(col("value").isNotNull)
      .orderBy("case_key", "line", "event_type")
  }

  /** q48: self-referential dim resolution — every customer resolves its
    * "team lead" (the row at its decade-base key) IN THE SAME dim, then
    * the lead's nation name via a broadcast dim hop. One self-join on the
    * dim (shuffle bounded by dim size, never the fact table) plus a
    * broadcast — the exact shape of staff → parent location → name.
    */
  def q48SelfDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val leads = c.select(col("c_custkey").as("lead_key"),
      col("c_name").as("lead_name"), col("c_nationkey").as("lead_nationkey"))
    c.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        (col("c_custkey") - pmod(col("c_custkey"), lit(10))).as("lead_key"))
      .join(leads, Seq("lead_key"), "left")
      .join(broadcast(Tables.nation(spark, dir)),
        col("lead_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("lead_key"), col("lead_name"),
        col("n_name").as("lead_nation"),
        (col("c_nationkey") === col("lead_nationkey")).as("same_nation"))
      .orderBy("c_custkey")
  }

  /** q52: trace aggregation (process mining). Mirrors the reference's
    * status-API trace analysis (scratch/other/status-api-traces.R:104-117):
    * a per-case ordered activity sequence becomes a trace string, and
    * traces are ranked by frequency with coverage shares — edeaR's
    * `trace_coverage(level_of_analysis = "trace")`, whose top-88 rows feed
    * the public status API. The case grain here is the session (q07's
    * 30-min gap rule) — the analogue of one appeal's event log.
    *
    * Scale posture: the per-case sequence is `array_sort(collect_list)`
    * inside the session aggregation — state bounded by events-per-case,
    * never the corpus; the frequency table then lives on the TRACE grain
    * (distinct behavior patterns — thousands, not billions), so the two
    * unpartitioned windows (total + cumulative coverage) run over an
    * already-tiny relation, the same safe-by-construction posture as
    * q11/q12's cumulative curves.
    */
  /** Per-case (session) ordered activity-sequence string — the trace
    * grain q52's ranking and q55's conformance check both consume. ONE
    * definition so the two can never disagree on sessionization or
    * trace construction. */
  private def caseTraces(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_num", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_num")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
        x => x.getField("event_type"))).as("trace"))
  }

  def q52Traces(spark: SparkSession, dir: String): DataFrame = {
    val traces = caseTraces(spark, dir)
    val freq = traces.groupBy("trace").agg(count(lit(1)).as("n_cases"))
    val wRank = Window.orderBy(col("n_cases").desc, col("trace"))
    freq
      .withColumn("total", sum(col("n_cases")).over(Window.partitionBy()))
      .withColumn("cum_n", sum(col("n_cases")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 88)
      .select(col("rnk"), col("trace"), col("n_cases"),
        round(col("n_cases").cast("double") / col("total").cast("double"), 6).as("coverage"),
        round(col("cum_n").cast("double") / col("total").cast("double"), 6).as("cum_coverage"))
      .orderBy("rnk")
  }

  /** q55 reference-model size: the top-K trace variants stand in for
    * the documented process model (the public status API serves the
    * reference's top-88; 10 keeps all three conformance classes
    * populated on this corpus). Prefix length for partial conformance. */
  val ConformanceTopK = 10
  val ConformancePrefix = 2

  /** q55: conformance checking — process mining's second step after
    * q52's trace discovery (the reference's top-88 trace table feeds a
    * public API; cases matching no known trace are its "other" bucket).
    * Each case is classified against the top-[[ConformanceTopK]] trace
    * variants: `conformant` (its full trace IS a reference variant),
    * `prefix_only` (its first [[ConformancePrefix]] activities match a
    * reference variant's prefix — it STARTED on-process and then
    * deviated), or `deviant`. Output is the per-status rollup with
    * integer permyriad case shares.
    *
    * 100 TB posture: the reference model is K rows — both the variant
    * set and the prefix set broadcast; the case grain is touched by two
    * map-side hash probes and one final aggregation on a 3-value key.
    * The sessionization shuffle is the same single user-key exchange
    * q07/q52 pay (shared definition, [[caseTraces]]).
    */
  def q55Conformance(spark: SparkSession, dir: String): DataFrame = {
    val traces = caseTraces(spark, dir)
    val pfx = (c: org.apache.spark.sql.Column) =>
      concat_ws(">", slice(split(c, ">"), 1, ConformancePrefix))
    val ref = traces.groupBy("trace").agg(count(lit(1)).as("n_cases"))
      .orderBy(col("n_cases").desc, col("trace"))
      .limit(ConformanceTopK)
      .select(col("trace").as("ref_trace"))
    val refPfx = ref.select(pfx(col("ref_trace")).as("ref_prefix")).distinct()
    traces
      .join(broadcast(ref), col("trace") === col("ref_trace"), "left")
      .join(broadcast(refPfx), pfx(col("trace")) === col("ref_prefix"), "left")
      .withColumn("status",
        when(col("ref_trace").isNotNull, "conformant")
          .when(col("ref_prefix").isNotNull, "prefix_only")
          .otherwise("deviant"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_cases"),
        countDistinct(col("trace")).as("n_distinct_traces"))
      .withColumn("total", sum(col("n_cases")).over(Window.partitionBy()))
      .select(col("status"), col("n_cases"), col("n_distinct_traces"),
        expr("n_cases * 10000 DIV total").as("share_pm"))
      .orderBy("status")
  }
}
