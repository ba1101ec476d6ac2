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
  /** q07's gap sessionization at the EVENT grain — each event labeled
    * with its (user_id, session_num) case. The shared case definition:
    * q52's traces, q55's conformance, and q62's directly-follows edges
    * all consume this ONE sessionization, so the process-mining family
    * can never disagree on what a case is. The window is the single
    * user-key exchange the whole family pays. */
  private def sessionizedEvents(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_num", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-case (session) ordered activity-sequence string — the trace
    * grain q52's ranking and q55's conformance check both consume. */
  private def caseTraces(spark: SparkSession, dir: String): DataFrame =
    sessionizedEvents(spark, dir)
      .groupBy("user_id", "session_num")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
        x => x.getField("event_type"))).as("trace"))

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
    // |cases|-grain trace table checkpointed (q61's du pattern, r12 —
    // VERDICT r11 item 5): its consumers (the reference top-K, the
    // prefix set, and the probe side) otherwise each re-run the
    // event-grain sessionization exchange — ReuseExchange does not
    // fire across the differently-shaped parents. ref itself is NOT
    // checkpointed: its two consumers (broadcast + refPfx) re-run only
    // a trivial aggregate over the materialized |cases| table, cheaper
    // than a second eager materialization job.
    val traces = graft.Checkpoints.of(caseTraces(spark, dir))
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

  /** q62: the directly-follows graph — process mining's process-map
    * edge table (discovery step 1b alongside q52's trace variants; every
    * process-map renderer draws exactly this table). For each case (q52's
    * session — the ONE shared [[sessionizedEvents]] definition), every
    * consecutive activity pair contributes an edge, plus a virtual
    * START→first and last→END edge so source/sink activities are
    * explicit (reference: the status API's trace table is the path-level
    * view of the same event log, scratch/other/status-api-traces.R).
    * Per edge: observation count, distinct-case coverage, share of the
    * from-activity's outgoing edges (integer permyriad), and the mean
    * inter-activity gap in whole seconds (NULL on virtual edges —
    * START/END carry no timestamp).
    *
    * 100 TB posture: the edge derivation rides the SAME single user-key
    * exchange the whole q07/q52/q55 family pays — the (user_id,
    * session_num) lead/lag window is satisfied by the sessionization's
    * user_id hash partitioning (a subset of its keys), so Spark inserts
    * only a local sort, no second exchange (PlanSpec pins one exchange
    * below the edge grain). Each event emits ≤2 edge rows map-side
    * (bounded explode); the aggregation grain is |activities+2|² —
    * trivially broadcastable — and the outgoing-share window runs on
    * that aggregated grain, never on events.
    */
  def q62Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "session_num").orderBy("ts", "event_id")
    val edgeType = "array<struct<from_act:string,to_act:string,gap_us:bigint>>"
    val e = sessionizedEvents(spark, dir)
      .select(col("user_id"), col("session_num"), col("ts"), col("event_id"),
        col("event_type").as("act"), col("us"))
      .withColumn("nxt", lead(col("act"), 1).over(w))
      .withColumn("nxt_us", lead(col("us"), 1).over(w))
      .withColumn("is_first", lag(col("act"), 1).over(w).isNull)
    val edges = e
      .select(col("user_id"), col("session_num"),
        explode(concat(
          when(col("is_first"), array(struct(
            lit("START").as("from_act"), col("act").as("to_act"),
            lit(null).cast("long").as("gap_us"))))
            .otherwise(array().cast(edgeType)),
          array(struct(col("act").as("from_act"),
            coalesce(col("nxt"), lit("END")).as("to_act"),
            (col("nxt_us") - col("us")).as("gap_us"))))).as("edge"))
      .select(col("user_id"), col("session_num"), col("edge.*"))
    aggregateEdges(edges)
  }

  /** The edge-table rollup q62 and st42 share — (user_id, session_num,
    * from_act, to_act, gap_us) rows to the process-map report. ONE
    * definition so the batch and streaming edge derivations aggregate
    * identically. Two-level aggregation instead of a count-distinct:
    * the (case, edge) pre-aggregate's distribution requirement is
    * satisfied by q62's existing user_id partitioning (subset rule —
    * NO exchange, where countDistinct planned an Expand plus an extra
    * exchange on the expanded grain), and the per-case rows make
    * n_cases a plain count. The final grain is |activities+2|²; the
    * share window runs there, never on events. */
  private[graft] def aggregateEdges(edges: DataFrame): DataFrame =
    edgeReport(edges.groupBy("user_id", "session_num", "from_act", "to_act")
      .agg(count(lit(1)).as("n_in_case"), sum(col("gap_us")).as("g")))

  /** st42's entry: the stream's state function emits per-(session,
    * edge-type) COUNTS (n, gap_us_sum) rather than one row per event —
    * at most |acts|²+2 rows per session instead of one per event. On
    * THIS corpus sessions are short, so the measured collapse is
    * modest (sf1 ~7.9 s either way — st42's cost is the per-entity
    * state machinery, not emission volume); the shape matters at the
    * posture scale, where long sessions make per-event emission the
    * corpus-sized stream a sink cannot hold. Level 1 sums the
    * pre-counts (merging across micro-batches); the report tail is
    * [[edgeReport]] — ONE definition with the batch path, so stream ≡
    * batch stays structural.
    */
  private[graft] def aggregateEdgeCounts(pre: DataFrame): DataFrame =
    edgeReport(pre.groupBy("user_id", "session_num", "from_act", "to_act")
      .agg(sum(col("n")).as("n_in_case"), sum(col("gap_us_sum")).as("g")))

  private def edgeReport(level1: DataFrame): DataFrame =
    level1
      .groupBy("from_act", "to_act")
      .agg(sum(col("n_in_case")).as("n_obs"),
        count(lit(1)).as("n_cases"),
        sum(col("g")).as("gap_sum"))
      .withColumn("out_total",
        sum(col("n_obs")).over(Window.partitionBy("from_act")))
      .select(col("from_act"), col("to_act"), col("n_obs"), col("n_cases"),
        expr("n_obs * 10000 DIV out_total").as("share_out_pm"),
        expr("gap_sum DIV n_obs DIV 1000000").as("mean_gap_s"))
      .orderBy("from_act", "to_act")

  /** q75 funnel step sequence and window. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")
  val FunnelWindowUs: Long = 7L * 86400L * 1000000L

  /** Rule core over any (user_id, event_id, event_type, ts-micros `t`)
    * frame — property tests drive random layouts (including exact
    * timestamp ties) through the production fold. Returns one row per
    * user with the max funnel level reached. */
  private[graft] def q75LevelsCore(ev: DataFrame): DataFrame = {
    val T = FunnelWindowUs
    ev.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("t"), col("event_id"),
        col("event_type")))).as("evs"))
      .withColumn("st", expr(s"""
        aggregate(evs, array(CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)),
          (acc, e) -> CASE
            WHEN e.event_type = '${FunnelSteps(0)}'
              THEN array(greatest(acc[0], e.t), acc[1], acc[2])
            WHEN e.event_type = '${FunnelSteps(1)}' AND acc[0] >= 0 AND e.t - acc[0] <= ${T}L
              THEN array(acc[0], greatest(acc[1], acc[0]), acc[2])
            WHEN e.event_type = '${FunnelSteps(2)}' AND acc[1] >= 0 AND e.t - acc[1] <= ${T}L
              THEN array(acc[0], acc[1], greatest(acc[2], acc[1]))
            ELSE acc
          END)"""))
      .select(col("user_id"),
        when(col("st").getItem(2) >= 0L, 3L)
          .when(col("st").getItem(1) >= 0L, 2L)
          .when(col("st").getItem(0) >= 0L, 1L)
          .otherwise(0L).as("level"))
  }

  /** q75: WINDOW FUNNEL — the per-user ordered-sequence match every
    * product-analytics engine ships as a primitive (ClickHouse
    * `windowFunnel`, Snowplow/Amplitude funnels): the deepest prefix of
    * the step sequence view → click → purchase completed by EACH user
    * with all steps inside a [[FunnelWindowUs]] window anchored at the
    * chain's FIRST event, steps strictly ordered by (ts, event_id).
    * Distinct from q35, which counts stage events and inter-stage
    * timing globally — q75 answers "how many USERS completed step k as
    * a sequence", the funnel chart number.
    *
    * Semantics are existential (does ANY qualifying chain exist?), and
    * the per-user fold computes that exactly by greedy dominance: scan
    * events in (ts, event_id) order keeping, per level, the LATEST
    * possible chain-start time — a later start can extend wherever an
    * earlier one can (the window anchors at the start and the scan
    * order IS the chain order), so one value per level suffices. Chain
    * order is (ts, event_id) lexicographic, making ties well-defined
    * and the fold deterministic cross-engine; all arithmetic is exact
    * int64 micros.
    *
    * 100 TB posture: ONE user-keyed exchange; the fold is linear per
    * user over a bounded per-user event array (the ClickHouse
    * implementation shape) — an interpreted HOF on the |users| grain,
    * not the event grain (the t38 caveat does not bind: the array
    * collapse happens in the aggregation, the lambda runs once per
    * user). The report tail aggregates |users| rows to 3 funnel rows
    * map-side.
    */
  def q75WindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin(FunnelSteps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
    val levels = q75LevelsCore(ev)
    val agg = levels.agg(
      count(lit(1)).as("n0"),
      sum((col("level") >= 1L).cast("long")).as("n1"),
      sum((col("level") >= 2L).cast("long")).as("n2"),
      sum((col("level") >= 3L).cast("long")).as("n3"))
    // conv ratios NULLIF-guarded on both sides: on a corpus where a
    // funnel level is empty, Spark's DIV and DuckDB's // disagree on the
    // error/NULL behavior — the guard makes both deterministically NULL
    // (ADVICE r9).
    agg.select(explode(array(
        struct(lit(1L).as("level"), lit(FunnelSteps(0)).as("step"),
          col("n1").as("n_users"), expr("n1 * 10000 DIV nullif(n0, 0)").as("conv_pm")),
        struct(lit(2L).as("level"), lit(FunnelSteps(1)).as("step"),
          col("n2").as("n_users"), expr("n2 * 10000 DIV nullif(n1, 0)").as("conv_pm")),
        struct(lit(3L).as("level"), lit(FunnelSteps(2)).as("step"),
          col("n3").as("n_users"), expr("n3 * 10000 DIV nullif(n2, 0)").as("conv_pm"))))
        .as("r"))
      .select(col("r.level").as("level"), col("r.step").as("step"),
        col("r.n_users").as("n_users"), col("r.conv_pm").as("conv_pm"))
      .orderBy("level")
  }
}
