package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q50: point-in-interval range join via grid bucketization.
  *
  * "Median age of the open caseload at each quarter end" — the
  * reference's recurring pending-age snapshots (scratch/other/
  * pending-nods.R quantiles × event-history.R's historical curves).
  * Unlike q11's backlog COUNT (which decomposes into ±1 deltas and a
  * cumulative sum), a quantile at time s needs the SET of open cases at
  * s — a genuine interval⋈point join.
  *
  * The naive theta join (`startd <= s AND endd > s`) is a cartesian
  * product at scale. The scalable shape bucketizes: each case interval
  * explodes to the quarter cells it spans (bounded fan-out: interval
  * length / cell width), snapshots land in exactly one cell, and the
  * join becomes a cell EQUI-join with the exact range predicate as a
  * post-filter. Cost: |cases|·avg-quarters-spanned + |snapshots|, never
  * |cases|·|snapshots|.
  */
object RangeJoin {

  /** Quantile read-off granularity: ages are binned to 30-day cells
    * before the per-snapshot aggregation (q51's mergeable-histogram
    * posture applied in-plan). */
  val AgeBinDays = 30

  def q50SnapshotAges(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2002-06-01").cast("date")
    // ONE-EXCHANGE interval assembly (r11): [[Tables.orderAssembly]] —
    // the shared union-aggregate that replaced this family's lineitem
    // aggregate + SHUFFLE_HASH join (which itself replaced the SMJ
    // default's two fact-grain sorts, measured ~0.7 s at sf1).
    val iv = Tables.orderAssembly(spark, dir)
      .select(col("odate").as("startd"),
        coalesce(when(col("is_final"), col("last_ship")), cutoff)
          .as("endd"))
    // collapse intervals to DISTINCT (startd, endd) pairs with a weight
    // before the cell explode: every open case shares endd = cutoff, so
    // the pair domain is ~|date range| + completed-pair spread, an
    // order of magnitude below the case count — the explode fan-out and
    // join probe shrink by the same factor and the weight rides along
    // (measured 2.7 s → 1.2 s at sf1). The pair domain grows with the
    // DATE RANGE, not the corpus, so the reduction improves at scale.
    val pairs = iv.groupBy("startd", "endd").agg(count(lit(1)).as("w"))
    val cells = pairs.withColumn("cell", explode(expr(
      """sequence(cast(date_trunc('quarter', startd) as date),
        |         cast(date_trunc('quarter', greatest(endd, startd)) as date),
        |         interval 3 month)""".stripMargin)))
    val snaps = spark.range(1)
      .select(explode(expr(
        "sequence(date '1995-04-01', date '2002-04-01', interval 3 month)")).as("s"))
    // 30-day age bins instead of the exact percentile (r6 adjudication:
    // the exact `percentile` TypedImperativeAggregate was the scale-
    // wrong half — a non-codegen ObjectHashAggregate buffering a
    // value→count map per snapshot, 3.2× DuckDB at sf1. Binning keeps
    // the raw fan-out rows inside whole-stage codegen: a (s, bin) long-
    // key HashAggregate partials map-side, the shuffle carries ≤
    // |snapshots|·|bins| count rows, and the quantile read-off is a
    // window over that tiny grain. An r4 measurement of a read-off at
    // the EXACT-age grain was 45% slower than `percentile`; the 30-day
    // grain is ~30× smaller and codegen'd, which flips the verdict.)
    val perBin = snaps.join(cells, col("cell") === col("s") &&
        col("startd") <= col("s") && col("endd") > col("s"))
      .withColumn("age_bin", (datediff(col("s"), col("startd")) / AgeBinDays).cast("int"))
      .groupBy(col("s"), col("age_bin"))
      .agg(sum(col("w")).as("cnt"))
    val wAll = Window.partitionBy("s")
    val wCum = wAll.orderBy("age_bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("n_open", sum(col("cnt")).over(wAll))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .groupBy(col("s"))
      // quantile read-off: the lower edge of the first bin whose
      // cumulative count reaches the target mass (exact-integer doubles
      // on both engines — no FP rounding surface at all)
      .agg(max(col("n_open")).as("n_open"),
        (min(when(col("cum") >= lit(0.5) * col("n_open"), col("age_bin")))
          .cast("double") * AgeBinDays).as("p50_age_days"),
        (min(when(col("cum") >= lit(0.9) * col("n_open"), col("age_bin")))
          .cast("double") * AgeBinDays).as("p90_age_days"))
      .select(col("s").cast("timestamp").as("snapshot"),
        col("n_open"), col("p50_age_days"), col("p90_age_days"))
      .orderBy("snapshot")
  }

  /** q63: interval-overlap utilization — the reference's FTE curve
    * (scratch/decisions/fte.R:44-56: per month, Σ intersection length of
    * every attorney's tenure interval with the month, divided by month
    * length; a probation variant over [start, start+180); then
    * decisions-per-FTE productivity at fte.R:75-83). q50 answers
    * point-in-interval membership; this is interval∩interval LENGTH —
    * the occupancy/FTE/capacity shape (server utilization, hotel
    * occupancy) and a genuinely distinct temporal join.
    *
    * The reference loops months × intervals in R (line 55's sapply —
    * quadratic). The Spark-first shape is q50's grid device at month
    * granularity: collapse intervals to weighted DISTINCT (start, comp)
    * pairs (the pair domain grows with the DATE RANGE, not the corpus),
    * explode each pair to the months it touches (bounded by the date
    * span), clip overlaps with greatest/least — pure codegen'd date
    * arithmetic — and aggregate to the |months| grain map-side.
    * Decisions-per-FTE then joins two tiny month-grain relations.
    * Integer permyriad outputs; denominators guard the empty months the
    * reference's chart simply clips.
    *
    * Interval semantics follow q50: tenure = [startd, endd) with open
    * cases cut off at the corpus horizon; probation = [startd,
    * startd+180) independent of tenure end (fte.R:41's rule, which
    * deliberately overruns short tenures); decisions = completed cases
    * by completion month (fte.R:66's BFDDEC grouping).
    */
  def q63FteUtilization(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2002-06-01").cast("date")
    // ONE-EXCHANGE interval assembly (r11): [[Tables.orderAssembly]] —
    // the shared union-aggregate that replaced this family's lineitem
    // aggregate + SHUFFLE_HASH join.
    val iv = Tables.orderAssembly(spark, dir)
      .select(col("odate").as("startd"),
        when(col("is_final"), col("last_ship")).as("compd"))
    val pairs = iv.groupBy("startd", "compd").agg(count(lit(1)).as("w"))
      .withColumn("endd", coalesce(col("compd"), cutoff))
      .withColumn("probd", expr("date_add(startd, 180)"))
    val cells = pairs.withColumn("m", explode(expr(
      """sequence(cast(date_trunc('month', startd) as date),
        |         cast(date_trunc('month', greatest(endd, probd)) as date),
        |         interval 1 month)""".stripMargin)))
      .withColumn("m_next", expr("add_months(m, 1)"))
      .withColumn("ov_fte", greatest(lit(0), datediff(
        least(col("endd"), col("m_next")), greatest(col("startd"), col("m")))))
      .withColumn("ov_prob", greatest(lit(0), datediff(
        least(col("probd"), col("m_next")), greatest(col("startd"), col("m")))))
    val fte = cells.groupBy("m")
      .agg(sum(col("ov_fte").cast("long") * col("w")).as("fte_days"),
        sum(col("ov_prob").cast("long") * col("w")).as("prob_days"))
    val dec = pairs.filter(col("compd").isNotNull)
      .groupBy(expr("cast(date_trunc('month', compd) as date)").as("m"))
      .agg(sum(col("w")).as("n_decisions"))
    val months = spark.range(1).select(explode(expr(
      "sequence(date '1995-01-01', date '2002-05-01', interval 1 month)")).as("m"))
    months.join(fte, Seq("m"), "left").join(dec, Seq("m"), "left")
      .withColumn("days", datediff(expr("add_months(m, 1)"), col("m")).cast("long"))
      .withColumn("fte_days", coalesce(col("fte_days"), lit(0L)))
      .withColumn("prob_days", coalesce(col("prob_days"), lit(0L)))
      .withColumn("n_decisions", coalesce(col("n_decisions"), lit(0L)))
      .select(col("m").cast("timestamp").as("month"),
        expr("fte_days * 10000 DIV days").as("fte_x10000"),
        expr("prob_days * 10000 DIV days").as("prob_x10000"),
        col("n_decisions"),
        expr("CASE WHEN fte_days > 0 THEN n_decisions * days * 10000 DIV fte_days ELSE 0L END")
          .as("dpf_x10000"),
        expr("""CASE WHEN fte_days - prob_days > 0
                THEN n_decisions * days * 10000 DIV (fte_days - prob_days)
                ELSE 0L END""").as("adj_dpf_x10000"))
      .orderBy("month")
  }
}
