package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q56: docket-position wait-time prediction — the reference's published
  * wait-time product (scratch/other/docket-model.R:574-670, the largest
  * single analysis in the reference). For each monthly docket cohort of
  * pending cases: how many cases are ahead of it on the docket (with
  * status-dependent exclusions), and — given measured resolution rates
  * and a Weibull activation adjustment for cases still in advance
  * status — the predicted decision date.
  *
  * The reference iterates a scalar `repeat { t1 <- f(t) }` fixpoint per
  * cohort on the driver (docket-model.R:639-662), converging in a few
  * steps. The Spark-first shape eliminates the driver loop entirely:
  *
  *  - case classification is a single projection over the fact join
  *    (orders ⋈ per-case lineitem aggregate);
  *  - per-cohort "ahead on docket" counts are EXCLUSIVE cumulative
  *    window sums on the docket-month grain (`rowsBetween(unbounded,
  *    -1)` ≡ `BFD19 < form9_date`, docket-model.R:608) — ~tens of rows,
  *    the q11 aggregate-then-window posture, never a raw-fact window;
  *  - the advance-status age profile each cohort needs rides along as a
  *    `collect_list` histogram over the SAME window frame (one
  *    WindowExec for all five cumulative columns);
  *  - measured resolution rates are a 1-row aggregate broadcast to the
  *    cohort grain (the p57 rate-table pattern);
  *  - the fixpoint unrolls as [[FixpointSteps]] column-expression
  *    iterations, each step's Weibull expectation a codegen'd
  *    `aggregate()` fold over the histogram array (docket-model.R's
  *    per-case `pweibull` sum at 640-647, collapsed to the month
  *    grain). The reference's |Δt|<1 loop converges in ~3 steps on its
  *    data; three unrolled steps reproduce it as pure expressions.
  *
  * 100 TB posture: the only fact-grain work is the orderkey join and
  * one month-grain aggregation (map-side combined); everything after
  * lives on ~100 rows/century of docket months. The histogram bounds
  * the per-row state by the month count, not the case count.
  *
  * Constants mirror the reference's by_month model parameters
  * (docket-model.R:585-595): the Weibull activation shape/scale (fit
  * offline there via flexsurv — iterative MLE, correctly out of query
  * scope), the 19% advance-withdrawal and 4% original-attrition rates
  * (docket-model.R:658), and the docket margin.
  */
object Docket {

  /** Prediction as-of date (the reference's `.month`). */
  val PredDate = "2001-06-01"
  /** Days a decided case stays on the docket before outcoding clears it
    * (the BFCURLOC='99'/BFDLOOUT rule at docket-model.R:608, collapsed
    * to a fixed post-decision lag); also the mean remand dwell time. */
  val OutcodeLagDays = 90
  /** Weibull activation-time scale in days (shape fixed at 1.5, written
    * as u·√u so both engines evaluate it with correctly-rounded */
  val WeibullScaleDays = 400.0
  /** Cases held back from the computable docket (docket-model.R:628). */
  val DocketMargin = 100.0
  /** Share of activated advance cases that withdraw (docket-model.R:658). */
  val AdvWithdrawnRate = 0.19
  /** Baseline original-stream attrition (docket-model.R:658). */
  val OrigAttritionRate = 0.04
  /** Unrolled fixpoint iterations (the reference's repeat-until-|Δt|<1
    * converges in about this many). */
  val FixpointSteps = 3

  /** Weibull CDF F(y) = 1 − exp(−(y/λ)^1.5) with F(y≤0) = 0. The 1.5
    * exponent is u·√u — `*` and `sqrt` are correctly rounded IEEE-754 in
    * both engines, so the oracle computes bit-identical inputs to exp. */
  private def weib(y: Column): Column = {
    val u = greatest(y, lit(0.0)) / lit(WeibullScaleDays)
    lit(1.0) - exp(-(u * sqrt(u)))
  }

  /** One fixpoint refinement step (docket-model.R:639-658): expected
    * activations from the advance pool by t (Weibull fold over the age
    * histogram), remand-pool interpolation, then the docket-clearance
    * balance equation. */
  private def step(t: Column, hist: Column, ahead: Column, adv: Column,
      orig: Column, rem: Column, remSteady: Column, rate: Column): Column = {
    val expAdvAct = aggregate(hist, lit(0.0), (acc, x) => {
      val age = x.getField("age")
      val w0 = weib(age)
      acc + x.getField("n") * ((weib(age + t) - w0) / (lit(1.0) - w0))
    })
    val expAdv = adv - expAdvAct
    val interp = least(greatest(t / lit(OutcodeLagDays.toDouble), lit(0.0)), lit(1.0))
    val expRem = remSteady * interp + rem * (lit(1.0) - interp)
    greatest(lit(0.0),
      (ahead - expAdv - (adv - expAdv) * lit(AdvWithdrawnRate)
        - orig * lit(OrigAttritionRate) - expRem - lit(DocketMargin)) / rate)
  }

  def q56DocketWait(spark: SparkSession, dir: String): DataFrame = {
    val pred = lit(PredDate).cast("date")
    val outcodeCutoff = date_sub(pred, OutcodeLagDays)

    // ONE-EXCHANGE case assembly (r11): [[Tables.orderAssembly]] — the
    // shared union-aggregate that replaced this family's lineitem
    // aggregate + SHUFFLE_HASH join (which itself replaced the SMJ
    // default, the q50 measurement).
    val cases = Tables.orderAssembly(spark, dir)
      .select(
        date_trunc("month", col("odate")).cast("date").as("docket_month"),
        col("is_expedited").as("orig"),
        when(col("is_final"), col("last_ship")).as("decision_date"),
        col("first_ship").as("activation_date"))
      .withColumn("pending",
        col("decision_date").isNull || col("decision_date") >= pred)
      // still on the docket as of pred: never decided, or decided but not
      // yet outcoded (the BFCURLOC != '99' | BFDLOOUT >= month rule)
      .withColumn("ahead_eligible",
        col("decision_date").isNull || col("decision_date") >= outcodeCutoff)
      .withColumn("rempool",
        col("decision_date").isNotNull && col("decision_date") < pred &&
          col("decision_date") >= outcodeCutoff)
      .withColumn("adv",
        col("orig") && col("pending") &&
          (col("activation_date").isNull || col("activation_date") >= pred))

    def cnt(c: Column): Column = sum(c.cast("long"))
    val byMonth = cases
      .groupBy("docket_month")
      .agg(
        cnt(col("ahead_eligible")).as("n_ahead"),
        cnt(col("ahead_eligible") && col("orig") && col("pending")).as("n_orig"),
        cnt(col("adv")).as("n_adv"),
        cnt(col("rempool")).as("n_rem"),
        // decisions by DECISION month ride the same aggregate via a
        // month-equality indicator sum in the rates branch below; here
        // the docket grain only needs the trailing-rate numerator once
        cnt(col("decision_date") >= date_sub(pred, 365) && col("decision_date") < pred)
          .as("n_dec_trailing"))

    // measured resolution rate: decisions/day over the trailing year
    // (the reference's final_decision_rate + other_resolution_rate from
    // by_month) — a 1-row relation broadcast to the cohort grain
    val rates = byMonth.agg(
      (sum(col("n_dec_trailing")).cast("double") / lit(365.0)).as("rate_total"))

    // exclusive cumulative frame ≡ "docket date strictly before this
    // cohort's month"; all five columns share ONE window spec
    val w = Window.orderBy("docket_month").rowsBetween(Window.unboundedPreceding, -1)
    // one select, not chained withColumns: collect_list is Catalyst-
    // non-deterministic (order-sensitive), so CollapseWindow refuses to
    // merge it with the sums post-hoc; a single projection extracts all
    // five into ONE Window node at analysis (PlanSpec-pinned)
    val cohorts = byMonth
      .filter(col("docket_month") <= pred)
      .select(col("docket_month"),
        coalesce(sum(col("n_ahead")).over(w), lit(0L)).as("ahead_cnt"),
        coalesce(sum(col("n_orig")).over(w), lit(0L)).as("orig_cnt"),
        coalesce(sum(col("n_adv")).over(w), lit(0L)).as("adv_cnt"),
        coalesce(sum(col("n_rem")).over(w), lit(0L)).as("rem_cnt"),
        collect_list(
          struct(datediff(pred, col("docket_month")).cast("double").as("age"),
            col("n_adv").cast("double").as("n"))).over(w).as("hist"))
      .crossJoin(broadcast(rates))

    val ahead = col("ahead_cnt").cast("double")
    val adv = col("adv_cnt").cast("double")
    val orig = col("orig_cnt").cast("double")
    val rem = col("rem_cnt").cast("double")
    val remSteady = col("rate_total") * lit(OutcodeLagDays.toDouble)
    val withT = cohorts
      .withColumn("initial_t",
        (ahead - adv - remSteady - lit(DocketMargin)) / col("rate_total"))
      .withColumn("t0", greatest(lit(0.0), col("initial_t")))
    // the unrolled fixpoint: t_{i+1} = step(t_i) as named intermediate
    // columns (Catalyst CSE keeps the shared subtrees from exploding)
    val iterated = (1 to FixpointSteps).foldLeft(withT) { (df, i) =>
      df.withColumn(s"t$i",
        step(col(s"t${i - 1}"), col("hist"), ahead, adv, orig, rem,
          remSteady, col("rate_total")))
    }
    iterated.select(
      // dates leave as timestamp — the cross-engine parquet/pandas date
      // dtype mismatch convention (q36/q50)
      col("docket_month").cast("timestamp").as("docket_month"),
      col("ahead_cnt"), col("orig_cnt"), col("adv_cnt"), col("rem_cnt"),
      round(col("initial_t"), 4).as("initial_t"),
      round(col(s"t$FixpointSteps"), 4).as("final_t"),
      date_add(pred, round(col(s"t$FixpointSteps")).cast("int"))
        .cast("timestamp").as("predicted_date"))
      .orderBy("docket_month")
  }

  /** q64 forecast horizon (months) and the assumed steady-state attrition
    * rate — capacity.R's hardcoded 3700/82500 per year ≈ 448 permyriad. */
  val ForecastMonths = 24
  val ClosePmPerYear = 448L

  /** q64: future-backlog FORECAST — the reference's hearing-backlog
    * projection (scratch/hearings/capacity.R's `future_backlog_by_month`
    * block: monthly new requests ramped by an activation curve, linear
    * resolutions, attrition proportional to the standing backlog, and a
    * clamped recurrence `backlog_i = max(0, prev + new − res − closes)`
    * iterated in an R for-loop). This is the one reference analysis
    * whose core is a SEQUENTIAL recurrence — closes depends on the
    * previous month's backlog, so no window/prefix-sum expresses it.
    *
    * Spark-first shape: the corpus-sized work is ONE map-side aggregate
    * measuring the rates (standing backlog, trailing-year arrivals and
    * resolutions — q50's completion join); the recurrence then runs
    * entirely IN-EXPRESSION as an `aggregate` HOF fold over the
    * constant [[ForecastMonths]]-element month sequence on that single
    * row — no driver loop, no per-month job. The activation ramp is the
    * deterministic integer stand-in min(1, i/12) in permyriad (the
    * reference interpolates a survfit curve; q12/q53 own that estimator
    * — composing it here would re-derive their output, and the
    * projection's shape is independent of the ramp's provenance). All
    * arithmetic is exact BIGINT — each DIV is written in ONE canonical
    * form mirrored verbatim in the oracle (integer division is not
    * associative, so `x*448 DIV 120000` and `(x*448 DIV 10000) DIV 12`
    * differ; both engines use the former). Oracle = WITH RECURSIVE
    * (the declarative equivalent of the loop, the q46 convention).
    *
    * 100 TB posture: rate measurement partial-aggregates to one row;
    * the fold is O(horizon) on the driver-side row — a projection, not
    * a shuffle; output is |horizon| rows.
    */
  def q64BacklogForecast(spark: SparkSession, dir: String): DataFrame = {
    // ONE-EXCHANGE rate measurement (r11): [[Tables.orderAssembly]] —
    // the shared union-aggregate that replaced this family's lineitem
    // aggregate + SHUFFLE_HASH join.
    val rates = Tables.orderAssembly(spark, dir)
      .agg(
        sum(when(not(col("is_final")), 1L).otherwise(0L)).as("backlog0"),
        sum(when(col("odate") >= lit("1997-08-01").cast("date") &&
          col("odate") < lit("1998-08-01").cast("date"), 1L)
          .otherwise(0L)).as("arr_yr"),
        sum(when(col("is_final") &&
          col("last_ship") >= lit("1997-08-01").cast("date") &&
          col("last_ship") < lit("1998-08-01").cast("date"), 1L)
          .otherwise(0L)).as("res_yr"))
    val stepExpr =
      s"""acc.prev + (arr_yr DIV 12) * least(i * 10000 DIV 12, 10000) DIV 10000
         | - res_yr DIV 12 - acc.prev * $ClosePmPerYear DIV 120000""".stripMargin
    val fold =
      s"""aggregate(sequence(1, $ForecastMonths),
         |  named_struct('prev', backlog0, 'out', cast(array() as array<bigint>)),
         |  (acc, i) -> named_struct(
         |    'prev', greatest(0L, $stepExpr),
         |    'out', concat(acc.out, array(greatest(0L, $stepExpr)))),
         |  acc -> acc.out)""".stripMargin
    rates
      .select(col("arr_yr"), col("res_yr"),
        posexplode(expr(fold)).as(Seq("idx", "backlog")))
      .select((col("idx") + 1).cast("long").as("month_idx"),
        expr("(arr_yr DIV 12) * least((idx + 1) * 10000 DIV 12, 10000) DIV 10000")
          .as("new_requests"),
        expr("res_yr DIV 12").as("resolutions"),
        col("backlog"))
      .orderBy("month_idx")
  }
}
