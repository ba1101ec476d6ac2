package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q53: competing-risks / multi-state survival — the Aalen–Johansen
  * cumulative-incidence estimator with delayed entry (left truncation).
  *
  * Mirrors the reference's docket model (scratch/other/docket-model.R:
  * 44-48): `survfit(Surv(age.enter, age.exit, clsevent) ~ 1)` over a
  * 4-level state factor (censor + three competing end states), where
  * `age.enter` is the subject's age at study start (appeals already open
  * enter the risk set late) and `age.exit` its age at event or censoring.
  * q12 is the single-event Kaplan–Meier special case; here the event
  * partitions into competing states and the estimand is CIF_k(t) =
  * Σ_{s≤t} S(s⁻)·d_k(s)/n(s), with S the all-cause survival.
  *
  * Data mapping (orders as subjects, age in days since o_orderdate):
  * study window [1995-01-01, 2002-06-01]; completion = max lineitem
  * shipdate for 'F' orders; end state 'expedited' for urgent/high
  * priority completions, 'normal' otherwise; open orders censor at the
  * window end; completions before study entry are dropped (exit ≤ enter —
  * the reference's `filter(age.exit > age.enter)`).
  *
  * Scale posture: identical to q12 — one aggregation to the distinct-age
  * grain (bounded domain: days), then unpartitioned windows over that
  * pre-aggregated grain only. Delayed entry adds an entry-count column on
  * the same grid, not a second pass over subjects: n(t) = #{enter < t} −
  * #{exit < t} via two strict-preceding running sums.
  */
object Survival {

  private val StudyStart = "1995-01-01"
  private val StudyEnd   = "2002-06-01"

  def q53CompetingRisks(spark: SparkSession, dir: String): DataFrame = {
    // ONE-EXCHANGE subject assembly (VERDICT r9/r10 carried item):
    // [[Tables.orderAssembly]], the shared union-aggregate that
    // replaced this family's lineitem-aggregate + SHUFFLE_HASH join
    // (two corpus exchanges and a subject-grain hash table → one
    // orderkey exchange, no join).
    val obs = Tables.orderAssembly(spark, dir)
      .select(
        col("odate").as("birth"),
        when(col("is_final"), col("last_ship")).as("evdate"),
        when(not(col("is_final")), lit("censor"))
          .when(col("is_expedited"), lit("expedited"))
          .otherwise(lit("normal")).as("state"))
      .select(
        greatest(lit(0L),
          datediff(lit(StudyStart).cast("date"), col("birth")).cast("long")).as("enter"),
        coalesce(datediff(col("evdate"), col("birth")).cast("long"),
          datediff(lit(StudyEnd).cast("date"), col("birth")).cast("long")).as("exit"),
        col("state"))
      .filter(col("exit") > col("enter"))
    aalenJohansen(obs)
  }

  /** The estimator core over an observation relation `(enter: long,
    * exit: long, state: string)` where state ∈ {expedited, normal,
    * censor} and each subject is at risk on (enter, exit]. Exposed
    * separately so property tests can feed randomized observation sets
    * and assert the structural identities (S + ΣCIF = 1, monotonicity,
    * risk-set counts) independent of the table mapping above.
    */
  def aalenJohansen(obs: DataFrame): DataFrame = {
    // one grid row per distinct age: entry counts + per-state exit counts.
    // Each observation explodes to an entry marker and an exit marker
    // BEFORE the shuffle, so ONE aggregation builds the whole grid —
    // separate enter/exit groupBys would shuffle on different keys and
    // evaluate the (possibly expensive) obs subplan twice (no exchange
    // reuse across differently-keyed aggregations; measured 2× the obs
    // cost on q53's join, r4)
    val grid = obs
      .select(explode(array(
        struct(col("enter").as("t"), lit(null).cast("string").as("state")),
        struct(col("exit").as("t"), col("state").as("state")))).as("e"))
      .select(col("e.t").as("t"), col("e.state").as("state"))
      .groupBy("t").agg(
        sum(when(col("state").isNull, 1L).otherwise(0L)).as("n_ent"),
        sum(when(col("state") === "expedited", 1L).otherwise(0L)).as("d_expedited"),
        sum(when(col("state") === "normal", 1L).otherwise(0L)).as("d_normal"),
        sum(when(col("state") === "censor", 1L).otherwise(0L)).as("n_censored"),
        sum(when(col("state").isNotNull, 1L).otherwise(0L)).as("n_exit"))
    // the grid is the distinct-age grain (≤ a few thousand rows at any
    // corpus size) — unpartitioned windows are safe here, as in q12
    val wOrd = Window.orderBy("t")
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      // at-risk at age t: entered strictly before t, not yet exited
      .withColumn("n_risk",
        (coalesce(sum(col("n_ent")).over(wPrev), lit(0L)) -
         coalesce(sum(col("n_exit")).over(wPrev), lit(0L))))
      .withColumn("d_tot", col("d_expedited") + col("d_normal"))
      // all-cause survival: cumulative product of (1 - d/n) over event rows
      .withColumn("factor",
        when(col("d_tot") > 0,
          greatest((col("n_risk") - col("d_tot")).cast("double") /
            col("n_risk").cast("double"), lit(1e-300)))
          .otherwise(lit(1.0)))
      .withColumn("surv", exp(sum(log(col("factor"))).over(wCum)))
      .withColumn("surv_prev", coalesce(lag(col("surv"), 1).over(wOrd), lit(1.0)))
      // CIF_k(t) = Σ_{s≤t} S(s⁻) · d_k(s)/n(s)
      .withColumn("cif_expedited", sum(
        when(col("d_tot") > 0, col("surv_prev") * col("d_expedited").cast("double") /
          col("n_risk").cast("double")).otherwise(lit(0.0))).over(wCum))
      .withColumn("cif_normal", sum(
        when(col("d_tot") > 0, col("surv_prev") * col("d_normal").cast("double") /
          col("n_risk").cast("double")).otherwise(lit(0.0))).over(wCum))
      // report at exit times only (survfit's event/censor grid)
      .filter(col("n_exit") > 0)
      .select(col("t").as("t_days"), col("n_risk"),
        col("d_expedited"), col("d_normal"), col("n_censored"),
        round(col("surv"), 6).as("surv"),
        round(col("cif_expedited"), 6).as("cif_expedited"),
        round(col("cif_normal"), 6).as("cif_normal"))
      .orderBy("t_days")
  }
}
