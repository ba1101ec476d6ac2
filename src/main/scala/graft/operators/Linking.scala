package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Checkpoints.Ops
import graft.Tables

/** q54: set-intersection merge disambiguation — the reference's most
  * complex linking rule (scratch/other/unified-appeal-streams.R:85-126).
  *
  * Per veteran, a child appeal's parent candidates are the same
  * veteran's appeals whose decision date equals the child's
  * prior-decision date; with ONE candidate the link is direct
  * (match_priordec), with SEVERAL the tie-break intersects *issue
  * category sets*: the child matches iff exactly one candidate's set
  * intersects its own (match_issues), zero → error_noissuecandidate,
  * two or more → error_multipleissuecandidates.
  *
  * Mapping: customer = veteran, order = appeal, candidate rule = same
  * customer one order-year earlier (the "prior decision" pointer),
  * issue categories = the distinct part brands on the order's lineitems.
  * q46 resolves *explicit* link chains; this resolves *ambiguous*
  * links by set evidence — the two compose into the reference's full
  * stream-unification pass.
  *
  * Scale posture: the candidate join is blocked per (customer,
  * adjacent-year) — block sizes are orders-per-customer-year, never
  * corpus-scale — and the verdict is one aggregation over the pair
  * relation keyed by child. Category sets ride as array columns
  * (collect_set at the order grain); the intersection test is
  * `array_intersect` emptiness per pair, evaluated inside the join
  * projection with no extra shuffle.
  */
object Linking {

  def q54MergeDisambiguation(spark: SparkSession, dir: String): DataFrame = {
    // collect_set dedups within the group, so the (l_orderkey, p_brand)
    // grain needs NO distinct first — the r9 shape paid a second
    // corpus-sized exchange (distinct on the pair, then re-shuffle on
    // l_orderkey alone) to pre-deduplicate what the set aggregate
    // already dedups, with partial collect_set combining map-side
    val cats = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .groupBy("l_orderkey").agg(collect_set(col("p_brand")).as("cats"))
    val apps = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate").cast("date")).as("yr"))
      .join(cats, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        col("yr"), coalesce(col("cats"), array()).as("cats"))
      // materialized ONCE before the self-join (r11): disambiguate's
      // child and parent sides both read `apps`, and exchange reuse
      // across the two join inputs is canonical-identity-fragile — an
      // un-reused plan recomputes the lineitem⋈part set-build and the
      // orders join TWICE (the corpus-sized half of q54's sf1 time).
      // ~|orders| rows with small brand-set arrays; reliable-checkpoint
      // semantics via the session conf as everywhere else.
      .graftCheckpoint()
    disambiguate(apps)
  }

  /** The rule core over an appeal relation `(key: long, cust: long,
    * yr: int, cats: array<string>)`. Exposed separately so property
    * tests can feed randomized entity/candidate/set layouts (empty
    * sets, all-ambiguous candidates, single-candidate shortcuts) and
    * compare against an in-memory reference.
    */
  def disambiguate(apps: DataFrame): DataFrame = {
    val c = apps.as("c")
    val p = apps.select(col("key").as("p_key"), col("cust").as("p_cust"),
      col("yr").as("p_yr"), col("cats").as("p_cats")).as("p")
    c.join(p,
        col("c.cust") === col("p.p_cust") && col("p.p_yr") === col("c.yr") - 1,
        "left")
      .withColumn("overlap",
        size(array_intersect(col("c.cats"), col("p.p_cats"))) > 0)
      .groupBy(col("c.key").as("child_key"))
      .agg(
        count(col("p.p_key")).as("n_cand"),
        min(col("p.p_key")).as("cand_single"),
        sum(when(col("overlap"), 1L).otherwise(0L)).as("n_overlap"),
        min(when(col("overlap"), col("p.p_key"))).as("overlap_single"))
      .select(col("child_key"),
        when(col("n_cand") === 0, lit("error_missingpriordec"))
          .when(col("n_cand") === 1, lit("match_priordec"))
          .when(col("n_overlap") === 1, lit("match_issues"))
          .when(col("n_overlap") > 1, lit("error_multipleissuecandidates"))
          .otherwise(lit("error_noissuecandidate")).as("status"),
        when(col("n_cand") === 1, col("cand_single"))
          .when(col("n_overlap") === 1, col("overlap_single")).as("parent"))
      .orderBy("child_key")
  }
}
