package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def q50SnapshotAges(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2002-06-01").cast("date")
    val comp = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("completed"))
    val iv = Tables.orders(spark, dir)
      .join(comp, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("startd"),
        coalesce(when(col("o_orderstatus") === "F", col("completed").cast("date")),
          cutoff).as("endd"))
    val cells = iv.withColumn("cell", explode(expr(
      """sequence(cast(date_trunc('quarter', startd) as date),
        |         cast(date_trunc('quarter', greatest(endd, startd)) as date),
        |         interval 3 month)""".stripMargin)))
    val snaps = spark.range(1)
      .select(explode(expr(
        "sequence(date '1995-04-01', date '2002-04-01', interval 3 month)")).as("s"))
    snaps.join(cells, col("cell") === col("s") &&
        col("startd") <= col("s") && col("endd") > col("s"))
      .withColumn("age_days",
        datediff(col("s"), col("startd")).cast("double"))
      .groupBy(col("s"))
      // percentile is Spark's counting TypedImperativeAggregate: the
      // map-side partial collapses each partition to a value→count map,
      // so the |snapshots|-group shuffle carries merged maps over the
      // bounded age domain, never raw rows — already the scale shape.
      // (An explicit (s, age) count + window interpolation read-off was
      // measured ~45% SLOWER at sf0.1/sf1 (r4): two extra exchanges +
      // window stages for work the partial agg already does map-side.)
      .agg(count(lit(1)).as("n_open"),
        round(expr("percentile(age_days, 0.5)"), 4).as("p50_age_days"),
        round(expr("percentile(age_days, 0.9)"), 4).as("p90_age_days"))
      .select(col("s").cast("timestamp").as("snapshot"),
        col("n_open"), col("p50_age_days"), col("p90_age_days"))
      .orderBy("snapshot")
  }
}
