package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17 scratch probe: decompose where q10/q70 spend their sf10 seconds
  * (VERDICT r17 item 3). Each arm is timed min-of-2 after a warmup of
  * the input scans, full evaluation via the noop sink.
  *
  * Usage: tools/run.sh graft.ProbeR17 /root/repo/benchdata/sf10
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(50)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.min}%.2f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val cutoff = to_timestamp(lit("2002-01-01 00:00:00"))
    val days = datediff(cutoff.cast("date"), col("o_orderdate").cast("date"))
    def openOrders = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")

    // warm the page cache so arm deltas are compute, not IO
    Tables.orders(spark, dir).write.format("noop").mode("overwrite").save()
    Tables.lineitem(spark, dir).select("l_orderkey").write.format("noop").mode("overwrite").save()
    Tables.customer(spark, dir).write.format("noop").mode("overwrite").save()

    time("q10.a scan+filter")(openOrders.select(col("o_custkey"), days.as("dd")))
    time("q10.b +bcast cust join")(openOrders
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey")))
    time("q10.b2 +SHUFFLE cust join")(openOrders
      .hint("shuffle_hash")
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey")))
    time("q10.c +nation+grid agg")(openOrders
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), days.cast("long").as("d"))
      .agg(count(lit(1)).as("cnt")))
    time("q10.full")(graft.operators.CoreQueries.q10Quantiles(spark, dir))

    val o = Tables.orders(spark, dir)
    val liDf = Tables.lineitem(spark, dir)
    time("q70.a orders audit agg")(o.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_cust"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("n_bad_status"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("n_bad_price")))
    time("q70.a2 audit agg, no distinct")(o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_cust"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("n_bad_status"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("n_bad_price")))
    time("q70.b orphan anti (default)")(liDf
      .join(o.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan")))
    time("q70.b2 orphan anti (SHJ)")(liDf
      .join(o.select("o_orderkey").hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan")))
    time("q70.b3 orphan anti (key-agg+SHJ)")(liDf
      .select("l_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      .join(o.select("o_orderkey").hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(sum("c").as("n_orphan")))
    time("q70.full")(graft.operators.CoreQueries.q70ConstraintAudit(spark, dir))

    def q11closed(j: DataFrame): DataFrame = j
      .groupBy("o_orderkey").agg(max(col("l_shipdate")).as("completed"))
      .groupBy(date_trunc("month", col("completed")).as("month"))
      .agg(count(lit(1)).as("n_closed"))
    time("q11.closed default")(q11closed(
      Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey"))))
    time("q11.closed SHJ orders build")(q11closed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
        .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
            .select("o_orderkey").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))))
    time("q11.closed li-preagg SHJ")(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("completed"))
        .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
            .select("o_orderkey").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("completed")).as("month"))
        .agg(count(lit(1)).as("n_closed")))

    val delay = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
    def q20body(joined: DataFrame): DataFrame = joined
      .withColumn("delay_days", delay)
      .withColumn("bucket", floor(col("delay_days") / 30.0).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_items"), round(avg(col("delay_days")), 4).as("avg_delay"))
    time("q20.default join")(q20body(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))))
    def q44body(j: DataFrame): DataFrame = j
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_no_items"),
        round(sum(col("o_totalprice")), 2).as("stranded_value"))
    time("q44.default")(q44body(Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_anti")))
    time("q44.SHJ raw build")(q44body(Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select("l_orderkey").hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey"), "left_anti")))
    time("q44.SHJ distinct build")(q44body(Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select("l_orderkey")
          .groupBy("l_orderkey").agg(count(lit(1))).select("l_orderkey")
          .hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey"), "left_anti")))
    time("q20.SHJ orders build")(q20body(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
            .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))))
    if (sys.env.contains("PROBE_PLAN")) {
      val df = graft.operators.CoreQueries.q70ConstraintAudit(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      println("[probe] q70 executed plan:\n" + p.toString)
    }
    spark.stop()
  }
}
