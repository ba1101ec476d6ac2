package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (round 16): where do q63/q56's sf1 seconds go —
  * the shared orderAssembly union-agg, the month-cell explode (q63),
  * or the cohort window stack (q56)? Informs the VERDICT r15 #6 plan
  * pass; measurement notes land at the operator call sites.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/benchdata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => DataFrame): Unit = {
      noop(f) // warm
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] min=${samples.min}%.3f s samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }

    time("orderAssembly")(Tables.orderAssembly(spark, dir))
    time("q63_pairs") {
      val cutoff = lit("2002-06-01").cast("date")
      Tables.orderAssembly(spark, dir)
        .select(col("odate").as("startd"),
          when(col("is_final"), col("last_ship")).as("compd"))
        .groupBy("startd", "compd").agg(count(lit(1)).as("w"))
        .withColumn("endd", coalesce(col("compd"), cutoff))
    }
    time("q63_full")(operators.RangeJoin.q63FteUtilization(spark, dir))
    time("q56_bymonth") {
      Tables.orderAssembly(spark, dir)
        .groupBy(date_trunc("month", col("odate")).cast("date").as("docket_month"))
        .agg(count(lit(1)).as("n"))
    }
    time("q56_full")(operators.Docket.q56DocketWait(spark, dir))

    // grain sizes, to sanity-check the explode volume story
    val pairs = Tables.orderAssembly(spark, dir)
      .select(col("odate").as("startd"),
        when(col("is_final"), col("last_ship")).as("compd"))
      .groupBy("startd", "compd").agg(count(lit(1)).as("w"))
    println(s"orders grain=${Tables.orderAssembly(spark, dir).count()} " +
      s"pairs grain=${pairs.count()}")
    spark.stop()
  }
}
