package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 15): does the BPE min-count floor change the
  * learned merge table on the test corpora, and how big do d22's band
  * buckets get there?
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("FLOORS_PROBE")) {
      val dir = "/root/testdata/sf0.001"
      val keys = Seq("p66_bpe_merges", "s34_sq_ann", "q65_approx_agg",
        "p60_vocab_build", "t41_bm25", "q52_traces", "t33_pii_scrub",
        "m35_payload_chunkdup", "q08_last_per_key", "q10_quantiles",
        "q12_survival", "q20_histogram", "q44_anti_join",
        "q50_snapshot_ages", "q51_quantile_sketch", "q53_competing_risks",
        "q56_docket_wait", "q61_sliding_distinct", "q62_transitions",
        "q63_fte_utilization", "q69_incr_rollup", "q70_constraint_audit",
        "q73_attribution")
      keys.foreach { k =>
        val df = SparkEntry.queries(k)(spark, dir)
        df.collect()
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        val p = plan.toString
        def n(sub: String) = sub.r.findAllIn(p).size
        println(s"[$k] scans=${n("Scan parquet")} smj=${n("SortMergeJoin")} " +
          s"bhj=${n("BroadcastHashJoin")} bnlj=${n("BroadcastNestedLoopJoin")} " +
          s"cart=${n("CartesianProduct")} win=${n("Window ")} " +
          s"exch=${n("Exchange ")} gen=${n("Generate ")}")
      }
      spark.stop(); return
    }
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val floored = operators.Pipeline.bpeLearnTable(docs).collect().toSeq
      val raw = operators.Pipeline.bpeLearnTable(docs, 1L).collect().toSeq
      println(s"[$dir] merge tables equal: ${floored == raw}")
      if (floored != raw) {
        println(s"  floored: ${floored.mkString(" | ")}")
        println(s"  raw:     ${raw.mkString(" | ")}")
      }
      graft.functions.GraftFunctions.register(spark)
      val sh = Tables.documents(spark, dir)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .withColumn("shingles", expr("graft_shingles3(words)"))
      val buckets = sh
        .select(col("doc_id"),
          posexplode(expr("graft_minhash_bands(shingles)")).as(Seq("band_idx", "band_key")))
        .groupBy("band_idx", "band_key").agg(count(lit(1)).as("n"))
        .orderBy(desc("n")).limit(5).collect()
      println(s"[$dir] top band buckets: " +
        buckets.map(r => s"${r.getLong(2)}").mkString(", "))
    }
    spark.stop()
  }
}
