package graft

import org.apache.spark.sql.SparkSession

/** Scratch: print the formatted plan + timing for one query. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val key = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(key)
    val df = fn(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(12000))
    (1 to 3).foreach { i =>
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[probe] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
