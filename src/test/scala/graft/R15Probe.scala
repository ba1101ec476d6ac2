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
