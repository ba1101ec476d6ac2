package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators st33–st34 (SURVEY.md §2).
  *
  * The batch parquet drives a real streaming query (readStream →
  * transforms → memory sink, processAllAvailable) so the streaming
  * plumbing — watermarks, windowed state, output modes — is exercised
  * end-to-end while remaining deterministic for the DuckDB oracle.
  */
object Streams {
  private val counter = new AtomicInteger(0)

  /** st33: tumbling-window aggregation with watermark.
    * 1-hour event-time windows per event_type; complete mode to a memory
    * sink so every window is emitted regardless of watermark progress.
    * Epoch-aligned windows ≡ date_trunc('hour', ts) in the oracle.
    */
  def st33StreamWindow(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val ev = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val agg = ev
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    val name = s"st33_out_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("hour_start", "event_type")
  }
}
