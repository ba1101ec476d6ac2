package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Verify/Bench (driver-run) construct their own sessions per the driver
  * contract; this factory is for library users and tests. Shuffle
  * partitions default to local core count — size to cluster width in
  * production. AQE stays on for runtime coalescing and skew-join
  * splitting.
  */
object GraftSession {
  def create(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses
      // by default — the blessed session sets the shim at build time
      // (Tables.ensureNanosShim self-heals foreign sessions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
