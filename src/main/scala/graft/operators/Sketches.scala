package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash._

/** q49: sketch-based approximate distinct counting (portable HLL).
  *
  * At 100 TB an exact `COUNT(DISTINCT token)` shuffles every distinct
  * value; the HyperLogLog sketch reduces each partition to 256 bucket
  * maxima that merge associatively — the canonical sketch for cardinality
  * at scale (Flajolet et al. 2007, the public construction; Spark's own
  * `approx_count_distinct` is the same idea but engine-specific, so it
  * can never hash-match a DuckDB oracle). This implementation is built
  * from the portable md5 hash and pure int64 arithmetic: rho from binary
  * string length (exact), the normalizer Z accumulated as an INTEGER in
  * units of 2⁻⁵³ (summation order cannot perturb it), only the final
  * division and the small-range ln() correction are floating-point.
  * The exact count is computed alongside to surface the sketch error.
  */
object Sketches {

  def q49HllSketch(spark: SparkSession, dir: String): DataFrame = {
    val two53 = 1L << (HllPatternBits + 1) // 2^53, the Z unit scale
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", ph(col("tok")))
    val rr = toks
      .withColumn("bucket", pmod(col("h"), lit(HllBuckets.toLong)))
      .withColumn("w", expr(s"h div $HllBuckets"))
      // rho = leading zeros in the 52-bit pattern + 1, via exact binary
      // string length (no float log2)
      .withColumn("rho", when(col("w") === 0, lit(HllPatternBits + 1))
        .otherwise(lit(HllPatternBits + 1) - length(bin(col("w")))))
    val bm = rr.groupBy("source", "bucket").agg(max(col("rho")).as("mx"))
    val z = bm.groupBy("source").agg(
        sum(expr(s"shiftleft(cast(1 as bigint), cast(${HllPatternBits + 1} - mx as int))")).as("zp"),
        count(lit(1)).as("nb"))
      .withColumn("zint", col("zp") + (lit(HllBuckets.toLong) - col("nb")) * lit(two53))
      .withColumn("zeros", lit(HllBuckets.toLong) - col("nb"))
    val m2 = HllBuckets.toDouble * HllBuckets
    val estRaw = lit(HllAlpha) * lit(m2) * lit(two53.toDouble) / col("zint").cast("double")
    val est = z.withColumn("est_raw", estRaw)
      .withColumn("hll_estimate", round(
        when(col("zeros") > 0 && col("est_raw") <= 2.5 * HllBuckets,
          lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("zeros").cast("double")))
          .otherwise(col("est_raw")), 4))
    val exact = toks.groupBy("source").agg(countDistinct(col("tok")).as("n_exact"))
    est.join(exact, Seq("source"))
      .withColumn("rel_err", round(
        abs(col("hll_estimate") - col("n_exact").cast("double")) / col("n_exact").cast("double"), 4))
      .select("source", "n_exact", "hll_estimate", "rel_err")
      .orderBy("source")
  }
}
