package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash._

/** Deduplication operators d21–d25 (SURVEY.md §2) over the `documents`
  * and `embeddings` tables — the LLM-training-data pipeline surface.
  *
  * Scale posture: no operator materializes O(n²) candidates globally.
  * Candidate generation is LSH-band buckets (d22), simhash chunk buckets
  * (d23), shingle inverted-index joins within a blocking key (d24), and
  * label blocking (d25). All hashes are [[graft.functions.PortableHash]]
  * (md5-based int64 arithmetic) so the DuckDB oracle reproduces them
  * bit-for-bit.
  */
object Dedup {

  /** Words + distinct 3-gram shingles; docs with <3 words excluded
    * (Spark's sequence(1, n) would go descending for n<1; DuckDB's
    * generate_series returns empty — semantics differ, so filter).
    */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", expr("graft_shingles3(words)"))
  }

  /** d21: exact dedup via md5 content hash; survivor = min doc_id. */
  def d21ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy("content_hash")
  }

  /** d22: MinHash + LSH banding near-dup candidate pairs.
    * 16 portable minhashes, 4 bands × 4 rows; docs sharing any band
    * bucket become a candidate pair. Linear in corpus size: the only
    * join is band-bucket self-join (skew-bounded by band selectivity).
    */
  def d22MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // single-pass band keys per document (graft_minhash_bands) — no token
    // explode, no signature shuffle, one evaluation per doc (a bare sig
    // array would be inlined into each band projection and recomputed);
    // the only shuffle is the band-bucket join
    val bands = shingled(spark, dir)
      .select(col("doc_id"),
        posexplode(expr("graft_minhash_bands(shingles)")).as(Seq("band_idx", "band_key")))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** d23: 48-bit SimHash + chunk-bucket hamming pairs.
    * Token hashes fold into a sign-vector simhash; 4 chunks of 12 bits
    * bucket candidates (any pair with hamming ≤ 12/:4 shares a chunk);
    * exact hamming ≤ 8 filters.
    */
  def d23Simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // single-pass 48-bit signature per document — replaces the
    // token × bit-position explode (millions of rows, two shuffles)
    val sims = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("graft_simhash48(array_distinct(split(text, ' ')))").as("simhash"))
    val chunks = sims
      .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 1)")).as("k"))
      .withColumn("chunk", expr("(simhash div cast(pow(2, 24 * k) as long)) % 16777216"))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b,
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("int").as("hamming"))
      // filter before distinct: the candidate stream is dominated by
      // random chunk collisions with hamming > 8 — drop them before the
      // dedup shuffle rather than after
      .filter(col("hamming") <= 8)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** d24: 3-gram Jaccard similarity pairs within a blocking key (source).
    * Inverted-index join on shingles (never all-pairs): pairs sharing a
    * shingle get an intersection count; union from per-doc shingle counts.
    */
  def d24NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // join on the 60-bit portable hash of the shingle, not the string
    // (smaller shuffle rows, cheaper compares; the oracle hashes
    // identically so a collision would be consistent), and carry each
    // doc's shingle count THROUGH the explode — the per-doc size is known
    // before unnesting, so no separate count aggregation and no join
    // back (1 self-join total instead of 3 joins + a third evaluation
    // of the shingle pipeline)
    val sh = shingled(spark, dir)
      .select(col("doc_id"), col("source"), size(col("shingles")).as("nsh"),
        explode(col("shingles")).as("s"))
      .withColumn("x", ph(col("s")))
      .drop("s")
    val a = sh.as("a"); val b = sh.as("b")
    a.join(b,
        col("a.source") === col("b.source") && col("a.x") === col("b.x") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.source").as("source"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"), col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", (col("na") + col("nb")).cast("long") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni").cast("double"), 4))
      .filter(col("jaccard") >= 0.5)
      .select("source", "doc_a", "doc_b", "inter", "uni", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** d25: embedding-cosine near-dup pairs, blocked by label.
    * Elementwise fold (zip_with + aggregate) in doc order on both engines
    * keeps double accumulation order identical; cosine rounded to 6dp.
    * Scale path for unblocked corpora is s27's hyperplane LSH.
    */
  def d25EmbedNeardup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .withColumn("norm", sqrt(expr("graft_dot(embedding, embedding)")))
      .select(col("vec_id"), col("label"), col("embedding").as("v"), col("norm"))
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", expr("graft_dot(a.v, b.v)"))
      .withColumn("cos_sim", round(col("dot") / (col("a.norm") * col("b.norm")), 6))
      .filter(col("cos_sim") >= 0.4)
      .select(col("a.label").as("label"), col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"), col("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }
}
