package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Checkpoints.Ops

/** Similarity-search operators s26–s27 (SURVEY.md §2): approximate
  * nearest neighbors over the `embeddings` table.
  *
  * s26 is the exact brute-force baseline for a fixed query set (cost is
  * |Q|·N — linear in the corpus for a bounded query set, so it scales).
  * s27 is the scale path: random-hyperplane LSH buckets computed with
  * deterministic integer hyperplanes so the DuckDB oracle reproduces the
  * same buckets; candidate generation is a bucket-equijoin, not a cross
  * join.
  */
object Similarity {

  /** Embeddings (raw float arrays) with precomputed L2 norm via the
    * codegen'd [[graft.functions.DotProduct]] expression — float elements
    * widen to double in the loop, exactly matching the oracle's
    * `embedding::DOUBLE[]` cast, with no interpreted lambdas in the path.
    */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .withColumn("norm", sqrt(expr("graft_dot(embedding, embedding)")))
      .select(col("vec_id"), col("label"), col("embedding").as("v"), col("norm"))
  }

  private val cosExpr = "graft_dot(q.v, c.v)"

  /** s26: brute-force cosine top-k for the query set (vec_id < 10). */
  def s26AnnTopk(spark: SparkSession, dir: String): DataFrame =
    s26Core(spark, dir, 5)

  /** Rank core at any depth — s26 reads the top-5; s38 draws its MMR
    * candidate pool from the same ranking (one definition). */
  private[graft] def s26Core(spark: SparkSession, dir: String, depth: Int): DataFrame = {
    val e = vecs(spark, dir)
    // broadcast the BOUNDED query set and stream the corpus past it —
    // without the hint Spark may build on the corpus side, which cannot
    // scale (the nested-loop join is inherent: the only predicate is <>)
    val q = broadcast(e.filter(col("vec_id") < 10)).as("q")
    val c = e.as("c")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_sim", round(expr(cosExpr) / (col("q.norm") * col("c.norm")), 6))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"), col("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= depth)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .orderBy("query_id", "rnk")
  }

  /** s27: random-hyperplane LSH bucketed ANN top-k, MULTI-PROBE.
    * 8 deterministic integer hyperplanes: component j of plane p is
    * ((1315423911·p + 2654435761·j) mod 1000003) − 501001. Bucket = the
    * 8 sign bits, computed by the codegen'd
    * [[graft.functions.HyperplaneBucket]] expression (one primitive loop
    * per row — replaces 8 interpreted aggregate/transform lambda chains
    * that ran 16× over baseline; VERDICT r1 #3).
    *
    * Single-bucket probing loses any true neighbor whose vector lands a
    * hair across ONE hyperplane (recall falls off as the corpus grows —
    * VERDICT r2). Standard fix: the QUERY side probes its own bucket plus
    * all 8 hamming-1 neighbor buckets (each sign bit flipped once) — a
    * 9-way explode of the bounded query set only. The corpus side stays
    * single-key, so the index is unchanged and candidate generation is
    * still a bucket equi-join; cost scales with |Q|·9, not the corpus.
    */
  def s27AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.NumPlanes
    val e = vecs(spark, dir).withColumn("bucket", expr("graft_hyperplane_bucket(v)"))
    val q = e.filter(col("vec_id") < 10)
      .withColumn("probe", explode(array((col("bucket") +:
        (0 until NumPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p)))): _*)))
      .as("q")
    val c = e.as("c")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, col("q.probe") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_sim", round(expr(cosExpr) / (col("q.norm") * col("c.norm")), 6))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"), col("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .orderBy("query_id", "rnk")
  }

  /** s28: IVF-cell ANN — the other standard ANN scale architecture.
    * Where s27 buckets by hash-sign bits, IVF partitions the corpus into
    * Voronoi cells of a centroid set (here [[graft.functions.IvfCells]]'
    * deterministic pseudo-centroids; a production build would k-means
    * them) and searches only the query's nprobe nearest cells. The
    * corpus indexes on its home cell (element 0); the query side
    * explodes its 2 probe cells — candidate generation stays a cell
    * equi-join, cost |Q|·nprobe·cell-size, never corpus².
    */
  /** s29: two-stage retrieval + recall evaluation — the production ANN
    * deployment shape: stage 1 generates candidates from the IVF cell
    * index (s28's equi-join, |Q|·nprobe·cell-size), stage 2 re-ranks
    * candidates by EXACT cosine and keeps top-5, and the output reports
    * per-query recall@5 against the brute-force truth (s26's shape) —
    * the offline eval every ANN index ships with (the q49/q51 pattern:
    * approximate result + its measured error). The exact pass exists
    * only for the eval column; production serves the re-ranked stage-2
    * list and runs this query on a sampled query set.
    */
  def s29AnnRerank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vecs(spark, dir).withColumn("cells", expr("graft_ivf_cells(v)"))
    val c = e.withColumn("cell", col("cells").getItem(0)).drop("cells").as("c")
    val q = e.filter(col("vec_id") < 10)
      .withColumn("cell", explode(col("cells"))).drop("cells").as("q")
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    // stage 1 (cell equi-join) + stage 2 (exact cosine on candidates);
    // a corpus vector matches at most one probe (single home cell), so
    // candidates are duplicate-free by construction
    val cand = q.join(c, col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_sim", round(expr(cosExpr) / (col("q.norm") * col("c.norm")), 6))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"), col("cos_sim"))
    val nCand = cand.groupBy("query_id").agg(count(lit(1)).as("n_candidates"))
    val approx = cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).select("query_id", "neighbor_id")
    val e2 = vecs(spark, dir)
    val exact = broadcast(e2.filter(col("vec_id") < 10)).as("q")
      .join(e2.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_sim", round(expr(cosExpr) / (col("q.norm") * col("c.norm")), 6))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"), col("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).select("query_id", "neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    nCand.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_candidates"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0), 2)
          .as("recall_at_5"))
      .orderBy("query_id")
  }

  def s28AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir).withColumn("cells", expr("graft_ivf_cells(v)"))
    val c = e.withColumn("cell", col("cells").getItem(0)).drop("cells").as("c")
    val q = e.filter(col("vec_id") < 10)
      .withColumn("cell", explode(col("cells"))).drop("cells").as("q")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_sim", round(expr(cosExpr) / (col("q.norm") * col("c.norm")), 6))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"), col("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .orderBy("query_id", "rnk")
  }

  /** s30: quantized Lloyd's k-means over the embedding corpus — the
    * "production build would k-means them" step s28's scaladoc defers,
    * and the clustering stage of embedding-based corpus curation
    * (cluster, then balance/filter per cluster — p62 consumes this).
    *
    * Reproducibility design: float centroid math is order-dependent
    * (a grouped float sum re-associates per partitioning, so avg-based
    * centroids differ run-to-run AND engine-to-engine). Instead the
    * corpus is quantized ONCE to an integer grid — q_i =
    * floor(e_i·10⁶) as BIGINT, identical in both engines because both
    * evaluate the same float64 product — and every subsequent step is
    * exact integer arithmetic: distances are BIGINT sums of squares
    * (≤ 64·(2·10⁶)² ≈ 2.6·10¹⁴, no overflow), the argmin is
    * min(d·100 + cid) (cid < 100, so the encoded key orders by
    * distance then cluster id — tie-breaks are engine-agnostic by
    * construction, no reliance on struct-compare or arg_min
    * semantics), and centroid updates divide component sums by the
    * member count in float64 then floor back to the grid (identical
    * IEEE ops both sides while Σ|q_i| < 2⁵³). Int8/int-quantized
    * embedding math is standard practice in production vector systems,
    * so the quantized variant is the honest scale shape, not a test
    * convenience.
    *
    * 100 TB posture: init is a TakeOrdered of K rows; each assignment
    * is a broadcast of ONE packed centroid row (K·64 longs) + a pure
    * projection — the argmin runs inside the row over the broadcast
    * array, NO N·K explode and NO per-point shuffle; each update is
    * one posexplode (N·64) partial-aggregated to K·64 rows before the
    * exchange. Iterations are fixed at 2 (unrolled — no driver loop,
    * no collect; lineage depth is constant).
    */
  /** s35's allowed label set — a static IN-list, chosen over an
    * arithmetic predicate (label % 2 = 0) because IN is a parquet
    * row-group pushdown primitive while modulo is not; PlanSpec pins
    * the pushed filter on the corpus scan. */
  val FilteredAnnLabels: Seq[Int] = Seq(0, 2, 4, 6, 8)

  /** s35: FILTERED vector search — top-k under a metadata predicate,
    * the production retrieval shape vector systems name as a hard
    * problem (post-filtering an index loses recall when the filter is
    * selective; pre-filtering loses the index when it isn't). The
    * declarative Spark answer is PRE-FILTER THROUGH THE INDEX: the
    * predicate composes into the IVF candidate equi-join's corpus side,
    * so (a) it reaches the parquet scan as a pushed row-group filter —
    * non-qualifying corpus vectors die before the join, and (b) the
    * cell index still bounds candidates (|Q|·nprobe·cell-size, never
    * filtered-corpus²). Recall semantics are exact w.r.t. the filtered
    * universe — unlike post-filtering, no qualifying neighbor is lost
    * to the cut-off, only to IVF's own probe miss (s29 measures that).
    * Per-query n_allowed_candidates reports the filtered fan-in.
    *
    * 100 TB posture: identical to s28 plus a scan-level filter —
    * strictly cheaper than the unfiltered probe.
    */
  def s35FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir).withColumn("cells", expr("graft_ivf_cells(v)"))
    val c = e.filter(col("label").isin(FilteredAnnLabels.map(Integer.valueOf): _*))
      .withColumn("cell", col("cells").getItem(0)).drop("cells").as("c")
    val q = e.filter(col("vec_id") < 10)
      .withColumn("cell", explode(col("cells"))).drop("cells").as("q")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_sim", round(expr(cosExpr) / (col("q.norm") * col("c.norm")), 6))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("c.label").as("neighbor_label"), col("cos_sim"))
      .withColumn("n_allowed_candidates",
        count(lit(1)).over(Window.partitionBy("query_id")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("query_id", "neighbor_id", "neighbor_label", "rnk", "cos_sim",
        "n_allowed_candidates")
      .orderBy("query_id", "rnk")
  }

  def s30Kmeans(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(spark, dir)
      .select(col("vec_id"), col("cid"), col("dist"))
      .orderBy("vec_id") // presentation/oracle determinism only

  private[graft] val KmeansK = 16

  /** floor(x·10⁶) integer-grid quantization of an embeddings frame. */
  /** Integer-grid quantization floor(x·10⁶) — the codegen'd
    * `graft_quantize_vec` kernel (r12): the previous `transform` HOF is
    * CodegenFallback, paying per-element closure dispatch on the corpus
    * grain at EVERY ANN family entry point. */
  private[graft] def quantize(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"),
      call_function("graft_quantize_vec", col("embedding")).as("q"))
  }

  /** The trained model — (cid, cv) centroids after one Lloyd update
    * from the deterministic init (K lowest vec_ids of the TRAINING
    * frame). Exposed separately so st40 can train on the standing
    * corpus and assign a different (streaming) frame. */
  private[graft] def kmeansModel(q: DataFrame): DataFrame = {
    // init: the K lowest vec_ids, cid = 1..K in vec_id order (K rows —
    // the unpartitioned window is a K-row TakeOrdered result)
    import org.apache.spark.sql.expressions.Window
    val init = q.orderBy("vec_id").limit(KmeansK)
      .select(row_number().over(Window.orderBy("vec_id")).as("cid"), col("q").as("cv"))
    updateStep(assignStep(q, init))
  }

  /** Final (vec_id, q, cid, dist) after 2 Lloyd iterations. */
  private[graft] def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = quantize(Tables.embeddings(spark, dir))
    assignStep(q, kmeansModel(q))
  }

  /** One packed-broadcast assignment pass: pts × (1-row centroid array)
    * → per-row argmin via min(d·100 + cid) over the array, computed by
    * the codegen'd [[graft.functions.KmeansArgmin]] (the interpreted
    * array_min/transform/zip_with chain measured ~385 µs/row at K=16 —
    * the whole operator's cost — vs a primitive loop). */
  /** K (cid, cv) rows folded into ONE row holding the sorted centroid
    * array — the broadcastable model payload. */
  private[graft] def packCentroids(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cents"))

  private[graft] def assignStep(pts: DataFrame, cents: DataFrame): DataFrame = {
    val packed = packCentroids(cents)
    pts.crossJoin(broadcast(packed))
      .withColumn("key", expr("graft_kmeans_argmin(q, cents)"))
      .select(col("vec_id"), col("q"),
        (col("key") % 100).cast("int").as("cid"),
        // integer div, not `/`: the key exceeds 2^53, double division
        // would round before the floor
        expr("key div 100L").as("dist"))
  }

  /** s31: per-cluster silhouette quality report for the s30 model — the
    * clustering-eval harness completing the s29 pattern (s29 grades the
    * ANN index, s31 grades the clustering itself). Centroid-based
    * simplified silhouette (Rousseeuw 1987's s(i) with centroid
    * distances standing in for mean member distances — the standard
    * O(N·K) large-corpus variant of the O(N²) original): a(i) = squared
    * distance to the OWN centroid (the assignment already computed it),
    * b(i) = min squared distance to any OTHER centroid, s(i) =
    * (b−a)/max(a,b). On s30's integer grid every distance is an exact
    * int64, and s(i) is reported in permyriad via integer division —
    * bit-identical across engines, no float ratios. Assignment is the
    * global argmin, so a ≤ b and s ∈ [0, 10000] by construction.
    *
    * Scale posture: ONE pass over the assigned corpus with the packed
    * K-row model broadcast; b(i) is the same codegen'd argmin primitive
    * over the own-centroid-filtered array (the K-element `filter` runs
    * per row on a 16-struct broadcast array — constant work, no
    * N·K explode); the report partial-aggregates to ≤K rows per task.
    */
  def s31Silhouette(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = quantize(Tables.embeddings(spark, dir))
    val model = kmeansModel(q) // ONE model subtree feeds assignment AND b(i)
    val asg = assignStep(q, model)
    asg.crossJoin(broadcast(packCentroids(model)))
      .withColumn("okey", expr("graft_kmeans_argmin(q, filter(cents, c -> c.cid != cid))"))
      .withColumn("b2", expr("okey div 100L"))
      .withColumn("s_pm",
        expr("(b2 - dist) * 10000 DIV greatest(greatest(dist, b2), 1L)"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        expr("sum(s_pm) DIV count(1)").as("mean_sil_pm"),
        min(col("s_pm")).as("min_sil_pm"),
        max(col("s_pm")).as("max_sil_pm"))
      .orderBy("cid")
  }

  /** One centroid update: posexplode to (cid, pos) grain, exact integer
    * component sums, floor(sum/n) back onto the grid, rebuild arrays in
    * pos order. K·64 rows out — broadcastable by construction. */
  private def updateStep(asg: DataFrame): DataFrame =
    asg.select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .withColumn("cv_i", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy("cid")
      .agg(sort_array(collect_list(struct(col("pos"), col("cv_i")))).as("pcs"))
      .select(col("cid"), transform(col("pcs"), p => p.getField("cv_i")).as("cv"))

  private[graft] val PqM = 8    // subspaces
  private[graft] val PqDim = 8  // dims per subspace (8 × 8 = 64)
  private[graft] val PqK = 16   // codewords per subspace → 4-bit codes

  /** The subspace-explode fragment: one (m, sq) struct per subspace. */
  private val pqSubExpr =
    s"explode(transform(sequence(0, ${PqM - 1}), m -> struct(m AS m, slice(q, m * $PqDim + 1, $PqDim) AS sq)))"

  /** Per-subspace PQ codebooks (m, cid, cv): init = the subvectors of
    * the [[PqK]] lowest vec_ids (s30's init discipline), ONE Lloyd
    * update per subspace on the integer grid (same exact arithmetic as
    * [[kmeansModel]] — min(d·100+cid) argmin, floor(sum/n) update),
    * then cids renumbered DENSE per subspace so a code is exactly a
    * position in the cid-sorted codeword array (the ADC lookup index —
    * no reliance on every init codeword surviving the update). */
  private[graft] def pqCodebook(q: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val init = q.orderBy("vec_id").limit(PqK)
      .select(row_number().over(Window.orderBy("vec_id")).as("cid"), col("q"))
      .select(col("cid"), expr(pqSubExpr).as("e"))
      .select(col("e.m").as("m"), col("cid"), col("e.sq").as("cv"))
    val initPacked = init.groupBy("m")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cents"))
    val sub = q.select(col("vec_id"), expr(pqSubExpr).as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.sq").as("sq"))
    val asg = sub.join(broadcast(initPacked), Seq("m"))
      .select(col("m"), col("sq"),
        (expr("graft_kmeans_argmin(sq, cents)") % 100).cast("int").as("cid"))
    asg.select(col("m"), col("cid"), posexplode(col("sq")).as(Seq("pos", "v")))
      .groupBy("m", "cid", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .withColumn("cv_i", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy("m", "cid")
      .agg(sort_array(collect_list(struct(col("pos"), col("cv_i")))).as("pcs"))
      .select(col("m"), col("cid"), transform(col("pcs"), p => p.getField("cv_i")).as("cv"))
      .withColumn("cid2",
        row_number().over(Window.partitionBy("m").orderBy("cid")).cast("int"))
      .select(col("m"), col("cid2").as("cid"), col("cv"))
  }

  /** The M·K codebook rows folded into ONE broadcastable row:
    * model[m] = the cid-sorted codeword array of subspace m. */
  private def packPq(cb: DataFrame): DataFrame =
    cb.groupBy("m")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cents"))
      .agg(sort_array(collect_list(struct(col("m"), col("cents")))).as("ms"))
      .select(transform(col("ms"), x => x.getField("cents")).as("model"))

  /** s32: product-quantization ANN with asymmetric distance computation
    * (Jégou–Douze–Schmid, "Product quantization for nearest neighbor
    * search", TPAMI 2011) — the memory-compression leg of the ANN family
    * (s27 buckets, s28 cells, s32 compresses): each 64-dim vector is
    * stored as [[PqM]] 4-bit codes (64 floats → 8 codes, a 64× memory
    * cut), queries score candidates by summing per-subspace
    * query↔codeword distances from a precomputed table (ADC — the
    * vector itself is never touched at query time). Codebooks are
    * per-subspace Lloyd codewords on s30's exact integer grid, so every
    * distance, code, and table entry is an exact BIGINT — bit-identical
    * across engines. Top-5 per query by (approx distance, neighbor id),
    * graded s29-style against the exact grid-L2 top-5 (recall@5 in
    * integer permyriad), with the rank-1 approximate neighbor and its
    * code-approximated distance as witnesses.
    *
    * 100 TB posture: the model is ONE broadcast row (8×16 codewords);
    * encoding is a pure projection per corpus row (argmin over the
    * broadcast array inside the row — no N·K explode, no shuffle);
    * scoring streams the corpus past the broadcast query table with 8
    * array lookups per pair (never touching the 64-dim vectors); the
    * only corpus-grain exchange is the per-query top-k rank the whole
    * ANN family pays. The exact-truth side is eval-only (bounded query
    * set, the s29/q49 measured-error pattern).
    */
  def s32PqAdc(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val q = quantize(Tables.embeddings(spark, dir))
    val model = packPq(pqCodebook(q))
    // encode: codes[m] = dense cid of the nearest codeword of subspace m
    val codes = q.crossJoin(broadcast(model))
      .select(col("vec_id"), expr(
        s"transform(sequence(0, ${PqM - 1}), m -> CAST(graft_kmeans_argmin(slice(q, m * $PqDim + 1, $PqDim), model[m]) % 100 AS INT))")
        .as("codes"))
    // per-query 2D distance table: dt[m][cid-1] = ‖query_m − cv‖² (the
    // 10-row query set pays an interpreted fold; corpus rows never do)
    val dtExpr =
      s"""transform(sequence(0, ${PqM - 1}), m -> transform(model[m],
         |  cc -> aggregate(sequence(1, $PqDim), 0L, (acc, i) ->
         |    acc + (element_at(slice(q, m * $PqDim + 1, $PqDim), i) - element_at(cc.cv, i))
         |        * (element_at(slice(q, m * $PqDim + 1, $PqDim), i) - element_at(cc.cv, i)))))""".stripMargin
    val queries = q.filter(col("vec_id") < 10).crossJoin(broadcast(model))
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        expr(dtExpr).as("dt"))
    val wA = Window.partitionBy("query_id").orderBy(col("approx_d"), col("neighbor_id"))
    val approx = codes
      .crossJoin(broadcast(queries.select(col("query_id"), col("dt"))))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${PqM - 1}), 0L, (acc, m) -> acc + dt[m][codes[m] - 1])")
          .as("approx_d"))
      .withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= 5)
    // exact grid-L2 truth: the argmin primitive with a singleton
    // candidate set is a plain codegen'd distance (key div 100)
    val wE = Window.partitionBy("query_id").orderBy(col("exact_d"), col("neighbor_id"))
    val truth = q
      .crossJoin(broadcast(queries.select(col("query_id"), col("qv"))))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("graft_kmeans_argmin(q, array(struct(0, qv))) div 100").as("exact_d"))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= 5)
    val hits = approx.join(truth.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    approx.filter(col("rnk") === 1)
      .select(col("query_id"), col("neighbor_id").as("nn_approx"),
        col("approx_d").as("nn_approx_d"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("nn_approx"), col("nn_approx_d"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) * 2000).as("recall_pm"))
      .orderBy("query_id")
  }

  /** The in-expression floor(x·10⁶) grid — [[quantize]] as a SQL
    * fragment, so cell assignment and PQ codes can share ONE projection
    * over the raw embedding without a self-join. */
  private val gridExpr =
    "transform(embedding, x -> CAST(floor(x * 1000000.0D) AS BIGINT))"

  /** s33: IVF-PQ — the composed production vector index (FAISS's
    * IVFPQ: Jégou TPAMI'11 §V): s28's inverted cells bound WHICH
    * candidates a query scores (nprobe=2 cell equi-join, never the
    * corpus) and s32's product-quantization codes bound WHAT scoring
    * costs (8 table lookups per candidate, vectors never touched).
    * Index rows carry (home cell, 8 codes) — both derived in ONE
    * projection per corpus row over the broadcast codebook model; the
    * bounded query set probes its top-2 cells with its precomputed
    * distance tables attached. Per query: candidate count, ADC top-5,
    * and recall@5 vs the exact grid-L2 truth (the s29 report shape —
    * this is the eval harness for the index both mechanisms feed).
    *
    * 100 TB posture: candidate generation is s28's cell equi-join
    * (linear, cell-bounded); scoring is s32's broadcast-table lookup;
    * the only corpus-grain exchanges are the cell join's and the
    * per-query top-k the whole family pays. Training, encoding, and
    * probing all reuse the s30/s32 shared definitions — one grid, one
    * argmin, one codebook.
    */
  def s33IvfPq(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val q = quantize(Tables.embeddings(spark, dir))
    val model = packPq(pqCodebook(q))
    val corp = Tables.embeddings(spark, dir).crossJoin(broadcast(model))
      .select(col("vec_id"),
        expr("graft_ivf_cells(embedding)[0]").as("cell"),
        expr(s"transform(sequence(0, ${PqM - 1}), m -> CAST(graft_kmeans_argmin(slice($gridExpr, m * $PqDim + 1, $PqDim), model[m]) % 100 AS INT))")
          .as("codes"))
    val dtExpr =
      s"""transform(sequence(0, ${PqM - 1}), m -> transform(model[m],
         |  cc -> aggregate(sequence(1, $PqDim), 0L, (acc, i) ->
         |    acc + (element_at(slice(q, m * $PqDim + 1, $PqDim), i) - element_at(cc.cv, i))
         |        * (element_at(slice(q, m * $PqDim + 1, $PqDim), i) - element_at(cc.cv, i)))))""".stripMargin
    // probes come from the RAW embedding — the same cell function the
    // corpus home cell uses (the quantized grid exists only for PQ)
    val qp = Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
      .crossJoin(broadcast(model))
      .withColumn("q", expr(gridExpr))
      .select(col("vec_id").as("query_id"), expr(dtExpr).as("dt"),
        explode(expr("graft_ivf_cells(embedding)")).as("cell"))
    val wA = Window.partitionBy("query_id").orderBy(col("approx_d"), col("neighbor_id"))
    val cand = corp.join(broadcast(qp.select(col("query_id"), col("dt"), col("cell"))),
        Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${PqM - 1}), 0L, (acc, m) -> acc + dt[m][codes[m] - 1])")
          .as("approx_d"))
    val nCand = cand.groupBy("query_id").agg(count(lit(1)).as("n_candidates"))
    val approx = cand.withColumn("rnk", row_number().over(wA)).filter(col("rnk") <= 5)
    val wE = Window.partitionBy("query_id").orderBy(col("exact_d"), col("neighbor_id"))
    val truth = q
      .crossJoin(broadcast(q.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qv"))))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("graft_kmeans_argmin(q, array(struct(0, qv))) div 100").as("exact_d"))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= 5)
    val hits = approx.join(truth.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    nCand.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_candidates"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) * 2000).as("recall_pm"))
      .orderBy("query_id")
  }

  /** s34: SCALAR-quantization ANN (FAISS's SQ8 index) — the remaining
    * compression leg of the ANN family: where s32's PQ learns per-
    * subspace codebooks (64× cut, lossy across dims), SQ quantizes each
    * dimension INDEPENDENTLY to an 8-bit affine code against per-dim
    * corpus min/max (8× cut, no codebook training, the default
    * memory/recall trade in production vector stores). Model = ONE
    * broadcast row of per-dim (lo, hi) bounds from a single map-side
    * min/max aggregate; encode⊕decode collapse into one projection that
    * reconstructs x̂ᵢ = loᵢ + round-trip(xᵢ) — exactly what a scan over
    * stored codes computes — and scoring is the asymmetric s29 shape:
    * the RAW query against reconstructed corpus vectors, via the same
    * codegen'd [[graft.functions.KmeansArgmin]] singleton-candidate
    * device the exact truth uses (no interpreted fold on the corpus
    * grain). All arithmetic exact BIGINT on s30's grid: code = (x−lo)
    * ·255 div max(1, hi−lo), span-0 dims round-trip to themselves.
    * Report: top-5 by (approx_d, id) + recall@5 vs exact grid-L2 truth
    * (the s29/s32 measured-error harness).
    *
    * 100 TB posture: the stats pass partial-aggregates 64 min/max pairs
    * map-side; corpus rows meet only a 1-row broadcast model and the
    * broadcast query set; the only corpus-grain exchange is the
    * per-query top-k the whole family pays.
    */
  /** s34's encode⊕decode round-trip over columns (q, lo, hi) — the
    * codegen'd `graft_sq_xhat` kernel (r12; the previous
    * transform-over-sequence SQL fragment ran six interpreted
    * element_at probes per dim per corpus row). Exposed so the
    * property test drives the exact production expression against an
    * in-memory reference. */
  private[graft] def sqXhat: Column =
    call_function("graft_sq_xhat", col("q"), col("lo"), col("hi"))

  def s34SqAnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val dim = PqM * PqDim
    // quantization + the argmin scoring kernels fuse onto the scan —
    // rebalance so a single-row-group file doesn't serialize them.
    // NOT checkpointed (tried r13): q has three consumers (model agg,
    // query filter, scored pass) but materializing the 512-dim arrays
    // costs what the two saved re-quantizations save (A/B 2.95 vs
    // 3.00 s — a wash); the rebalanced kernel pass is cheap enough to
    // re-run.
    val q = quantize(Tables.rebalanceSmallScan(Tables.embeddings(spark, dir)))
    val model = broadcast(q.agg(
      array((1 to dim).map(i => min(element_at(col("q"), i))): _*).as("lo"),
      array((1 to dim).map(i => max(element_at(col("q"), i))): _*).as("hi")))
    val queries = broadcast(q.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qv")))
    // ONE corpus×queries pass (r12, VERDICT r11 item 6): both the
    // reconstructed (x̂, approx) and raw (exact) distances come off the
    // same scored row, the two rankings are STACKED windows over the
    // same query_id partitioning (one exchange, two in-partition
    // sorts), and the report is a conditional aggregation — the
    // previous shape ran xh×queries and q×queries as two separate
    // corpus passes plus a semi-join and a left join between their
    // rankings.
    val wA = Window.partitionBy("query_id").orderBy(col("approx_d"), col("neighbor_id"))
    val wE = Window.partitionBy("query_id").orderBy(col("exact_d"), col("neighbor_id"))
    val scored = q.crossJoin(model)
      .select(col("vec_id"), col("q"), sqXhat.as("xhat"))
      .crossJoin(queries)
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("graft_kmeans_argmin(xhat, array(struct(0, qv))) div 100").as("approx_d"),
        expr("graft_kmeans_argmin(q, array(struct(0, qv))) div 100").as("exact_d"))
      .withColumn("rnk_a", row_number().over(wA))
      .withColumn("rnk_e", row_number().over(wE))
    scored.groupBy("query_id")
      .agg(
        max(when(col("rnk_a") === 1, col("neighbor_id"))).as("nn_approx"),
        max(when(col("rnk_a") === 1, col("approx_d"))).as("nn_approx_d"),
        count(when(col("rnk_a") <= 5 && col("rnk_e") <= 5, lit(1))).as("n_hit"))
      .select(col("query_id"), col("nn_approx"), col("nn_approx_d"),
        col("n_hit"), (col("n_hit") * 2000).as("recall_pm"))
      .orderBy("query_id")
  }

  /** s36: feature-hashed text retrieval (the hashing trick, Weinberger
    * et al. ICML'09) — similar-document search over RAW TEXT with no
    * embedding model: each document vectorizes by hashing its tokens
    * into [[graft.functions.PortableHash.HashVecDim]] signed-count
    * components (token w adds ±1 to component ph(w) mod D; the hash-bit
    * sign keeps inner products unbiased, §3 of the paper), then cosine
    * top-5 for the bounded query set — s26's retrieval harness on the
    * hashed vectors. The components are exact small integers (carried
    * as doubles ≪ 2⁵³), so the codegen'd dot product and the oracle's
    * exact-BIGINT relational dot agree bit-for-bit.
    *
    * 100 TB posture: vectorization is the codegen'd `graft_hash_vec`
    * kernel — one pass per document, zero shuffle (the declarative form
    * explodes the corpus to the token grain through a (doc, bucket)
    * aggregation); scoring streams the corpus past the broadcast
    * bounded query set, |Q|·N like s26. Because the output is an
    * ordinary fixed-width vector column, the WHOLE ANN family composes
    * on top unchanged — s27 hyperplane buckets, s28/s33 IVF cells, s30
    * k-means — giving the embedding-free corpus the same sublinear
    * retrieval paths. Zero-norm documents (empty or fully
    * sign-cancelled) score NULL via nullif and rank LAST (explicit
    * NULLS LAST both engines) — deliberately NOT a `norm > 0` filter:
    * predicate pushdown inlines the filter's aliases into the scan
    * filter, so the kernel would evaluate 3× per corpus row (the
    * CollapseProject multi-reference guard protects stacked
    * projections, but PushPredicateThroughNonJoin has no such guard —
    * observed in the executed plan).
    */
  def s36HashVectors(spark: SparkSession, dir: String): DataFrame =
    s36HashVecCore(spark, Tables.documents(spark, dir), 5)

  /** Rank core at any depth over any (doc_id, text) frame — s36 reads
    * the top-5; s37 fuses the same ranking at depth
    * [[Similarity.RrfDepth]] (ONE definition, the t41/withPredLang
    * sharing discipline). */
  private[graft] def s36HashVecCore(spark: SparkSession, documents: DataFrame,
      depth: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val e = documents
      .withColumn("words", split(coalesce(col("text"), lit("")), " "))
      .select(col("doc_id"), expr("graft_hash_vec(words)").as("v"))
      .withColumn("norm", sqrt(expr("graft_dot(v, v)")))
    val q = broadcast(e.filter(col("doc_id") < 10)).as("q")
    val c = e.as("c")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc_nulls_last, col("neighbor_id"))
    q.join(c, col("q.doc_id") =!= col("c.doc_id"))
      .withColumn("cos_sim",
        expr("round(graft_dot(q.v, c.v) / nullif(q.norm * c.norm, 0D), 6)"))
      .select(col("q.doc_id").as("query_id"),
        col("c.doc_id").as("neighbor_id"), col("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= depth)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .orderBy("query_id", "rnk")
  }

  /** s37 fusion constants: both retrieval legs rank to [[RrfDepth]],
    * fuse with the standard RRF constant k = [[RrfK]] (Cormack &
    * Clarke SIGIR'09 use 60), report the top [[RrfTopK]]. */
  val RrfDepth = 10
  val RrfK = 60
  val RrfTopK = 5

  /** s37: hybrid retrieval — reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher SIGIR'09) of the corpus's two retrieval signals: t41's
    * BM25 lexical ranking and s36's feature-hashed vector ranking, for
    * the same bounded query set. RRF(d) = Σ_lists 1/(k + rank_d); a
    * doc absent from a list contributes 0. The score is QUANTIZED to
    * exact integers — 10⁶ DIV (k + rank) per leg — so both engines
    * fuse and tie-break (neighbor_id) bit-identically: no floats
    * anywhere in the fusion (the t35 integer-relevance device).
    *
    * Each leg is the SHARED rank core of its standalone operator
    * (t41Bm25Core / s36HashVecCore at depth [[RrfDepth]]) — the fusion
    * cannot drift from the operators it fuses. Null-cosine (zero-norm)
    * vector rows are excluded from the vector leg: a rank among nulls
    * carries no signal.
    *
    * 100 TB posture: both legs are bounded-query-set rankings (≤
    * |Q|·depth rows each); the fusion full-outer join and window run on
    * that tiny grain — the corpus-sized work is entirely inside the two
    * legs, each already scale-shaped (t41 probes query-term postings;
    * s36 streams the corpus past a broadcast query set once).
    */
  /** s38 MMR geometry: candidate pool depth, picks, and the relevance
    * weight λ = [[MmrLambdaNum]]/10 (so scores stay pure integers:
    * mmr = 7·rel_ppm − 3·pen_ppm). */
  val MmrPool = 10
  val MmrK = 5
  val MmrLambdaNum = 7

  /** s38: Maximal Marginal Relevance diversity re-ranking (Carbonell &
    * Goldstein SIGIR'98) — the retrieval post-processor every RAG stack
    * runs so the k passages handed to the model aren't five copies of
    * the same paragraph: greedily pick argmax λ·rel(c) −
    * (1−λ)·max_{s∈S} sim(c, s) from the top-[[MmrPool]] candidate pool
    * ([[s26Core]] — one ranking definition with s26) until
    * [[MmrK]] are selected. All arithmetic is integer ppm (cosines are
    * 6dp-rounded then ×10⁶ floor-scaled; λ = 7/10 clears to
    * 7·rel − 3·pen), so both engines select and tie-break (cand_id)
    * bit-identically.
    *
    * 100 TB posture: the corpus-sized work is exactly s26's one
    * broadcast-query scan producing the pool; the pool (≤|Q|·10 rows)
    * and its vectors (semi-join probe of the corpus) localCheckpoint
    * (the p66 iterate-on-the-checkpoint device; without it each
    * consumer re-derives the corpus ranking). The K greedy steps then
    * run ENTIRELY IN-EXPRESSION (r9 — the r8 verdict's stage-count
    * item): each query's pool and pairwise sim grid collect into ONE
    * row of arrays, and the K argmax-and-penalty-update steps unroll
    * as array-HOF column expressions over those ≤10/≤90-element arrays
    * (the q56/q64 fold device — interpreted HOF cost is nil on a
    * |Q|-row grain, the t38 lesson's corpus-grain caveat inverted),
    * replacing K rounds of anti-join + penalty join + rank window
    * (~6 scheduler stages per step, the dominant wall-time at any SF —
    * measured 5.9 s → ~2 s at sf0.1) with one projection + posexplode.
    * Greedy MMR is inherently sequential in K; the sequence now lives
    * inside one expression tree, and nothing driver-side touches data.
    */
  def s38Mmr(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val ppm = (c: Column) => floor(c * 1000000d + 0.5d).cast("long")
    val cands = s26Core(spark, dir, MmrPool)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        ppm(col("cos_sim")).as("rel_ppm"))
      .graftCheckpoint()
    val e = vecs(spark, dir)
    val cv = e.join(broadcast(cands.select("cand_id").distinct()),
        col("vec_id") === col("cand_id"))
      .select(col("cand_id"), col("v"), col("norm"))
      .graftCheckpoint()
    val cva = cv.select(col("cand_id").as("ca"), col("v").as("va"), col("norm").as("na"))
    val cvb = cv.select(col("cand_id").as("cb"), col("v").as("vb"), col("norm").as("nb"))
    val sims = cands.as("a")
      .join(cands.select(col("query_id"), col("cand_id").as("cb")).as("b"),
        col("a.query_id") === col("b.query_id") && col("a.cand_id") =!= col("cb"))
      .select(col("a.query_id").as("query_id"), col("a.cand_id").as("ca"), col("cb"))
      .join(broadcast(cva), Seq("ca"))
      .join(broadcast(cvb), Seq("cb"))
      .withColumn("sim_ppm",
        ppm(round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6)))
      .select("query_id", "ca", "cb", "sim_ppm")
    // pack each query's pool and sim grid into ONE row of arrays …
    val packed = cands.groupBy("query_id")
      .agg(collect_list(struct(col("cand_id"), col("rel_ppm"))).as("pool"))
      .join(sims.groupBy("query_id")
          .agg(collect_list(struct(col("ca"), col("cb"), col("sim_ppm")))
            .as("simarr")),
        Seq("query_id"), "left")
      .withColumn("simarr",
        coalesce(col("simarr"),
          expr("CAST(array() AS ARRAY<STRUCT<ca:BIGINT,cb:BIGINT,sim_ppm:BIGINT>>)")))
    // … and unroll the K greedy steps as column expressions over those
    // arrays. Each step scores the not-yet-selected pool members
    // (penalty = max sim to any selected member, 0 when none), picks the
    // argmax of 7·rel − 3·pen with cand_id tie-break via a lexicographic
    // sort key (negated mmr, cand_id — exactly the prior rank window's
    // ordering), and appends the winner to the running `sel` array. A
    // step is THREE chained columns (selected ids → sorted scores →
    // append) rather than one nested expression: the single-expression
    // form repeats the sel-referencing lambdas ~5× inside one tree and
    // Spark's eager analysis never returns on it (measured: hangs at
    // step 2 even on a 1-row frame), while these D-sized pieces each
    // analyze in ~0.1 s and CollapseProject's multi-reference guard
    // keeps them layered.
    val lam = MmrLambdaNum; val lamC = 10 - MmrLambdaNum
    val sel0 = s"""array(named_struct('step', 1, 'w',
      element_at(array_sort(transform(pool, c -> named_struct(
        'm', -(c.rel_ppm * $lam), 'cand', c.cand_id,
        'rel', c.rel_ppm, 'pen', 0L))), 1)))"""
    val greedy = (2 to MmrK).foldLeft(
        packed.withColumn("sel", expr(sel0))) { (df, i) =>
      df.withColumn("selc", expr("transform(sel, x -> x.w.cand)"))
        .withColumn("scored", expr(s"""array_sort(transform(
            filter(pool, c -> NOT array_contains(selc, c.cand_id)),
            c -> named_struct(
              'm', -(c.rel_ppm * $lam - coalesce(array_max(transform(
                     filter(simarr, s -> s.ca = c.cand_id AND
                       array_contains(selc, s.cb)),
                     s -> s.sim_ppm)), 0L) * $lamC),
              'cand', c.cand_id,
              'rel', c.rel_ppm,
              'pen', coalesce(array_max(transform(
                       filter(simarr, s -> s.ca = c.cand_id AND
                         array_contains(selc, s.cb)),
                       s -> s.sim_ppm)), 0L))))"""))
        .withColumn("sel", expr(s"""CASE WHEN size(scored) = 0 THEN sel
            ELSE concat(sel, array(named_struct('step', $i, 'w',
              element_at(scored, 1)))) END"""))
        .drop("selc", "scored")
    }
    // materialize the |Q|-row greedy result before exploding: explode
    // directly over the layered step stack sends the optimizer's
    // generator/nested-field rewrites into a pathological blow-up (48 MB
    // task binaries, never returns) — the checkpoint is a one-job
    // barrier on ≤|Q| rows and the explode then runs over a plain
    // materialized relation
    val picked = greedy.select("query_id", "sel").graftCheckpoint()
    picked.select(col("query_id"), explode(col("sel")).as("x"))
      .select(col("query_id"), col("x.step").cast("long").as("step"),
        col("x.w.cand").as("neighbor_id"), col("x.w.rel").as("rel_ppm"),
        col("x.w.pen").as("pen_ppm"),
        (col("x.w.rel") * lam - col("x.w.pen") * lamC).as("mmr_score"))
      .orderBy("query_id", "step")
  }

  def s37RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val vec = s36HashVecCore(spark, docs, RrfDepth)
      .filter(col("cos_sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"),
        col("rnk").cast("long").as("vec_rnk"))
    val lex = TextAnalysis.t41Bm25Core(docs, RrfDepth)
      .select(col("query_id"), col("neighbor_id"), col("rnk").as("bm25_rnk"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("neighbor_id"))
    vec.join(lex, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000 DIV ($RrfK + vec_rnk)"), lit(0L)) +
        coalesce(expr(s"1000000 DIV ($RrfK + bm25_rnk)"), lit(0L)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= RrfTopK)
      .select("query_id", "rnk", "neighbor_id", "vec_rnk", "bm25_rnk", "rrf_score")
      .orderBy("query_id", "rnk")
  }
}
