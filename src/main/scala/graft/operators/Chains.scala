package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Checkpoints, Tables}

/** q46: transitive link-chain resolution — iterate-to-fixpoint connected
  * chains over an explicit parent-link column.
  *
  * Mirrors the reference's `logical_cases` loop
  * (scratch/other/event-history.R:42-52): field appeals are chained to
  * their parent appeal via `BFDDEC = BFDPDCN` links, repeatedly
  * self-joining until no row advances, so every record ends up labeled
  * with the root of its logical case. Unlike q15's 365-day gap heuristic,
  * this follows ARBITRARY-span links — the real semantics.
  *
  * Two resolution strategies, chosen by the caller's depth hint (measured
  * round 9 — the r8 verdict's adjudication):
  *
  *  - ONE-HOP (depthHint ≤ [[Chains.OneHopDepthCutoff]]): each round
  *    advances every unsettled row a single hop by joining it against the
  *    STATIC link table — which is repartitioned by id and sorted ONCE,
  *    then checkpointed, so its `HashPartitioning(id)` + per-partition
  *    order survive into every round's sort-merge join and the lookup
  *    side never shuffles or sorts again. Only the geometrically
  *    shrinking active set crosses the wire each round. A chain of depth
  *    d needs d rounds, but each round is one small shuffle + one
  *    checkpoint of the survivors — for the bounded depths real link data
  *    has ("appeals are remanded under 16 times") this beats doubling,
  *    whose every round re-shuffles the FULL evolving state on both join
  *    sides (r8 measured: the doubling form's absolute gap GREW across
  *    the 10× SF step, 1.5 s → 20.8 s vs DuckDB; the one-hop form is the
  *    fix).
  *  - POINTER DOUBLING (deeper hints): each round joins unsettled rows
  *    against the full state on `cur = id`, composing known ancestor
  *    paths, so resolved distance squares per round and depth d settles
  *    in ceil(log2 d) + 1 rounds. The right shape when depth is
  *    unbounded/unknown — round count is logarithmic — at the price of
  *    shuffling the evolving state every round.
  *
  * Fixpoint probes are count-based in both modes: every round already
  * eagerly checkpoints the advanced rows, so a `count()` over the
  * materialized partitions is a near-free scheduler round-trip and
  * doubles as the emptiness test — no separate `isEmpty` job, and the
  * doubling mode coalesces its shrinking active set to a partition count
  * sized by that count before checkpointing (late rounds were pure
  * scheduling overhead at the full width).
  *
  * Fault tolerance at cluster scale: all per-round materializations go
  * through [[graft.Checkpoints]] — `localCheckpoint` (memory-only, fast)
  * by default, reliable `checkpoint()` into `spark.graft.checkpoint.dir`
  * when that conf is set, which is what a multi-hour 100 TB run wants
  * (executor loss mid-iteration is survivable). Driver-side logic is
  * coordination only (one count per round), never data.
  */
object Chains {

  /** Depth hint at or below which [[resolveChains]] uses the one-hop
    * strategy (d cheap rounds) instead of pointer doubling (log2 d heavy
    * rounds). At 24 one-hop pays ≤24 small-shuffle rounds vs doubling's
    * ~5 full-state rounds — the crossover sits well above real link-data
    * depths. */
  val OneHopDepthCutoff = 24

  /** Hops folded into one plan per materialized round in the one-hop
    * strategy: settled-row extraction happens only at round boundaries,
    * so a round is ONE job of [[HopsPerRound]] pipelined
    * exchange+join+project steps instead of three checkpoint jobs — the
    * per-round scheduler/materialization constant measured at ~0.8 s/hop
    * at sf1 amortizes 3×. */
  val HopsPerRound = 3

  /** Resolve each record's chain root over a (id, parent) link table.
    * `parent` links pointing at ids absent from the table are treated as
    * terminal (the record is its chain's root) — dangling links happen in
    * the reference data when the parent case predates the extract.
    * Output: (id, chain_root, depth); depth = hops from id to root.
    *
    * @param depthHint expected max chain depth (e.g. "appeals are
    *   remanded under 16 times"): selects the strategy (one-hop vs
    *   doubling). Correctness never depends on the hint — both loops run
    *   to a counted fixpoint and fail fast if maxIters rounds don't
    *   reach it.
    */
  def resolveChains(linksRaw: DataFrame, maxIters: Int = 20,
      depthHint: Int = 1): DataFrame =
    // state invariant (both modes): cur = an ancestor exactly `depth`
    // hops up; settled ⇔ cur is a root.
    if (depthHint <= OneHopDepthCutoff) resolveOneHop(linksRaw, maxIters)
    else resolveDoubling(linksRaw, maxIters, depthHint)

  /** One-hop rounds against a statically-partitioned link table: the
    * lookup side is repartitioned by id + sorted ONCE and checkpointed
    * (partitioning and ordering survive the checkpoint), so each hop's
    * sort-merge join exchanges and sorts ONLY the advancing state side.
    * A row at depth d settles after d hops (its cur reaches the root,
    * whose link row has parent NULL).
    *
    * Dangling links need no pre-pass here (the doubling mode's id-set
    * left join — two full-table exchanges of setup): the state carries
    * `prev`, the ancestor one hop BELOW cur, and the hop join is a left
    * join — a lookup MISS means cur is a dangling id, so the true root
    * is `prev` (the record holding the dangling link is terminal) and
    * the miss hop un-counts itself from depth. A miss can only happen on
    * the hop that first reaches the dangling id, so the rule is exact at
    * any chain position.
    */
  private def resolveOneHop(linksRaw: DataFrame, maxIters: Int): DataFrame = {
    val p = linksRaw.sparkSession.sessionState.conf.numShufflePartitions
    val lut = Checkpoints.of(
      linksRaw.repartition(p, col("id")).sortWithinPartitions("id"))
    // settled rows inside a round pass the join unchanged (their cur is a
    // real root, present in lut) and leave the loop at the next boundary
    def hop(st: DataFrame, i: Int): DataFrame = {
      val (s, t) = (s"s$i", s"t$i")
      st.as(s).join(lut.as(t), col(s"$s.cur") === col(s"$t.id"), "left")
        .select(
          col(s"$s.id").as("id"),
          when(col(s"$s.settled"), col(s"$s.cur"))
            .when(col(s"$t.id").isNull, col(s"$s.prev"))
            .when(col(s"$t.parent").isNull, col(s"$s.cur"))
            .otherwise(col(s"$t.parent")).as("cur"),
          when(col(s"$s.settled") || col(s"$t.id").isNull, col(s"$s.prev"))
            .when(col(s"$t.parent").isNull, col(s"$s.prev"))
            .otherwise(col(s"$s.cur")).as("prev"),
          when(col(s"$s.settled"), col(s"$s.depth"))
            .when(col(s"$t.id").isNull, col(s"$s.depth") - 1L)
            .when(col(s"$t.parent").isNull, col(s"$s.depth"))
            .otherwise(col(s"$s.depth") + 1L).as("depth"),
          (col(s"$s.settled") || col(s"$t.id").isNull ||
            col(s"$t.parent").isNull).as("settled"))
    }
    val st0 = Checkpoints.of(lut.select(
      col("id"),
      coalesce(col("parent"), col("id")).as("cur"),
      col("id").as("prev"),
      when(col("parent").isNull, lit(0L)).otherwise(lit(1L)).as("depth"),
      col("parent").isNull.as("settled")))
    var settled = List(st0.filter(col("settled")).select("id", "cur", "depth"))
    var active = st0.filter(!col("settled"))
    var nActive = active.count()
    var iter = 0
    while (nActive > 0 && iter < maxIters) {
      val adv = Checkpoints.of(
        (0 until HopsPerRound).foldLeft(active)((st, i) => hop(st, i)))
      settled ::= adv.filter(col("settled")).select("id", "cur", "depth")
      active = adv.filter(!col("settled"))
      nActive = active.count()
      iter += 1
    }
    requireConverged(nActive, maxIters)
    settled.reduce(_ unionByName _)
      .select(col("id"), col("cur").as("chain_root"), col("depth"))
  }

  /** Pointer-doubling rounds: an active row looks up its ancestor's OWN
    * state row and jumps to that row's ancestor, so resolved distance
    * squares per round. Per round exactly ONE distributed job (the eager
    * checkpoint of the advanced rows, coalesced to a width sized by the
    * previous round's count) — settled rows are never re-checkpointed;
    * they accumulate as a union of already-materialized RDDs, bounded by
    * the logarithmic round count. */
  private def resolveDoubling(linksRaw: DataFrame, maxIters: Int,
      depthHint: Int): DataFrame = {
    val p = linksRaw.sparkSession.sessionState.conf.numShufflePartitions
    // null out dangling parents once, up front: a left join against the
    // id set — after this, parent IS NULL  ⇔  the record is a root.
    // (Doubling composes ancestor PATHS, so the one-hop mode's prev
    // device has no analogue here — a jump can pass a dangling id at any
    // interior position of the composed path.)
    val ids = linksRaw.select(col("id").as("pid"))
    val links = linksRaw.as("a")
      .join(ids.as("p"), col("a.parent") === col("p.pid"), "left")
      .select(col("a.id").as("id"),
        when(col("p.pid").isNull, lit(null).cast("long"))
          .otherwise(col("a.parent")).as("parent"))
    val st0 = Checkpoints.of(links.select(
      col("id"),
      coalesce(col("parent"), col("id")).as("cur"),
      when(col("parent").isNull, lit(0L)).otherwise(lit(1L)).as("depth"),
      col("parent").isNull.as("settled")))
    var settled = st0.filter(col("settled"))
    var active = st0.filter(!col("settled"))
    var nActive = active.count()
    var iter = 0
    while (nActive > 0 && iter < maxIters) {
      val lookup = settled.unionByName(active)
      // late rounds hold geometrically fewer rows: keep ~64k rows per
      // partition so the checkpoint job never schedules hundreds of
      // near-empty tasks for a residual tail
      val width = math.max(1L, math.min(p.toLong, nActive / 65536 + 1)).toInt
      val adv = Checkpoints.of(active.as("s")
        .join(lookup.as("t"), col("s.cur") === col("t.id"))
        .select(col("s.id").as("id"), col("t.cur").as("cur"),
          (col("s.depth") + col("t.depth")).as("depth"),
          col("t.settled").as("settled"))
        .coalesce(width))
      settled = settled.unionByName(adv.filter(col("settled")))
      active = adv.filter(!col("settled"))
      nActive = active.count()
      iter += 1
    }
    requireConverged(nActive, maxIters)
    settled.select(col("id"), col("cur").as("chain_root"), col("depth"))
  }

  /** Fail fast rather than emit silently-wrong intermediate ancestors:
    * rows can stay active only if the link data has a cycle (which the
    * dangling-parent nulling cannot detect) or depth exceeds what
    * maxIters rounds resolve. */
  private def requireConverged(nActive: Long, maxIters: Int): Unit =
    require(nActive == 0,
      s"chain resolution did not converge in $maxIters rounds — " +
        "cycle in link data or depth beyond the round budget")

  /** q46: chain resolution over a synthesized parent-link on orders.
    * The link rule is deterministic arithmetic both engines reproduce:
    * every 10th key roots a chain; one key per thousand carries a
    * dangling link (nonexistent parent → root by join-miss, the
    * predates-the-extract case); all others link to the previous key.
    * Oracle: DuckDB WITH RECURSIVE over the same links.
    */
  def q46ChainResolve(spark: SparkSession, dir: String): DataFrame = {
    val linksRaw = Tables.orders(spark, dir).select(
      col("o_orderkey").as("id"),
      when(pmod(col("o_orderkey"), lit(10)) === 0, lit(null).cast("long"))
        // negative sentinel: orderkeys are positive at every SF, so the
        // planted dangling parent can never resolve to a real key
        // (ADVICE r3: a fixed +10M offset collides once keys reach 10M)
        .when(pmod(col("o_orderkey"), lit(1000)) === 555,
          -col("o_orderkey") - 1L)
        .otherwise(col("o_orderkey") - 1L).as("parent"))
    resolveChains(linksRaw, depthHint = 16)
      .withColumn("chain_size", count(lit(1)).over(Window.partitionBy("chain_root")))
      .select(col("id").as("o_orderkey"), col("chain_root"), col("depth"), col("chain_size"))
      .orderBy("o_orderkey")
  }
}
