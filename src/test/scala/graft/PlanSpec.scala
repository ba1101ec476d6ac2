package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §5): filters and projections must
  * reach the parquet scans, dim joins must broadcast, and shuffle counts
  * must stay at the operator's theoretical minimum. These guard the
  * 100 TB posture — a regression that un-pushes a filter or turns a
  * broadcast into a shuffle join passes value-level checks but fails
  * here.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    executed(df).toString

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    executed(df).foreach { case _: Exchange => n += 1; case _ => () }
    n
  }

  test("orderAssembly family plans hash aggregation, never SortAggregate (r16)") {
    // the r16 finding: carrying a STRING through the union-aggregate's
    // buffer (max(status)) silently planned SortAggregate - two full
    // sorts of the orders+lineitem union, O(n log n) growing with the
    // corpus, hidden under the "one exchange" claim. The assembly now
    // pre-computes int predicates; any edit that reintroduces a
    // hash-unfriendly buffer type in this family goes red here rather
    // than resurfacing as a 0.6 s/10M-row bench regression.
    for (k <- Seq("q12_survival", "q50_snapshot_ages", "q53_competing_risks",
        "q56_docket_wait", "q63_fte_utilization", "q64_backlog_forecast")) {
      val p = planString(SparkEntry.queries(k)(spark, dir))
      assert(!p.contains("SortAggregate"),
        s"$k: SortAggregate reappeared in the assembly family:\n$p")
    }
  }

  // Tiny-grain waivers for the repo-wide SortAggregate ban (r17): both
  // are dim-table ROUNDTRIP checks whose min(string) witness aggregates
  // a ≤25-row frame read back from CSV/Derby — the sort is over the
  // dimension, not data, and recoding their witnesses would obscure
  // what the roundtrip is checking. Everything data-sized is banned.
  private val sortAggWaivers = Set("q37_csv_roundtrip", "q38_jdbc_roundtrip")

  test("no batch plan carries SortAggregate (r17 repo-wide sweep)") {
    // the r16 finding, generalized: a non-UnsafeRow-mutable aggregation
    // buffer (string / struct) silently demotes HashAggregate to
    // SortAggregate — per-partition sorts of the aggregate's input,
    // O(n log n) growing with the corpus, invisible to value
    // checks. r16 fixed the orderAssembly family; r17 fixed
    // q08/q73/t33. This walk pins the CLASS out: any new or edited
    // operator that re-grows one goes red here with its plan printed.
    // Static (pre-AQE) plans suffice — AQE never introduces or removes
    // aggregate strategies — so no query is executed.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (k, fn) if !k.startsWith("st") && !sortAggWaivers(k) =>
        k -> fn(spark, dir).queryExecution.executedPlan.toString
    }.filter(_._2.contains("SortAggregate"))
    assert(offenders.isEmpty,
      offenders.map { case (k, p) => s"$k:\n$p" }.mkString("\n\n"))
  }

  test("q01 pushes filters and prunes columns at the parquet scan") {
    val p = planString(operators.CoreQueries.q01CaseScan(spark, dir))
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("IsNotNull(o_totalprice)") || p.contains("GreaterThan(o_totalprice"),
      s"o_totalprice filter not pushed:\n$p")
    assert(p.contains("ReadSchema"), s"no ReadSchema in:\n$p")
  }

  test("q05 dim joins broadcast (no shuffle join for nation/region)") {
    val p = planString(operators.CoreQueries.q05DimJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
  }

  test("q07 sessionization uses a single shuffle for both windows + agg") {
    // one exchange for the user_id window partitioning; the groupBy reuses it
    // (plus the final orderBy range exchange)
    val n = countExchanges(operators.CoreQueries.q07Sessionize(spark, dir))
    assert(n <= 2, s"expected <=2 exchanges (window + final sort), got $n")
  }

  test("q19 as-of join is window-based (no cartesian/range join)") {
    val p = planString(operators.CoreQueries.q19AsofJoin(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian product in as-of join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in as-of join:\n$p")
    assert(p.contains("Window"), s"expected window-based as-of:\n$p")
  }

  test("d22 LSH join is an equi-join on band buckets") {
    val p = planString(operators.Dedup.d22MinhashLsh(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian in LSH join:\n$p")
  }

  test("q39 bucketed join has no exchange below the join") {
    val df = sources.Sources.q39BucketedJoin(spark, dir)
    val plan = executed(df)
    // the only exchanges allowed are for the post-join aggregation/sort;
    // neither side of the SortMergeJoin may be shuffled
    // AQE nests finished stages inside QueryStageExec (opaque to collect),
    // so assert on the rendered tree: scans read the bucketed layout, a
    // join exists, and neither join key is ever shuffle-partitioned —
    // broadcast at toy scale or bucket-aligned SMJ at real scale both pass
    val p = plan.toString
    assert(p.contains("Bucketed: true"), s"scans not bucketed:\n$p")
    assert(p.contains("Join"), s"no join node found:\n$p")
    assert(!p.matches("(?s).*Exchange hashpartitioning\\((o_orderkey|l_orderkey).*"),
      s"bucketed join side was shuffle-exchanged:\n$p")
  }

  test("s27 multi-probe stays an equi-join with codegen'd bucket projection") {
    val df = operators.Similarity.s27AnnLsh(spark, dir)
    val p = planString(df)
    // candidate generation must remain a hash equi-join on probe=bucket
    // (the multi-probe explode must not degrade it to nested-loop)
    assert(!p.contains("CartesianProduct"), s"cartesian in multi-probe join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in multi-probe join:\n$p")
    // bucket projection runs inside whole-stage codegen (r1 criterion)
    assert(p.contains("*("), s"no codegen spans:\n$p")
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_hyperplane_bucket"),
      s"native bucket expression missing:\n$analyzed")
  }

  test("q50 grid range join is an equi-join (no cartesian/nested-loop)") {
    val p = planString(operators.RangeJoin.q50SnapshotAges(spark, dir))
    // the whole point of the grid bucketization: the interval x point
    // join must hash on the cell key, never theta-join
    assert(!p.contains("CartesianProduct"), s"cartesian in grid range join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in grid range join:\n$p")
  }

  test("q52 case aggregation shares the sessionization shuffle") {
    // the collect_list case-grain agg must reuse the user_id exchange the
    // session windows already created; only the trace-grain work (tiny)
    // and the final sort may add exchanges
    val n = countExchanges(operators.EventLog.q52Traces(spark, dir))
    assert(n <= 4, s"expected <=4 exchanges (user window + trace agg + rank + sort), got $n")
  }

  test("q53 risk-set windows run on the pre-aggregated age grid only") {
    val df = operators.Survival.q53CompetingRisks(spark, dir)
    val plan = executed(df).toString
    // the full outer grid join must stay an equi-join and the window
    // must sit above aggregates (grid grain), not above raw subjects
    assert(!plan.contains("CartesianProduct"), s"cartesian in grid join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop in grid join:\n$plan")
    assert(plan.contains("HashAggregate"), s"no pre-aggregation below windows:\n$plan")
    // r11 one-exchange subject assembly: orders and lineitem stack into
    // ONE union-aggregate on the order key — no join operator may exist
    // at the subject grain (the prior shape's aggregate + SHUFFLE_HASH
    // join cost two corpus exchanges and a 1.5M-entry hash table)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"subject assembly regressed to a join:\n$plan")
    assert(plan.contains("Union"), s"union-aggregate assembly missing:\n$plan")
  }

  test("q10 quantiles read off the day-grain histogram; no percentile collection") {
    val df = operators.CoreQueries.q10Quantiles(spark, dir)
    val plan = executed(df).toString
    // Spark's percentile() is a TypedImperativeAggregate that collects
    // every group value into one buffer — the row-domain collection a
    // 100 TB group cannot hold (VERDICT r10 #2). q10 must read its
    // order statistics off the bounded (nation × day) histogram.
    assert(!plan.contains("percentile"), s"percentile aggregate leaked back:\n$plan")
    assert(!plan.contains("collect_list"), s"value collection leaked in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("q51 exact side refines on value-grain counts; no row-domain collection") {
    val df = operators.Sketches.q51QuantileSketch(spark, dir)
    val plan = executed(df).toString
    // ADVICE r10: the needed-bin rows must never collect into one
    // buffer (sort_array(collect_list) grew O(corpus/|bins|)); the
    // refinement is a per-(flag,bin,value) COUNT — map-side combinable,
    // bounded output on a quantized value domain.
    assert(!plan.contains("collect_list"), s"bin row collection leaked back:\n$plan")
    assert(!plan.contains("percentile"), s"percentile aggregate in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("q54 candidate join is a blocked equi-join with array sets riding along") {
    val p = planString(operators.Linking.q54MergeDisambiguation(spark, dir))
    // per-entity blocking must remain an equi-join on (cust, yr-1) —
    // the set intersection must evaluate in the projection, never as a
    // join condition that degrades to nested-loop
    assert(!p.contains("CartesianProduct"), s"cartesian in candidate join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in candidate join:\n$p")
  }

  test("p56 split is shuffle-free except the presentation sort") {
    val df = operators.Pipeline.p56StratifiedSplit(spark, dir)
    val plan = executed(df)
    val p = plan.toString
    // the rate join must broadcast (4-row table) and assignment must be
    // a map-side projection: no hash-partition exchange anywhere
    assert(p.contains("BroadcastHashJoin"), s"rate join did not broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash exchange in a zero-shuffle split:\n$p")
  }

  test("d27 near-dup check is an equi-join, never cartesian") {
    val p = planString(operators.Dedup.d27IncrementalDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian in d27:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in d27:\n$p")
  }

  test("t32 benchmark probe is a broadcast join; corpus side never shuffles pre-count") {
    val p = planString(operators.TextAnalysis.t32Contamination(spark, dir))
    // the eval-set shingle index must be the broadcast build side — a
    // shuffle join here would re-partition the whole corpus by shingle
    assert(p.contains("BroadcastHashJoin"), s"benchmark probe did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus re-shuffled for the probe:\n$p")
  }

  test("t34 repetition signals are a pure projection (no exchange before the sort)") {
    val df = operators.TextAnalysis.t34Repetition(spark, dir)
    val plan = executed(df).toString
    // every signal is within-document: the only exchange allowed is the
    // final presentation sort's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"hash exchange in a per-row operator:\n$plan")
    assert(!plan.contains("HashAggregate"), s"aggregation in a per-row operator:\n$plan")
  }

  test("p59 shard shuffle is one hash exchange + in-partition sort") {
    val df = operators.Pipeline.p59ShardShuffle(spark, dir)
    val n = countExchanges(df)
    // shard hash partitioning + final presentation sort — the write path
    // (repartition + sortWithinPartitions) pays exactly the first
    assert(n <= 2, s"expected <=2 exchanges (shard partition + sort), got $n")
  }

  test("d28 cell dedup is an equi-join on cells, never cartesian") {
    val p = planString(operators.Dedup.d28EmbedCellDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian in cell dedup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in cell dedup:\n$p")
  }

  test("t33 PII scrub is projection + one aggregation, no join") {
    val p = planString(operators.TextAnalysis.t33PiiScrub(spark, dir))
    assert(!p.contains("Join"), s"unexpected join in a per-row scrub:\n$p")
    // regex machinery must stay inside whole-stage codegen
    assert(p.contains("*("), s"no codegen spans:\n$p")
  }

  test("p60 top-K is TakeOrdered (never a global sort of the vocabulary)") {
    val p = planString(operators.Pipeline.p60VocabBuild(spark, dir))
    // per-partition heaps + driver merge; the rank/coverage windows then
    // see exactly K rows — a rangepartitioning sort of the full token
    // grain here would be the 100 TB failure mode
    assert(p.contains("TakeOrderedAndProject"), s"top-K not TakeOrdered:\n$p")
    // the token total is Σ n_occ over the SAME tf aggregate the top-K
    // branch consumes (reused exchange) — one corpus scan, not two
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
  }

  test("t35 df join broadcasts and the per-doc top-k pushes into the shuffle") {
    val p = planString(operators.TextAnalysis.t35Keywords(spark, dir))
    // document frequency is vocabulary-sized — it must come back as a
    // broadcast, never re-shuffling the (doc, token) grain by token
    assert(p.contains("BroadcastHashJoin"), s"df join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"(doc, token) grain re-shuffled:\n$p")
    // rnk <= K must become WindowGroupLimit so only K rows/doc survive
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed down:\n$p")
    // r12: tf completes per document inside graft_token_counts —
    // occurrence rows never exist; the ONE doc_id-keyed exchange
    // (reused by probe + df branches, satisfying the rank window via
    // the subset rule) carries (doc, distinct-token, count) rows
    assert(p.contains("graft_token_counts"), s"tf kernel missing:\n$p")
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
    assert(p.contains("ReusedExchange"), s"df branch re-ran the kernel scan:\n$p")
    // a (doc, token)-keyed exchange means the top-k re-shuffled the grain
    assert("hashpartitioning\\(doc_id#\\d+, token".r.findFirstIn(p).isEmpty,
      s"(doc, token)-keyed corpus exchange reappeared:\n$p")
  }

  test("s30 assignments are broadcast projections; no N·K explode, no cartesian") {
    val p = planString(operators.Similarity.s30Kmeans(spark, dir))
    // each Lloyd assignment crosses the corpus with ONE packed 1-row
    // centroid array — the argmin runs inside the row, so the only
    // acceptable join shape is a broadcast nested-loop of a 1-row side;
    // a CartesianProduct or a per-(point,centroid) exchange would be
    // the 100 TB failure mode
    assert(!p.contains("CartesianProduct"), s"cartesian in kmeans:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroid row not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"point grain shuffled for a join:\n$p")
  }

  test("s31 silhouette stays on the broadcast-projection shape (no N·K explode)") {
    val p = planString(operators.Similarity.s31Silhouette(spark, dir))
    // b(i) must come from the same in-row argmin over the broadcast
    // model as the assignment — never a per-(point,centroid) join
    assert(!p.contains("CartesianProduct"), s"cartesian in silhouette:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"model row not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"point grain shuffled for a join:\n$p")
  }

  test("p62 per-cluster cap pushes into the shuffle as WindowGroupLimit") {
    val p = planString(operators.Pipeline.p62BalancedSample(spark, dir))
    // rnk <= cap must prune to <=cap rows per cluster BEFORE the
    // exchange — at 100 TB the output is K·cap rows regardless of N
    assert(p.contains("WindowGroupLimit"), s"cap not pushed down:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in kmeans:\n$p")
  }

  test("t36 lm: kernel pre-aggregate, broadcast model, no corpus exchange") {
    val p = planString(operators.TextAnalysis.t36LmScore(spark, dir))
    // the per-doc bigram pre-aggregate is the graft_bigram_counts
    // kernel (one pass per doc — the r9 slice/zip/explode/groupBy form
    // exchanged the corpus-sized (doc,w1,w2) grain and ran two window
    // sort+exchanges over it, 4.6 s of t36's 5.6 s at sf1)
    assert(p.contains("graft_bigram_counts"),
      s"bigram pre-aggregate not the native kernel:\n$p")
    // the score pass is the graft_lm_doc_score kernel projection (r13):
    // no second explode, no score-side join probe, no per-doc re-group
    assert(p.contains("graft_lm_doc_score"),
      s"score pass not the native kernel:\n$p")
    assert(!p.contains("Window"), s"model totals re-grew a window pass:\n$p")
    // the model attaches by BROADCAST (CCNet's ship-the-LM shape); any
    // sort-merge join here means a corpus-sized grain is shuffling
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
    // two corpus scans (train pass + score pass — measured cheaper than
    // materializing the string-bearing pre-aggregate), never more
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans <= 2, s"expected ≤2 corpus scans, got $scans:\n$p")
  }

  test("m35 pair generation is join-free: one scan, grain agg, bounded explode") {
    val p = planString(operators.Multimodal.m35PayloadChunkdup(spark, dir))
    // pairs come from a per-(idx,fp)-group explode bounded by the df
    // cap — no self-join, no payload×payload anything
    assert(!p.contains("Join"), s"pair generation joined:\n$p")
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
    // fingerprints must be computed by the codegen'd expression BEFORE
    // the posting explode — exploded rows carry int64s, not payloads
    assert(p.contains("graft_chunk_fps"), s"chunk fps not the native expression:\n$p")
  }

  test("p63 cut is source-parallel: offsets broadcast, big window on (source,bucket)") {
    val p = planString(operators.Pipeline.p63TokenBudget(spark, dir))
    // the S·B offset/budget sides must come back as broadcasts — a
    // shuffle join here would re-partition the corpus twice
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus re-shuffled for the offset join:\n$p")
    // the per-doc running sum must partition by (source, bucket) —
    // a window keyed by source alone is ONE task per source at 100 TB
    assert(p.contains("windowspecdefinition(source"), s"no window:\n$p")
    assert(p.contains("windowspecdefinition(source#") &&
      p.contains(", bucket#"), s"big window not bucket-parallel:\n$p")
    // bucket totals derive from the window output (max of the running
    // sum), so both branches reuse ONE corpus scan/exchange
    assert(p.contains("ReusedExchange"), s"window subtree not reused:\n$p")
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
  }

  test("q43 week filter prunes partitions at listing time") {
    val p = planString(sources.Sources.q43PartitionPrune(spark, dir))
    // the filter must plan as a PartitionFilter on the directory column
    // (pruning before any row is read), not a post-scan predicate
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"),
      s"no partition filter on event_date:\n$p")
    assert(!p.matches("(?s).*PushedFilters: \\[[^\\]]*event_date[^\\]]*\\].*"),
      s"event_date degraded to a row-group filter:\n$p")
  }

  test("d29 span detection is joinless aggregation with native posting hashes") {
    val df = operators.Dedup.d29RepeatedSpans(spark, dir)
    val p = planString(df)
    // the cross-doc comparison must collapse into group-bys on the span
    // hash — any join here means the suffix-array shape leaked in
    assert(!p.contains("Join"), s"unexpected join in span detection:\n$p")
    assert(p.contains("*("), s"no codegen spans:\n$p")
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_window_hashes"),
      s"native window-hash expression missing:\n$analyzed")
  }

  test("d30 probe is an equi-join fed by ONE scan through a reused exchange") {
    val df = operators.Dedup.d30SpanScore(spark, dir)
    val p = planString(df)
    assert(!p.contains("CartesianProduct"), s"cartesian in span probe:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in span probe:\n$p")
    // the (span, doc) grain feeds the index build AND the probe — the
    // corpus must be scanned/exploded once (the t35 ReuseExchange contract)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
  }

  test("p66 BPE learn: one corpus word-count stage feeds the single-task loop") {
    val df = operators.Pipeline.p66BpeMerges(spark, dir)
    val p = planString(df)
    // the ONLY corpus-sized stage is the word-count aggregation (one
    // scan); the K sequential merge rounds run inside one task over the
    // collapsed vocabulary (r13 — the unrolled K-argmax-jobs form paid
    // 1.74 s of job floors at sf1 for 3 merges and capped K at plan
    // size; the in-task loop reads 0.98 s and frees K)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected exactly 1 corpus scan, got $scans:\n$p")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"learn loop not the single-task map:\n$p")
    // no join anywhere: the learn loop replaces the per-round
    // argmax-broadcast-crossJoin machinery
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(!p.contains("TakeOrdered"), s"per-round argmax job resurfaced:\n$p")
  }

  test("s34 SQ scoring stays codegen'd; corpus meets only broadcast relations") {
    val df = operators.Similarity.s34SqAnn(spark, dir)
    df.collect()
    // the reconstruction+scoring projection must use the native argmin
    // expression (analyzed plan), never an interpreted fold per corpus row
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_kmeans_argmin"),
      s"native argmin missing from scoring:\n$analyzed")
    val p = planString(df)
    // the (lo, hi) model and the query set broadcast; the corpus is never
    // re-shuffled for either (the family's one corpus-grain exchange is
    // the per-query top-k window)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"model/query set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"non-broadcast product:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus re-shuffled for a broadcast-size side:\n$p")
  }

  test("q64 forecast: one rate aggregation, recurrence in-expression (no per-month jobs)") {
    val df = operators.Docket.q64BacklogForecast(spark, dir)
    val p = planString(df)
    // the corpus work is the single rate aggregate over orders⋈lineitem;
    // the 24-step recurrence must live inside ONE projection (the
    // aggregate HOF fold + posexplode), never as month-wise joins/jobs
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 2, s"expected 2 scans (orders + lineitem), got $scans:\n$p")
    assert(p.contains("Generate"), s"fold results not exploded in-plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unexpected join in a fold projection:\n$p")
    // r11: subjects assemble via the shared union-aggregate
    // (Tables.orderAssembly) — no join operator at the subject grain
    assert(p.contains("Union"), s"union-aggregate assembly missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"subject assembly regressed to a join:\n$p")
  }

  test("q63 utilization: union-aggregate assembly, reused pair exchange, no cartesian") {
    val df = operators.RangeJoin.q63FteUtilization(spark, dir)
    val p = planString(df)
    // exactly the two input tables are scanned; the weighted-pair grain
    // feeds BOTH the overlap explode and the decisions rollup through one
    // reused exchange (q50's completion-join + pair-collapse shape)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 2, s"expected 2 scans (orders + lineitem), got $scans:\n$p")
    // r11: intervals assemble via the shared union-aggregate
    // (Tables.orderAssembly) — no join operator at the subject grain
    assert(p.contains("Union"), s"union-aggregate assembly missing:\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"assembly regressed to a join:\n$p")
    assert(p.contains("ReusedExchange"), s"pair grain recomputed per branch:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"months×intervals must stay an equi-join, not a theta product:\n$p")
    assert(!p.contains("SortMergeJoin"), s"month-grain joins should broadcast:\n$p")
  }

  test("m36 assembly joins are equi-joins; the embedding side broadcasts") {
    val df = operators.Multimodal.m36SampleAssembly(spark, dir)
    val p = planString(df)
    // features project out BEFORE the joins, so the joined columns are
    // ids + lengths — and the small embedding table must broadcast, not
    // re-shuffle the document grain (at toy SF the media side broadcasts
    // too; at scale it SMJs — both are fine, a cartesian never is)
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the assembly:\n$p")
  }

  test("t39 drift monitor pays one corpus scan; both union branches reuse it") {
    val df = operators.TextAnalysis.t39Drift(spark, dir)
    val p = planString(df)
    // the per-value rows and the __TOTAL__ TVD rows both derive from the
    // same (dim, value) aggregation — the corpus scan + stack explode +
    // rollup must be computed once (the q55/d30 ReuseExchange contract);
    // a second scan would double the only data-sized stage
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
    assert(p.contains("ReusedExchange"), s"drift grain not reused:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"unexpected join in a join-free rollup:\n$p")
  }

  test("q55 reference model and classification share one sessionization (checkpointed traces)") {
    val p = planString(operators.EventLog.q55Conformance(spark, dir))
    // the top-K reference model and the per-case classification both
    // derive from caseTraces — r12: the trace table is CHECKPOINTED
    // (one eager sessionization pass), so the final plan must contain
    // NO parquet re-scan of events at all; every consumer reads the
    // materialized |cases|-grain RDD. (Pre-r12 this pinned a
    // ReusedExchange, which only covered two of the three consumers —
    // the ref/refPfx pair still re-ran the trace aggregation.)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 0, s"expected 0 events scans (checkpointed traces), got $scans:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"checkpointed trace table missing:\n$p")
    // the K-row model joins must broadcast, never shuffle the case grain
    assert(p.contains("BroadcastHashJoin"), s"reference model not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"case grain re-shuffled for the model join:\n$p")
  }

  test("q62 edge window rides the sessionization exchange (one events scan)") {
    val df = operators.EventLog.q62Transitions(spark, dir)
    val p = planString(df)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$p")
    // the (user_id, session_num) lead/lag window must be satisfied by the
    // sessionization's user_id hash partitioning (subset of its keys) —
    // only a local sort may sit between the two window passes, never a
    // second event-grain exchange — and the per-case edge pre-aggregate
    // rides the SAME partitioning (r8: replaced the countDistinct
    // Expand + its extra exchange). Budget: user window + (from,to) agg
    // + from_act share window + presentation sort.
    val n = countExchanges(df)
    assert(n <= 4, s"expected <=4 exchanges, got $n:\n$p")
    assert(!p.contains("Expand"), s"count-distinct expand reappeared:\n$p")
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllMatchIn(p).length
    assert(hashEx == 1, s"expected exactly 1 user-grain exchange, got $hashEx:\n$p")
  }

  test("d35 verifier attaches texts by equi-join; no nested-loop, no cartesian") {
    val p = planString(operators.Dedup.d35EditVerify(spark, dir))
    // the pair list joins the corpus projection on doc ids — hash joins
    // only; a nested-loop here would mean the candidate bound was lost
    assert(!p.contains("CartesianProduct"), s"cartesian in the verifier:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
    assert(p.contains("levenshtein"), s"DP verifier missing from plan:\n$p")
  }

  test("p65 card is one corpus scan, aggregation-only (no joins, no windows)") {
    val df = operators.Pipeline.p65DatasetCard(spark, dir)
    val p = planString(df)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"join in a pure rollup:\n$p")
    assert(!p.contains("Window"), s"window in a pure rollup:\n$p")
  }

  test("s32 ADC scores via broadcast lookups; no shuffle join touches the corpus") {
    val p = planString(operators.Similarity.s32PqAdc(spark, dir))
    // encoding and scoring are projections over broadcast rows — the
    // codegen'd argmin primitive must appear (no interpreted fallback on
    // the corpus path) and the corpus must never be shuffled into a join
    assert(p.contains("graft_kmeans_argmin"), s"argmin primitive missing:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"model/query tables not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled into a join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("s33 candidates come from the cell equi-join; scoring never touches vectors") {
    val p = planString(operators.Similarity.s33IvfPq(spark, dir))
    // both composed mechanisms must appear: the cell primitive (IVF
    // candidate bound) and the argmin primitive (PQ encoding)
    assert(p.contains("graft_ivf_cells"), s"cell primitive missing:\n$p")
    assert(p.contains("graft_kmeans_argmin"), s"PQ argmin missing:\n$p")
    // candidate generation is an equi-join on cell — a cartesian here
    // would mean the IVF bound was lost and the corpus is scored whole
    assert(!p.contains("CartesianProduct"), s"candidate bound lost:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled into a join:\n$p")
  }

  test("p61 chunking is a pure projection (no exchange before the sort)") {
    val df = operators.Pipeline.p61ChunkOverlap(spark, dir)
    val plan = executed(df).toString
    // chunk geometry is per-row arithmetic + a bounded explode: the only
    // exchange allowed is the final presentation sort's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"hash exchange in a per-row operator:\n$plan")
    assert(!plan.contains("HashAggregate"), s"aggregation in a per-row operator:\n$plan")
    assert(!plan.contains("Join"), s"join in a per-row operator:\n$plan")
  }

  test("q55 reference model broadcasts; no shuffle join against the case grain") {
    val p = planString(operators.EventLog.q55Conformance(spark, dir))
    // the K-row variant set and its prefix set must both broadcast —
    // a shuffle join would re-partition every case by trace string
    assert(p.contains("BroadcastHashJoin"), s"reference model did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"case grain re-shuffled for the model:\n$p")
  }

  test("q56 docket model: one month-grain window pass, rates broadcast") {
    val df = operators.Docket.q56DocketWait(spark, dir)
    // all five cumulative columns (counts + histogram) share ONE window
    // spec, so exactly one Window node may survive optimization; a second
    // would mean the month grain is re-sorted per column (counted on the
    // optimized logical plan — AQE hides finished physical stages)
    var windows = 0
    df.queryExecution.optimizedPlan.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.Window => windows += 1
      case _ => ()
    }
    assert(windows == 1, s"expected 1 Window, got $windows:\n${df.queryExecution.optimizedPlan}")
    val p = planString(df)
    // the 1-row rate relation must broadcast to the cohort grain — a
    // shuffle here would re-partition the docket months for one scalar
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"rates not broadcast:\n$p")
    // the unrolled fixpoint must stay pure projection: no exchange may sit
    // between the window and the final presentation sort
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("d30 hot-span probe survives a 30%-hot corpus via the deterministic salt") {
    // the documented 100 TB defense made visible: a license span shared
    // by 30% of the corpus funnels every posting of ONE span hash toward
    // one shuffle partition. AQE's skew-join split cannot fire on this
    // shape (the index side aggregates above its shuffle — verified in
    // round 7 with skew thresholds scaled to toy size: OptimizeSkewedJoin
    // requires both join inputs to be direct shuffle reads), so the
    // defense is the explicit pmod salt and this test pins it.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val license = (1 to operators.Dedup.SpanTokens).map(i => s"license$i").mkString(" ")
    val docs = (1 to 4000).map { i =>
      if (i % 10 < 3) {
        // license (8 tokens) + 2 unique: 3 windows, 1 repeated → 3333 pm
        (i.toLong, s"$license w${i}_a w${i}_b")
      } else {
        (i.toLong, (1 to operators.Dedup.SpanTokens).map(j => s"w${i}_$j").mkString(" "))
      }
    }.toDF("doc_id", "text")
    val df = operators.Dedup.d30SpanScoreCore(docs)
    val rows = df.collect()
    // semantics survive the salt: every license-carrying doc is flagged
    // against the hot span, clean docs score 0
    val flagged = rows.filter(_.getAs[Int]("span_flagged") == 1).map(_.getLong(0)).toSet
    assert(flagged === (1 to 4000).filter(_ % 10 < 3).map(_.toLong).toSet,
      "hot-span docs not exactly the flagged set")
    assert(rows.filter(r => r.getLong(0) % 10 >= 3).forall(_.getLong(3) == 0L),
      "clean docs must score 0")
    // plan evidence: the probe join keys carry the salt, so the hot hash
    // hashes to SpanProbeSalt distinct partitions instead of one
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin [h#") || p.contains("ShuffledHashJoin [h#"),
      s"probe join missing:\n$p")
    assert(p.contains("salt"), s"salt not in the probe join keys:\n$p")
    // and the postings side must spread the hot span across shuffle keys:
    // the hot hash (held by 1200 docs) now carries SpanProbeSalt distinct
    // (h, salt) join keys instead of one
    import org.apache.spark.sql.functions._
    val spread = operators.Dedup.spanPostingsCore(docs)
      .withColumn("salt", pmod(col("doc_id"), lit(operators.Dedup.SpanProbeSalt.toLong)))
      .groupBy("h").agg(countDistinct(col("salt")).as("n_keys"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 1000)
      .collect()
    assert(spread.length == 1 &&
      spread.head.getLong(1) == operators.Dedup.SpanProbeSalt.toLong,
      s"hot span not spread over the full salt width: ${spread.mkString(",")}")
  }

  test("d32 cut probe is a salted equi-join; rebuild pays one doc exchange") {
    val df = operators.Dedup.d32SpanCut(spark, dir)
    val p = planString(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cut probe degraded to a product join:\n$p")
    // the hot-chunk defense is the d30 salt — the probe join must key on it
    assert(p.contains("salt"), s"salt not in the cut-probe join keys:\n$p")
  }

  test("m32/m34 decode paths keep partition parallelism (no single-partition funnel)") {
    // the "real plumbing" claim for the stubbed codecs: the batch decode
    // must run on the scan's partitioning — a stray
    // repartition(1)/coalesce(1) would serialize 100 TB of media through
    // one task and no value-level check would notice
    for ((name, df) <- Seq(
        "m32" -> operators.Multimodal.m32Multimodal(spark, dir),
        "m34" -> operators.Multimodal.m34PayloadResize(spark, dir))) {
      val p = planString(df)
      // nothing below the decode may move data: the only Exchange allowed
      // in the whole plan is the final presentation sort's range exchange
      assert(!p.contains("Exchange SinglePartition"),
        s"$name: decode funneled through one partition:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name: unexpected shuffle around the decode stage:\n$p")
    }
    // m34 is a genuine codec boundary: the binary→binary resize keeps the
    // typed mapPartitions batch shape (one decoder instance per partition)
    val m34 = planString(operators.Multimodal.m34PayloadResize(spark, dir))
    assert(m34.contains("MapPartitions"), s"m34: no MapPartitions stage:\n$m34")
    // m32's byte-stat features need no decoder (r16): the kernel is pure
    // codegen'd built-ins (md5/length/substring) fused onto the scan — a
    // reintroduced serialization boundary is the 11.4x floor coming back
    val m32 = planString(operators.Multimodal.m32Multimodal(spark, dir))
    assert(!m32.contains("MapPartitions") && !m32.contains("DeserializeToObject"),
      s"m32: serialization boundary reintroduced in the feature kernel:\n$m32")
    assert(m32.contains("*("), s"m32: feature projection not codegen'd:\n$m32")
  }

  test("q57 reconciliation: range-partitioned JDBC scan, equi full-outer join") {
    val df = graft.sources.Sources.q57Reconciliation(spark, dir)
    val p = planString(df)
    // the Caseflow side must arrive through a PARTITIONED JDBC scan —
    // an unpartitioned one serializes the whole extract through one task
    assert(p.contains("numPartitions=4"), s"JDBC scan not range-partitioned:\n$p")
    // and the reconciliation must stay a key equi-join
    assert(p.contains("FullOuter") || p.contains("SortMergeJoin"),
      s"no full-outer merge join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"reconciliation degraded to a product join:\n$p")
  }

  test("s26 whole-stage codegen covers the dot-product projection") {
    val df = operators.Similarity.s26AnnTopk(spark, dir)
    val p = planString(df)
    // codegen spans present ("*(n)" prefixes) and the top-k is pushed into
    // the shuffle via WindowGroupLimit
    assert(p.contains("*("), s"no codegen spans:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed down:\n$p")
    // graft_dot resolves as a native expression (not a UDF) in the analyzed plan
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_dot"), s"graft_dot missing:\n$analyzed")
  }

  test("q58 injects a bloom filter into the fact scan under shuffle-join planning") {
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val opt = operators.CoreQueries.q58Plan(spark, dir)
        .queryExecution.optimizedPlan.toString
      // the dim side builds the bloom as a scalar subquery...
      assert(opt.contains("bloom_filter_agg"), s"no bloom_filter_agg:\n$opt")
      // ...and the fact scan is pre-filtered through it
      assert(opt.contains("might_contain"), s"no might_contain on the fact side:\n$opt")
    } finally prev.foreach { case (k, vo) =>
      vo.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("p64 threshold join broadcasts; admission never sort-merges the corpus") {
    val p = planString(operators.Pipeline.p64TemperatureMix(spark, dir))
    // the |S|-row keep-rate table must be the broadcast side — a
    // SortMergeJoin would re-shuffle every data row by source
    assert(p.contains("BroadcastHashJoin"), s"threshold join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus re-shuffled for admission:\n$p")
  }

  test("q59 SCD2 build runs both window passes on one user_id exchange") {
    val df = operators.CoreQueries.q59ScdHistory(spark, dir)
    val p = planString(df)
    // run collapse preserves the (ts, event_id) sort, so versioning and
    // lead must NOT re-shuffle: one hash exchange + the presentation range
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n$p")
    assert(!p.contains("Join"), s"SCD2 build must be join-free:\n$p")
  }

  test("d33 winnowing is joinless and reuses the doc_id window exchange") {
    val df = operators.Dedup.d33Winnow(spark, dir)
    val p = planString(df)
    assert(!p.contains("Join"), s"winnowing must not join:\n$p")
    // one exchange for the doc_id window; the distinct + per-doc rollup
    // reuse that partitioning (doc_id ⊆ every grouping key); plus the
    // presentation orderBy's range exchange
    val n = countExchanges(df)
    assert(n <= 2, s"expected ≤2 exchanges (window + presentation sort), got $n:\n$p")
  }

  test("d34 semdedup: candidate generation is a cid equi-join, model broadcast") {
    // pin the PAIR stage, not the final frame: connectedComponents'
    // localCheckpoint truncates lineage, so the cid join is invisible in
    // the final executed plan by construction
    val pairs = operators.Dedup.d34Pairs(spark, dir)
    val p = planString(pairs)
    // the k-means model rides the same 1-row packed broadcast as s30 —
    // never a shuffle join against the corpus grain
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"kmeans model not broadcast:\n$p")
    // within-cluster pair generation must key on cid — a cartesian over
    // the corpus is the SemDeDup anti-pattern the clustering exists to
    // prevent (the only allowed nested-loop join is the 1-row model;
    // BHJ/SMJ/SHJ are all acceptable physical forms of the equi-join —
    // AQE broadcasts the small side at toy SF)
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cid#\\d+".r.findFirstIn(p).nonEmpty,
      s"pair join not keyed on cid:\n$p")
    // the final frame must stay cartesian-free too
    val pf = planString(operators.Dedup.d34Semdedup(spark, dir))
    assert(!pf.contains("CartesianProduct"), s"unexpected cartesian in final plan:\n$pf")
  }

  test("s35 filtered ANN: label IN-list is pushed to the corpus parquet scan") {
    val df = operators.Similarity.s35FilteredAnn(spark, dir)
    val p = df.queryExecution.toString
    // the pre-filter must reach the scan as a row-group pushdown, not
    // evaluate post-read (the whole point of the pre-filter strategy)
    assert(p.contains("PushedFilters") && p.contains("In(label"),
      s"label IN-list not pushed to scan:\n${p.take(4000)}")
    val pf = planString(df)
    assert(!pf.contains("CartesianProduct"), s"unexpected cartesian:\n$pf")
  }

  test("s36 hash-vector retrieval broadcasts the query side; kernel stays in codegen") {
    val df = operators.Similarity.s36HashVectors(spark, dir)
    // join strategy read off the initial physical plan — the AQE final
    // string fragments into per-stage trees and hides the join node
    val p = df.queryExecution.sparkPlan.toString
    // the bounded query set broadcasts (non-equi <> join → BNLJ with the
    // small side built); the corpus must stream, never broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the kernel evaluates ONCE per side (query + corpus projections).
    // A `norm > 0` filter would be predicate-pushed into the scan with
    // the kernel inlined into the filter expression — 3 evaluations per
    // corpus row (measured; hence the nullif null-score design)
    val kernelEvals = "graft_hash_vec".r.findAllIn(p).size
    assert(kernelEvals == 2, s"kernel inlined $kernelEvals times (expected 2):\n$p")
    // the whole chain stays inside codegen spans
    val exec = planString(df)
    assert(exec.contains("*("), s"no codegen span:\n$exec")
  }

  test("d37 bloom probe broadcasts the filter relation; no sort-merge join") {
    val p = planString(operators.Dedup.d37BloomAdmit(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("p68 encode: merge table broadcast once; encode is a kernel projection") {
    val df = operators.Pipeline.p68BpeEncode(spark, dir)
    val p = planString(df)
    // the merge table arrives as ONE broadcast 1-row relation (r13 —
    // the K-left-joins-+ -corpus-regexp form is gone), never a shuffle
    // join against the corpus
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"merge table not broadcast:\n$p")
    assert(p.contains("graft_bpe_apply"), s"encode not the native kernel:\n$p")
    // two corpus scans: the learn side's word count + the encode pass
    // (the learn loop no longer hides its scan behind a checkpoint)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"expected 2 corpus scans (learn + encode), got $scans:\n$p")
  }

  test("q65 approx agg is one scan, one aggregate, no join") {
    val df = operators.CoreQueries.q65ApproxAgg(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
  }

  test("q68 gap fill: the LOCF window runs on the aggregated grain, never raw events") {
    val df = operators.CoreQueries.q68GapFill(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    // exactly one scan of the events parquet feeds the hourly aggregate;
    // the spine join and window sit above aggregated rows
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 3, s"raw-grain re-scans in:\n$p") // agg + bounds + spine types share lineage
    // the Window must consume an Aggregate, not the raw scan: every
    // window in the plan sits above a join of aggregated inputs
    assert(p.contains("Window"), s"no window:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q69 IVM merge: state exchanges ride the key grain; bounds scalars broadcast") {
    val df = operators.Sketches.q69IncrRollup(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"tiny grain must not sort-merge:\n$p")
  }

  test("q66 KMV sketches are TakeOrdered, side scalars broadcast, no cartesian") {
    val df = operators.Sketches.q66KmvOverlap(spark, dir)
    val p = planString(df)
    // each K-least selection must be per-partition heaps + merge, never
    // a global Sort behind a shuffle
    assert(p.contains("TakeOrderedAndProject"), s"KMV selection not TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scalar combine must broadcast, not cartesian:\n$p")
  }

  test("t41 BM25 probes query-term postings via broadcast; corpus never builds") {
    val df = operators.TextAnalysis.t41Bm25(spark, dir)
    val p = planString(df)
    // candidate generation = postings of query terms only: the query
    // term set rides a broadcast 1-row cross join INTO the graft_tf_in
    // kernel, which emits pre-counted (token, tf) for query terms only
    // (r11 — the kernel form of the r9 literal inverted-index probe);
    // a sort-merge join anywhere here would shuffle a corpus-sized
    // grain, and a per-occurrence HashAggregate below the df window
    // would mean the kernel's pre-count regressed to an explode
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast query-bag join:\n$p")
    assert(p.contains("graft_tf_in"), s"expected the tf_in postings kernel:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
    // query terms + corpus stats ride broadcast loop joins, never a cartesian
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // scans: ONE full-width corpus scan (the explode), the 1-row stats
    // scan, and two doc_id<10 row-group-pruned query-bag scans; df rides
    // a window over the probe itself, so no second corpus-tf branch
    // exists to re-scan
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans <= 4, s"expected ≤4 scans, got $scans:\n$p")
    val pruned = "LessThan\\(doc_id,10\\)".r.findAllMatchIn(p).length
    assert(scans - pruned <= 2,
      s"expected ≤2 non-query-bag scans (corpus explode + stats):\n$p")
  }

  test("s37 fusion: corpus-sized work stays in the legs; fusion join is tiny") {
    val df = operators.Similarity.s37RrfFusion(spark, dir)
    val p = planString(df)
    // the lexical leg's postings probe broadcasts (t41's pin) and the
    // vector leg's query set broadcasts (s36's pin)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast postings probe:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ query-set leg:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the only sort-merge join permitted is the full-outer fusion of the
    // two ≤|Q|·depth rank lists — a bounded grain by construction
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"corpus-sized sort-merge join leaked into a leg:\n$p")
    // scan accounting (r11 — the t41 pin's device applied to the fused
    // plan, so the SHARED rank cores cannot silently regrow a corpus-tf
    // branch inside s37's context): vec leg = corpus hash-vec scan + a
    // doc_id<10 pruned query scan; lex leg = corpus explode + 1-row
    // stats scan + two pruned query-bag scans. ≤6 total, and at most 3
    // of them full-corpus (non-pruned).
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans <= 6, s"expected ≤6 scans, got $scans:\n$p")
    val pruned = "LessThan\\(doc_id,10\\)".r.findAllMatchIn(p).length
    assert(scans - pruned <= 3,
      s"expected ≤3 non-query-bag scans (vec corpus + lex explode + stats):\n$p")
  }

  test("q71 Z-order: stats broadcast; no global sort of the data rows") {
    val df = graft.sources.Sources.q71ZorderLayout(spark, dir)
    val p = planString(df)
    // both the quantization stats and the report's global-range row must
    // broadcast; the write path is repartition-by-bucket, never a
    // range-partitioned total sort
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast stats:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("s38 MMR greedy steps iterate over checkpointed pools, never the corpus") {
    val df = operators.Similarity.s38Mmr(spark, dir)
    val p = planString(df)
    // the corpus-sized work (s26 ranking, vector fetch, sim grid) ran
    // once into localCheckpoints; the K unrolled greedy steps must join
    // only those in-memory relations — a parquet scan here means a step
    // re-derived the corpus (the p66 contract)
    val scans = "Scan parquet".r.findAllMatchIn(p).length
    assert(scans == 0, s"expected 0 corpus scans after the pool checkpoints, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("m37 pair alignment is one id equi-join; scoring stays in codegen") {
    val df = operators.Multimodal.m37PairAlign(spark, dir)
    val p = planString(df)
    // the caption and media tables pair on doc_id = vec_id — an
    // equi-join production co-buckets; never a nested-loop product
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"theta join in:\n$p")
    assert(p.contains("*("), s"no codegen span:\n$p")
  }

  test("q73 attribution joins on user equality; never a theta-only product") {
    val p = planString(operators.CoreQueries.q73Attribution(spark, dir))
    // the 7-day range rides as a post-join filter on a user_id equi-join
    // (st37's shape) — a theta-only join would cross every purchase with
    // every touch
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"theta-only join in:\n$p")
  }

  test("q72 MAD monitor: median tables broadcast back onto the daily grain") {
    val p = planString(operators.CoreQueries.q72AnomalyMad(spark, dir))
    // the per-type median/MAD relations are |types| rows — they must
    // broadcast back onto the (type, day) grain, never shuffle-join it
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast median join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("p69 DSIR: bucket tables broadcast onto the feature grain; no shuffle joins") {
    val p = planString(operators.Pipeline.p69DsirSelect(spark, dir))
    // the ≤B-row bucket table and the 1-row totals must broadcast; a
    // sort-merge join would re-shuffle the whole (doc, feature) grain
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast bucket join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast totals:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("floor adjudications in docs/FLOORS.json hold on the current tree") {
    // VERDICT r13 item 4: each sf1 row >2x vs DuckDB is adjudicated as
    // a fixed-cost floor ON THE STRENGTH OF a pinned minimal plan. This
    // arm re-validates every pin against the current tree, so an
    // adjudication can never silently outlive the plan it described —
    // tools/floors.py reads the same file to flag unadjudicated >2x
    // rows in any sweep.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(new java.io.File("docs/FLOORS.json"))
    val floors = (j \ "floors").asInstanceOf[JObject].obj
    assert(floors.nonEmpty)
    floors.foreach { case (key, spec) =>
      val p = planString(SparkEntry.queries(key)(spark, dir))
      def n(sub: String) = sub.r.findAllIn(p).size
      val pins = spec \ "pins"
      (pins \ "require").extractOpt[List[String]].getOrElse(Nil).foreach { r =>
        assert(p.contains(r), s"$key: pinned regime node $r missing:\n$p")
      }
      (pins \ "forbid").extract[List[String]].foreach { f =>
        assert(!p.contains(f), s"$key: forbidden node $f appeared:\n$p")
      }
      assert(n("Scan parquet") <= (pins \ "max_scans").extract[Int],
        s"$key: scan count grew past the pinned shape:\n$p")
      assert(n("Window ") <= (pins \ "max_windows").extract[Int],
        s"$key: window count grew past the pinned shape:\n$p")
      assert(n("Exchange ") <= (pins \ "max_exchanges").extract[Int],
        s"$key: exchange count grew past the pinned shape:\n$p")
      (pins \ "max_smj").extractOpt[Int].foreach { m =>
        assert(n("SortMergeJoin") <= m,
          s"$key: sort-merge join count grew past the pinned shape:\n$p")
      }
    }
  }

  test("sf10 floor pins hold statically against benchdata/sf10 (r17)") {
    // VERDICT r16: FLOORS pins validate at sf0.001 while adjudications
    // describe sf10 shapes (q20: broadcast ≤sf1, SMJ at sf10) — the
    // scale-adaptive join claims were prose. This arm makes them
    // machine checks: entries carrying an optional `sf10_pins` block
    // are re-planned against the sf10 bench corpus and the STATIC
    // (pre-AQE) plan is validated — plan-only, nothing executes. The
    // static plan is the right subject: it shows the stats-driven
    // regime choice (broadcast vs SMJ), and AQE only ever improves on
    // it at runtime. `require` lists nodes the claimed regime must
    // contain (q20's SMJ at scale; q08's ObjectHashAggregate; q44's
    // broadcast), `forbid`/counts work as in the sf0.001 validator.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val sf10 = "/root/repo/benchdata/sf10"
    assume(new java.io.File(sf10 + "/events.parquet").exists ||
      new java.io.File(sf10).isDirectory, "bench corpus absent")
    val j = JsonMethods.parse(new java.io.File("docs/FLOORS.json"))
    val floors = (j \ "floors").asInstanceOf[JObject].obj
    val claimed = floors.flatMap { case (key, spec) =>
      (spec \ "sf10_pins").extractOpt[JObject].map(p => (key, p)) }
    assert(claimed.nonEmpty, "no entry claims an sf10 regime anymore — drop this arm")
    claimed.foreach { case (key, pins) =>
      val p = SparkEntry.queries(key)(spark, sf10)
        .queryExecution.executedPlan.toString
      def n(sub: String) = sub.r.findAllIn(p).size
      (pins \ "require").extractOpt[List[String]].getOrElse(Nil).foreach { r =>
        assert(p.contains(r), s"$key@sf10: claimed regime node $r missing:\n$p")
      }
      (pins \ "forbid").extract[List[String]].foreach { f =>
        assert(!p.contains(f), s"$key@sf10: forbidden node $f appeared:\n$p")
      }
      assert(n("Scan parquet") <= (pins \ "max_scans").extract[Int],
        s"$key@sf10: scan count grew past the pinned shape:\n$p")
      assert(n("Window ") <= (pins \ "max_windows").extract[Int],
        s"$key@sf10: window count grew past the pinned shape:\n$p")
      assert(n("Exchange ") <= (pins \ "max_exchanges").extract[Int],
        s"$key@sf10: exchange count grew past the pinned shape:\n$p")
    }
  }

  test("no unpartitioned window anywhere feeds from an unbounded (corpus-sized) grain") {
    // VERDICT r13 item 3: a Window with no partitionSpec moves ALL its
    // input to one task — correct only over a bounded grain (an
    // aggregated/limited table), fatal over a corpus-sized one. The
    // audited sites all sit above an Aggregate or Limit; this walk makes
    // the invariant mechanical so a future edit that feeds a global
    // window from a raw relation goes red instead of warning in a log.
    import org.apache.spark.sql.catalyst.plans.logical._
    // an Aggregate counts as a bounded grain only through its KEYS: a
    // group-by-free aggregate is 1 row; a grouped one is bounded iff the
    // key DOMAIN is — which is not structural, so grouped aggregates
    // over raw sources are adjudicated per key below (month grains,
    // distinct-age grids, per-source stats: audited bounded domains)
    def bounded(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.groupingExpressions.isEmpty || bounded(a.child)
      case _: GlobalLimit => true
      case _: LocalRelation | _: OneRowRelation => true // literal tables
      case l if l.children.isEmpty => false // raw source reached unbounded
      case o => o.children.forall(bounded)
    }
    // global windows over GROUPED aggregates of raw sources, adjudicated
    // by their key DOMAINS (bounded by data semantics, invisible to the
    // structural walk): month grains (q11/q42), distinct-age grids
    // (q12/q53), trace/variant grain (q52), per-source stats (p57/p64),
    // day grain (q61), sketch/bucket grains (t37/d37/q56), conformance
    // totals (q55). Counts are pinned EXACTLY: a new global window over
    // any unbounded-by-structure grain — here or elsewhere — goes red.
    val adjudicated = Map(
      "d37_bloom_admit" -> 1, "p57_source_mix" -> 2,
      "p64_temperature_mix" -> 4, "q11_backlog" -> 1, "q12_survival" -> 2,
      "q42_moving_avg" -> 1, "q52_traces" -> 2, "q53_competing_risks" -> 5,
      "q55_conformance" -> 1, "q56_docket_wait" -> 1,
      "q61_sliding_distinct" -> 1, "t37_cms_freq" -> 1)
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    var globalWindows = 0
    // streaming keys run a micro-batch on construction and return batch
    // results whose plans the batch walk below wouldn't reflect; their
    // window discipline is watermark/state-bound by construction
    val keys = SparkEntry.queries.keys.filterNot(_.startsWith("st")).toSeq.sorted
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      df.queryExecution.optimizedPlan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          globalWindows += 1
          if (!bounded(w.child))
            offenders(k) = offenders.getOrElse(k, 0) + 1
        case _ => ()
      }
    }
    assert(offenders.toMap === adjudicated,
      "global windows over structurally-unbounded grains drifted from " +
        s"the adjudicated set:\ngot $offenders\nexpected $adjudicated")
    // the walk must actually exercise the rule — the audited sites exist
    assert(globalWindows > 0, "walk saw no unpartitioned windows at all")
  }

  test("every keyless (cross/nested-loop) join has a bounded side") {
    // the BNLJ twin of the global-window walk (r15): 22 batch plans
    // carry BroadcastNestedLoopJoins, all the scalar-attach idiom — a
    // 1-row aggregate (corpus total, model norm) or a K-row table
    // (centroids, PQ codebook) crossed onto every row. That is the ONE
    // legitimate keyless-join shape at 100 TB; corpus × corpus without
    // keys is the quadratic catastrophe. This walk pins it: any Join
    // whose condition carries no equi-predicate must have at least one
    // side rooted in an Aggregate/Limit/literal relation.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, EqualNullSafe, Expression, PredicateHelper}
    // tighter than the window walk's bounded(): a grouped aggregate is
    // bounded only if its CHILD is (group keys over a corpus are O(n)
    // distinct — no scalar-attach defense), and only a GLOBAL limit
    // bounds (LocalLimit is per-partition). Group-by-free aggregates and
    // literal relations are the legitimate scalar/K-row attach sides.
    def bounded(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.groupingExpressions.isEmpty || bounded(a.child)
      case _: GlobalLimit => true
      case _: LocalRelation | _: OneRowRelation => true
      case l if l.children.isEmpty => false
      case o => o.children.forall(bounded)
    }
    // an equi-join in the sense Catalyst's ExtractEquiJoinKeys uses: a
    // TOP-LEVEL conjunct equating one side's columns to the other's.
    // `collectFirst(EqualTo)` anywhere in the tree would be fooled by
    // OR-of-equalities or a literal comparison buried in a conjunct.
    object PH extends PredicateHelper {
      def conjuncts(c: Expression): Seq[Expression] =
        splitConjunctivePredicates(c)
    }
    def sidesEqui(j: Join, l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet) && l.references.nonEmpty &&
        r.references.nonEmpty) ||
      (l.references.subsetOf(j.right.outputSet) &&
        r.references.subsetOf(j.left.outputSet) && l.references.nonEmpty &&
        r.references.nonEmpty)
    def hasEqui(j: Join): Boolean = j.condition.exists(c =>
      PH.conjuncts(c).exists {
        case EqualTo(l, r) => sidesEqui(j, l, r)
        case EqualNullSafe(l, r) => sidesEqui(j, l, r)
        case _ => false
      })
    // structurally-opaque-but-audited sides: the ANN family's query
    // samples are literal-range FILTERS on the embedding scan
    // (`vec_id < 10` — 10 rows by data contract, explicitly broadcast)
    // and its codebook/centroid models are keyed by bounded domains
    // (16×256 PQ cells, K centroids). bounded() cannot see either, so
    // these keys' keyless-join counts are pinned EXACTLY: a new keyless
    // join in any query — including these — changes a count and goes red.
    val adjudicated = Map(
      "s26_ann_topk" -> 1, "s29_ann_rerank" -> 1, "s32_pq_adc" -> 3,
      "s33_ivfpq" -> 1, "s34_sq_ann" -> 1, "s36_hash_vectors" -> 1,
      "s37_rrf_fusion" -> 1)
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    var keyless = 0
    val keys = SparkEntry.queries.keys.filterNot(_.startsWith("st")).toSeq.sorted
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      df.queryExecution.optimizedPlan.foreach {
        case j: Join if !hasEqui(j) =>
          keyless += 1
          if (!bounded(j.left) && !bounded(j.right))
            offenders(k) = offenders.getOrElse(k, 0) + 1
        case _ => ()
      }
    }
    assert(offenders.toMap === adjudicated,
      s"keyless joins with no bounded side drifted from the adjudicated set:\n" +
        s"got $offenders\nexpected $adjudicated")
    assert(keyless > 0, "walk saw no keyless joins at all")
  }
}
