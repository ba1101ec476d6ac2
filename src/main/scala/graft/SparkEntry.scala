package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Unified event log (SURVEY.md §2 q03) — the reference's event_all.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03EventUnion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_case_scan"       -> (CoreQueries.q01CaseScan _),
    "q02_event_unpivot"   -> (CoreQueries.q02EventUnpivot _),
    "q03_event_union"     -> (CoreQueries.q03EventUnion _),
    "q04_distinct_events" -> (CoreQueries.q04DistinctEvents _),
    "q05_dim_join"        -> (CoreQueries.q05DimJoin _),
    "q06_lead_lag"        -> (CoreQueries.q06LeadLag _),
    "q07_sessionize"      -> (CoreQueries.q07Sessionize _),
    "q08_last_per_key"    -> (CoreQueries.q08LastPerKey _),
    "q09_conditional_agg" -> (CoreQueries.q09ConditionalAgg _),
    "q10_quantiles"       -> (CoreQueries.q10Quantiles _),
    "q11_backlog"         -> (CoreQueries.q11Backlog _),
    "q12_survival"        -> (CoreQueries.q12Survival _),
    "q13_classifier"      -> (CoreQueries.q13Classifier _),
    "q14_pivot"           -> (CoreQueries.q14Pivot _),
    "q15_chain_ids"       -> (CoreQueries.q15ChainIds _),
    "q16_fy_agg"          -> (CoreQueries.q16FyAgg _),
    "q17_topk"            -> (CoreQueries.q17TopK _),
    "q18_regex_class"     -> (CoreQueries.q18RegexClass _),
    "q19_asof_join"       -> (CoreQueries.q19AsofJoin _),
    "q20_histogram"       -> (CoreQueries.q20Histogram _),
    "q35_funnel"          -> (CoreQueries.q35Funnel _),
    "q75_window_funnel"   -> (EventLog.q75WindowFunnel _),
    "q36_cohort"          -> (CoreQueries.q36Cohort _),
    "q41_rollup"          -> (CoreQueries.q41Rollup _),
    "q42_moving_avg"      -> (CoreQueries.q42MovingAvg _),
    "q44_anti_join"       -> (CoreQueries.q44AntiJoin _),
    "q45_skew_salting"    -> (CoreQueries.q45SkewSalting _),
    "q46_chain_resolve"   -> (Chains.q46ChainResolve _),
    "q47_param_unpivot"   -> (EventLog.q47ParamUnpivot _),
    "q48_self_dim_join"   -> (EventLog.q48SelfDimJoin _),
    "q49_hll_sketch"      -> (Sketches.q49HllSketch _),
    "q61_sliding_distinct" -> (Sketches.q61SlidingDistinct _),
    "q69_incr_rollup"     -> (Sketches.q69IncrRollup _),
    "q66_kmv_overlap"     -> (Sketches.q66KmvOverlap _),
    "q52_traces"          -> (EventLog.q52Traces _),
    "q55_conformance"     -> (EventLog.q55Conformance _),
    "q62_transitions"     -> (EventLog.q62Transitions _),
    "q56_docket_wait"     -> (Docket.q56DocketWait _),
    "q64_backlog_forecast" -> (Docket.q64BacklogForecast _),
    "q53_competing_risks" -> (Survival.q53CompetingRisks _),
    "q54_merge_disambiguation" -> (Linking.q54MergeDisambiguation _),
    "p55_corpus_clean"    -> (Pipeline.p55CorpusClean _),
    "p56_stratified_split" -> (Pipeline.p56StratifiedSplit _),
    "p71_leakage_safe_split" -> (Pipeline.p71LeakageSafeSplit _),
    "p72_snapshot_diff"   -> (Pipeline.p72SnapshotDiff _),
    "p57_source_mix"      -> (Pipeline.p57SourceMix _),
    "p58_seq_pack"        -> (Pipeline.p58SeqPack _),
    "q50_snapshot_ages"   -> (RangeJoin.q50SnapshotAges _),
    "q63_fte_utilization" -> (RangeJoin.q63FteUtilization _),
    "q51_quantile_sketch" -> (Sketches.q51QuantileSketch _),
    "st36_stream_static_join" -> (graft.streaming.Streams.st36StreamStaticJoin _),
    "st37_stream_stream_join" -> (graft.streaming.Streams.st37StreamStreamJoin _),
    "st35_stream_dedup"   -> (graft.streaming.Streams.st35StreamDedup _),
    "st38_stream_corpus_admit" -> (graft.streaming.Streams.st38StreamCorpusAdmit _),
    "st39_stream_file_sink" -> (graft.streaming.Streams.st39StreamFileSink _),
    "d21_exact_dedup"     -> (Dedup.d21ExactDedup _),
    "d22_minhash_lsh"     -> (Dedup.d22MinhashLsh _),
    "d23_simhash"         -> (Dedup.d23Simhash _),
    "d24_ngram_jaccard"   -> (Dedup.d24NgramJaccard _),
    "d25_embed_neardup"   -> ((s, d) => Dedup.d25EmbedNeardup(s, d)),
    "d26_dup_clusters"    -> (Dedup.d26DupClusters _),
    "d27_incremental_dedup" -> (Dedup.d27IncrementalDedup _),
    "s26_ann_topk"        -> (Similarity.s26AnnTopk _),
    "s27_ann_lsh"         -> (Similarity.s27AnnLsh _),
    "s28_ann_ivf"         -> (Similarity.s28AnnIvf _),
    "s29_ann_rerank"      -> (Similarity.s29AnnRerank _),
    "s30_kmeans"          -> (Similarity.s30Kmeans _),
    "s31_silhouette"      -> (Similarity.s31Silhouette _),
    "s32_pq_adc"          -> (Similarity.s32PqAdc _),
    "s33_ivfpq"           -> (Similarity.s33IvfPq _),
    "s34_sq_ann"          -> (Similarity.s34SqAnn _),
    "s35_filtered_ann"    -> (Similarity.s35FilteredAnn _),
    "s36_hash_vectors"    -> (Similarity.s36HashVectors _),
    "s37_rrf_fusion"      -> (Similarity.s37RrfFusion _),
    "s38_mmr"             -> (Similarity.s38Mmr _),
    "p62_balanced_sample" -> (Pipeline.p62BalancedSample _),
    "t43_ccnet_buckets"   -> (TextAnalysis.t43CcnetBuckets _),
    "t36_lm_score"        -> (TextAnalysis.t36LmScore _),
    "t37_cms_freq"        -> (TextAnalysis.t37CmsFreq _),
    "t38_langid_eval"     -> (TextAnalysis.t38LangidEval _),
    "t39_drift"           -> (TextAnalysis.t39Drift _),
    "t40_entropy"         -> (TextAnalysis.t40Entropy _),
    "t41_bm25"            -> (TextAnalysis.t41Bm25 _),
    "t42_blocklist"       -> (TextAnalysis.t42Blocklist _),
    "p69_dsir_select"     -> (Pipeline.p69DsirSelect _),
    "q72_anomaly_mad"     -> (CoreQueries.q72AnomalyMad _),
    "q73_attribution"     -> (CoreQueries.q73Attribution _),
    "st47_stream_anomaly" -> (graft.streaming.Streams.st47StreamAnomaly _),
    "m35_payload_chunkdup" -> (Multimodal.m35PayloadChunkdup _),
    "m37_pair_align"      -> (Multimodal.m37PairAlign _),
    "st40_stream_cluster_assign" -> (graft.streaming.Streams.st40StreamClusterAssign _),
    "st48_stream_centroid_update" -> (graft.streaming.Streams.st48StreamCentroidUpdate _),
    "p63_token_budget"    -> (Pipeline.p63TokenBudget _),
    "t28_langid"          -> (TextAnalysis.t28Langid _),
    "t29_quality"         -> (TextAnalysis.t29Quality _),
    "t30_tokencount"      -> (TextAnalysis.t30Tokencount _),
    "t31_fingerprint"     -> (TextAnalysis.t31Fingerprint _),
    "t32_contamination"   -> (TextAnalysis.t32Contamination _),
    "t33_pii_scrub"       -> (TextAnalysis.t33PiiScrub _),
    "t34_repetition"      -> (TextAnalysis.t34Repetition _),
    "p59_shard_shuffle"   -> (Pipeline.p59ShardShuffle _),
    "d28_embed_celldedup" -> (Dedup.d28EmbedCellDedup _),
    "d29_repeated_spans"  -> (Dedup.d29RepeatedSpans _),
    "d30_span_score"      -> (Dedup.d30SpanScore _),
    "d31_quality_survivor" -> (Dedup.d31QualitySurvivor _),
    "d32_span_cut"        -> (Dedup.d32SpanCut _),
    "d33_winnow"          -> (Dedup.d33Winnow _),
    "d34_semdedup"        -> (Dedup.d34Semdedup _),
    "d35_edit_verify"     -> (Dedup.d35EditVerify _),
    "d36_sig_jaccard"     -> (Dedup.d36SigJaccard _),
    "d37_bloom_admit"     -> (Dedup.d37BloomAdmit _),
    "d38_lsh_recall"      -> (Dedup.d38LshRecall _),
    "p64_temperature_mix" -> (Pipeline.p64TemperatureMix _),
    "p65_dataset_card"    -> (Pipeline.p65DatasetCard _),
    "p66_bpe_merges"      -> (Pipeline.p66BpeMerges _),
    "p67_dedup_cascade"   -> (Pipeline.p67DedupCascade _),
    "p68_bpe_encode"      -> (Pipeline.p68BpeEncode _),
    "q58_bloom_prefilter" -> (CoreQueries.q58BloomPrefilter _),
    "q59_scd_history"     -> (CoreQueries.q59ScdHistory _),
    "q65_approx_agg"      -> (CoreQueries.q65ApproxAgg _),
    "q68_gap_fill"        -> (CoreQueries.q68GapFill _),
    "q70_constraint_audit" -> (CoreQueries.q70ConstraintAudit _),
    "q60_cube"            -> (CoreQueries.q60Cube _),
    "m32_multimodal"      -> (Multimodal.m32Multimodal _),
    "m33_frame_sample"    -> (Multimodal.m33FrameSample _),
    "m34_payload_resize"  -> (Multimodal.m34PayloadResize _),
    "m36_sample_assembly" -> (Multimodal.m36SampleAssembly _),
    "st33_stream_window"  -> (graft.streaming.Streams.st33StreamWindow _),
    "st34_stream_session" -> (graft.streaming.Streams.st34StreamSession _),
    "st41_stream_scd"     -> (graft.streaming.Streams.st41StreamScd _),
    "st42_stream_transitions" -> (graft.streaming.Streams.st42StreamTransitions _),
    "st43_stream_heavy_hitters" -> (graft.streaming.Streams.st43StreamHeavyHitters _),
    "st44_stream_drift"   -> (graft.streaming.Streams.st44StreamDrift _),
    "st45_stream_bloom"   -> (graft.streaming.Streams.st45StreamBloom _),
    "st46_stream_rollup"  -> (graft.streaming.Streams.st46StreamRollup _),
    "p60_vocab_build"     -> (Pipeline.p60VocabBuild _),
    "p61_chunk_overlap"   -> (Pipeline.p61ChunkOverlap _),
    "t35_keywords"        -> (TextAnalysis.t35Keywords _),
    "q43_partition_prune" -> (graft.sources.Sources.q43PartitionPrune _),
    "q71_zorder_layout"   -> (graft.sources.Sources.q71ZorderLayout _),
    "q74_corrupt_ingest"  -> (graft.sources.Sources.q74CorruptIngest _),
    "q37_csv_roundtrip"   -> (graft.sources.Sources.q37CsvRoundtrip _),
    "q38_jdbc_roundtrip"  -> (graft.sources.Sources.q38JdbcRoundtrip _),
    "q57_reconciliation"  -> (graft.sources.Sources.q57Reconciliation _),
    "q39_bucketed_join"   -> (graft.sources.Sources.q39BucketedJoin _),
    "q40_multi_format"    -> (graft.sources.Sources.q40MultiFormat _),
    "q67_schema_evolution" -> (graft.sources.Sources.q67SchemaEvolution _)
  )

  /** Resolve the optional SPARK_GRAFT_ONLY comma-list into a query map.
    * Fails fast on an empty value or keys not in [[queries]] — silently
    * selecting zero queries made verify/bench "succeed" while doing
    * nothing (ADVICE r4). */
  def resolveOnly(only: Option[String]): Map[String, (SparkSession, String) => DataFrame] =
    only match {
      case None => queries
      case Some(v) =>
        val ks = v.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = ks.diff(queries.keySet)
        require(ks.nonEmpty, "SPARK_GRAFT_ONLY is set but selects no queries")
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY contains unknown keys: ${unknown.toSeq.sorted.mkString(", ")}")
        queries.filter(kv => ks(kv._1))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOracles.sql ++ PipelineOracles.sql ++ ExtOracles.sql ++ Map(
      "st33_stream_window" ->
        """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
          |       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
          |FROM events GROUP BY hour_start, event_type
          |ORDER BY hour_start, event_type""".stripMargin,
      // st34: q07's sessions minus each user's trailing (still-open) session
      "st37_stream_stream_join" ->
        """SELECT v.user_id, v.event_id AS view_event, p.event_id AS purchase_event
          |FROM events v JOIN events p
          |  ON v.user_id = p.user_id
          | AND v.event_type = 'view' AND p.event_type = 'purchase'
          | AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
          | AND CAST(p.ts AS TIMESTAMP) < CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
          |ORDER BY 1, 2, 3""".stripMargin,
      "st34_stream_session" ->
        """WITH t AS (
          |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          |         LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          |  FROM events
          |), s AS (
          |  SELECT user_id, event_id, ts,
          |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
          |  FROM t
          |), g AS (
          |  SELECT user_id, ts,
          |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
          |  FROM s
          |), sess AS (
          |  SELECT user_id, session_num, COUNT(*) AS n_events,
          |         MIN(ts) AS session_start, MAX(ts) AS session_end,
          |         MAX(session_num) OVER (PARTITION BY user_id) AS last_num
          |  FROM g GROUP BY user_id, session_num
          |)
          |SELECT user_id, session_start, session_end, n_events
          |FROM sess WHERE session_num < last_num
          |ORDER BY user_id, session_start""".stripMargin,
      // st41: q59's closed intervals — the open (is_current) row per
      // entity stays in group state, deliberately un-emitted (append
      // mode cannot retract), the same contract as st34
      "st41_stream_scd" ->
        """WITH ch AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
          |         event_type AS state,
          |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events
          |), kept AS (
          |  SELECT user_id, ts, event_id, state FROM ch
          |  WHERE prev IS NULL OR state <> prev
          |)
          |SELECT user_id, CAST(ROW_NUMBER() OVER w AS INT) AS version, state,
          |       ts AS eff_from, LEAD(ts) OVER w AS eff_to
          |FROM kept WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |QUALIFY eff_to IS NOT NULL
          |ORDER BY user_id, version""".stripMargin,
      // q37/q38 round-trip through csv / jdbc; end state is statable on parquet
      "q37_csv_roundtrip" ->
        """SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
          |FROM region JOIN nation ON r_regionkey = n_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin,
      "q38_jdbc_roundtrip" ->
        """SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
      // q57: the Caseflow slice round-trips through Derby; the oracle
      // restates the deterministic slice + reconciliation from parquet
      "q57_reconciliation" ->
        """WITH ow AS (
          |  SELECT * FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          |    AND o_orderdate < TIMESTAMP '1997-07-01'
          |), vac AS (
          |  SELECT o_orderkey AS vkey,
          |         CASE WHEN o_orderstatus = 'F' THEN '98'
          |              WHEN o_orderstatus = 'O' THEN '50'
          |              ELSE '77' END AS loc
          |  FROM ow
          |), cf AS (
          |  SELECT o_orderkey AS ckey,
          |         CASE WHEN o_orderkey % 11 = 1 THEN 9
          |              WHEN o_orderstatus = 'F' THEN 0
          |              WHEN o_orderstatus = 'O' THEN 3
          |              ELSE 1 END AS completion_status
          |  FROM ow WHERE o_orderkey % 4 <> 3
          |  UNION ALL
          |  SELECT -(o_orderkey + 1), 0 FROM ow WHERE o_orderkey % 13 = 0
          |), j AS (
          |  SELECT COALESCE(v.vkey, c.ckey) AS key,
          |         CASE WHEN c.ckey IS NULL THEN 'missing_in_caseflow'
          |              WHEN v.vkey IS NULL THEN 'missing_in_vacols'
          |              WHEN (c.completion_status = 0 AND v.loc = '98')
          |                OR (c.completion_status = 3 AND v.loc = '50')
          |                OR (c.completion_status = 1 AND v.loc = '77') THEN 'consistent'
          |              ELSE 'rule_violation' END AS check_status
          |  FROM vac v FULL OUTER JOIN cf c ON v.vkey = c.ckey
          |)
          |SELECT check_status, COUNT(*) AS n_cases,
          |       MIN(key) AS min_key, MAX(key) AS max_key
          |FROM j GROUP BY check_status ORDER BY check_status""".stripMargin,
      "q39_bucketed_join" ->
        """SELECT o_orderpriority, COUNT(*) AS n_items,
          |       ROUND(SUM(l_extendedprice), 2) AS revenue
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "q43_partition_prune" ->
        """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date, event_type,
          |       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
          |FROM events
          |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08'
          |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
          |GROUP BY 1, 2
          |ORDER BY 1, 2""".stripMargin,
      "q40_multi_format" ->
        """SELECT r_name, n_name
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |ORDER BY r_name, n_name""".stripMargin,
      // st47 emits q72's report exactly (shared daily grain + report
      // tail definitions) — one oracle, the st44/st45 device
      "st47_stream_anomaly" -> CoreOracles.sql("q72_anomaly_mad"),
      // q74: the Spark side genuinely corrupts, writes, and re-parses
      // the JSON feed; the oracle restates the quarantine split from
      // parquet via the same deterministic mod-13 rule (q57's device)
      "q74_corrupt_ingest" ->
        """WITH s AS (
          |  SELECT CASE WHEN event_id % 13 = 0 THEN 'quarantined' ELSE 'clean' END AS status,
          |         CASE WHEN event_id % 13 = 0 THEN '__QUARANTINE__' ELSE event_type END AS event_type,
          |         CASE WHEN event_id % 13 = 0 THEN 0 ELSE value END AS value
          |  FROM events
          |)
          |SELECT status, event_type, COUNT(*) AS n_records,
          |       ROUND(SUM(value), 2) AS sum_value
          |FROM s GROUP BY status, event_type
          |ORDER BY status, event_type""".stripMargin,
      // q71: the Spark side writes the Z-ordered layout and reports from
      // the re-read; the oracle restates the same Morton arithmetic over
      // the original parquet (the q39/q43 end-state pattern). The zkey
      // expression text comes from ONE generator shared with the plan.
      "q71_zorder_layout" -> {
        import graft.sources.Sources.{ZBits, ZBuckets, zkeyExpr}
        s"""WITH o AS (
          |  SELECT o_orderkey, o_custkey,
          |         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days
          |  FROM orders
          |), st AS (
          |  SELECT MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
          |         MIN(days) AS dmin, MAX(days) AS dmax FROM o
          |), keyed AS (
          |  SELECT o.*, st.cmin, st.cmax, st.dmin, st.dmax,
          |         (o_custkey - cmin) * ${1L << ZBits} // (cmax - cmin + 1) AS xs,
          |         (days - dmin) * ${1L << ZBits} // (dmax - dmin + 1) AS ys
          |  FROM o CROSS JOIN st
          |), z AS (
          |  SELECT *, ${zkeyExpr("//")} AS zkey FROM keyed
          |), b AS (
          |  SELECT *, zkey // ${(1L << (2 * ZBits)) / ZBuckets} AS zbucket FROM z
          |)
          |SELECT zbucket, COUNT(*) AS n_rows,
          |       (MAX(o_custkey) - MIN(o_custkey) + 1) * 10000 // (MIN(cmax) - MIN(cmin) + 1) AS cust_span_pm,
          |       (MAX(days) - MIN(days) + 1) * 10000 // (MIN(dmax) - MIN(dmin) + 1) AS date_span_pm
          |FROM b GROUP BY zbucket
          |ORDER BY zbucket""".stripMargin
      },
      // q67: the Spark side writes the two-schema footprints and reads
      // them merged; the oracle restates the end state from the
      // original parquet with the same date split (q39/q43 pattern)
      "q67_schema_evolution" ->
        s"""SELECT event_type, COUNT(*) AS n_events,
          |       CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '${graft.sources.Sources.EvolutionCut}'
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved,
          |       CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '${graft.sources.Sources.EvolutionCut}'
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
          |       CAST(SUM(CAST(FLOOR(value / 100.0) AS BIGINT)) AS BIGINT) AS sum_band
          |FROM events GROUP BY event_type
          |ORDER BY event_type""".stripMargin
    )
}
