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
    "q20_histogram"       -> (CoreQueries.q20Histogram _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = CoreOracles.sql
}
