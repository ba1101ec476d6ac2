package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash.ph

/** Text-analysis operators t28–t31 (SURVEY.md §2) over `documents`:
  * language ID, quality scoring, token counting, fingerprinting. All
  * pure column expressions (codegen'd, no UDFs), reproducible in ANSI
  * SQL for the oracle.
  */
object TextAnalysis {

  private val stopEn = Seq("the", "a", "of", "and", "to")
  private val stopDe = Seq("der", "die", "das", "und", "ist")
  private val stopEs = Seq("el", "la", "los", "que", "una")
  private val stopFr = Seq("le", "les", "des", "est", "une")
  private val stopZh = Seq("的", "是", "了", "在", "和")

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  private def scoreCol(xs: Seq[String]): Column =
    expr(s"size(filter(words, w -> w in ${inList(xs)}))").cast("long")

  /** Adds the five stopword-profile scores and `pred_lang` (fixed
    * precedence tie-break en > de > es > fr > zh). Requires a `words`
    * column. Shared by t28 and the p55 pipeline — ONE definition, so the
    * composite can never drift from the standalone operator.
    */
  private[operators] def withPredLang(df: DataFrame): DataFrame = df
    .withColumn("s_en", scoreCol(stopEn))
    .withColumn("s_de", scoreCol(stopDe))
    .withColumn("s_es", scoreCol(stopEs))
    .withColumn("s_fr", scoreCol(stopFr))
    .withColumn("s_zh", scoreCol(stopZh))
    .withColumn("pred_lang",
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
           col("s_en") >= col("s_fr") && col("s_en") >= col("s_zh"), "en")
      .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
            col("s_de") >= col("s_zh"), "de")
      .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
      .when(col("s_fr") >= col("s_zh"), "fr")
      .otherwise("zh"))

  /** t28: language ID via stopword-profile scores with a fixed
    * precedence tie-break (en > de > es > fr > zh). A deterministic
    * n-gram heuristic — parity with the oracle matters, not accuracy.
    */
  def t28Langid(spark: SparkSession, dir: String): DataFrame = {
    withPredLang(Tables.documents(spark, dir)
        .withColumn("words", split(col("text"), " ")))
      .select(col("doc_id"), col("pred_lang"), col("lang").as("actual_lang"),
        (col("pred_lang") === col("lang")).cast("int").as("correct"),
        col("s_en"), col("s_de"), col("s_es"), col("s_fr"), col("s_zh"))
      .orderBy("doc_id")
  }

  /** Adds length/stopword quality metrics and `score_x10000`. Requires a
    * `words` column. Shared by t29 and the p55 pipeline. The score is
    * scaled to an integer (×10000, floor(x+0.5)) — identical IEEE
    * doubles on both engines make floor deterministic, unlike decimal
    * round() whose half-case handling differs across engines.
    */
  private[operators] def withQualityScore(df: DataFrame): DataFrame = df
    .withColumn("n_chars_m", length(col("text")).cast("long"))
    .withColumn("n_words", size(col("words")).cast("long"))
    .withColumn("n_letters", (col("n_chars_m") - (col("n_words") - 1)).cast("long"))
    .withColumn("avg_word_len",
      round(col("n_letters").cast("double") / col("n_words").cast("double"), 4))
    .withColumn("stop_ratio", round(
      expr(s"size(filter(words, w -> w in ${inList(stopEn)}))").cast("double") /
        col("n_words").cast("double"), 4))
    .withColumn("score_x10000", floor(
      (lit(0.3) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
       lit(0.4) * (lit(1.0) - col("stop_ratio")) +
       lit(0.3) * least(col("avg_word_len") / 8.0, lit(1.0))) * 10000.0 + 0.5)
      .cast("long"))

  /** t29: document quality scoring — length, stopword ratio, mean word
    * length — the length/punct/stopword-ratio heuristics of corpus
    * filtering pipelines.
    */
  def t29Quality(spark: SparkSession, dir: String): DataFrame = {
    withQualityScore(Tables.documents(spark, dir)
        .withColumn("words", split(col("text"), " ")))
      .withColumn("quality_ok", (col("score_x10000") >= 5000L).cast("int"))
      .select("doc_id", "n_chars_m", "n_words", "avg_word_len", "stop_ratio",
        "score_x10000", "quality_ok")
      .orderBy("doc_id")
  }

  /** t30: token counting per source — whitespace tokens, distinct
    * vocabulary, char totals. Two aggregation grains (doc-level sums +
    * corpus-level distinct) joined on the blocking key.
    */
  def t30Tokencount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
    val perSource = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("words"))).as("total_tokens"),
        sum(length(col("text"))).as("total_chars"),
        round(avg(size(col("words"))), 4).as("avg_tokens"))
    val vocab = docs.select(col("source"), explode(col("words")).as("w"))
      .groupBy("source")
      .agg(countDistinct(col("w")).as("n_distinct_tokens"))
    perSource.join(vocab, Seq("source"))
      .select("source", "n_docs", "total_tokens", "total_chars", "avg_tokens",
        "n_distinct_tokens")
      .orderBy("source")
  }

  /** t31: normalized document fingerprint — portable hash of the sorted
    * distinct word set (a bag-of-words content signature); groups share
    * a fingerprint iff vocabularies match.
    */
  def t31Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("fp", ph(expr(
        "concat_ws(' ', array_sort(array_distinct(split(text, ' '))))")))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy("fp")
  }

  /** Contamination flag threshold: a fifth of a training doc's distinct
    * 3-gram shingles appearing verbatim in the eval set is far above this
    * corpus's chance-overlap floor (mean 0.06 at sf0.01) while still
    * catching partial inclusions, not just exact copies. */
  val ContaminationThreshold = 0.2

  /** t32: eval-benchmark decontamination screen. Docs with
    * `doc_id % 13 == 0` stand in for a held-out eval benchmark; every
    * remaining (training) doc is scored by the fraction of its distinct
    * 3-gram shingles that appear anywhere in the benchmark — the
    * n-gram-overlap screen LLM corpus pipelines run before training so
    * eval answers don't leak into the training set.
    *
    * 100 TB posture: the benchmark shingle index is tiny (eval suites
    * are MBs, not TBs) — `broadcast()` pins it to the build side, so the
    * corpus is ONE scan with a map-side hash probe; the only shuffle is
    * the per-doc partial-aggregated hit count (≤ 1 row per doc after
    * map-side combine). Shingles are hashed inside
    * `graft_shingle_hashes3` (codegen'd), so no shingle string is ever
    * materialized into the plan — same posture as d24.
    */
  def t32Contamination(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sh = Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr("graft_shingle_hashes3(words)").as("xs"))
      .select(col("doc_id"), size(col("xs")).cast("long").as("nsh"),
        explode(col("xs")).as("x"))
    val bench = sh.filter(col("doc_id") % 13 === 0)
      .select("x").distinct().withColumn("hit", lit(1))
    sh.filter(col("doc_id") % 13 =!= 0)
      .join(broadcast(bench), Seq("x"), "left")
      .groupBy(col("doc_id"), col("nsh"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(col("doc_id"), col("nsh"), col("n_hit"),
        round(col("n_hit").cast("double") / col("nsh").cast("double"), 4)
          .as("overlap"))
      .withColumn("contaminated",
        (col("overlap") >= ContaminationThreshold).cast("int"))
      .orderBy("doc_id")
  }
}
