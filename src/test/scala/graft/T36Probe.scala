package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the t36 bigram-LM chain. */
object T36Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit =
      (1 to 2).foreach { i => System.gc(); Thread.sleep(50); val t0 = System.nanoTime(); f
        println(f"[$name] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s") }
    val documents = Tables.documents(spark, dir)
    if (sys.env.contains("P69_PROBE")) {
      graft.functions.GraftFunctions.register(spark)
      val feats = documents
        .select(col("doc_id"), explode(expr(
          "graft_feat_counts(split(coalesce(text, ''), ' '))")).as("fc"))
        .select(col("doc_id"), col("fc.f").as("f"), col("fc.c").as("c"))
        .withColumn("is_target", col("doc_id") % 13 === 0)
      time("feats")(noop(feats))
      val bt = feats.groupBy("f").agg(
        sum(when(col("is_target"), col("c")).otherwise(0L)).as("t_f"),
        sum(when(!col("is_target"), col("c")).otherwise(0L)).as("r_f"))
      time("bt")(noop(bt))
      val tot = bt.agg(sum(col("t_f")).as("t_tot"), sum(col("r_f")).as("r_tot"))
      val B = graft.functions.PortableHash.DsirBuckets // shared constant — a local literal drifted from the kernel (ADVICE r10)
      val scored = feats.filter(!col("is_target"))
        .join(broadcast(bt), Seq("f"))
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_feats"),
          round(sum(col("c").cast("double") *
            expr(s"ln(CAST(t_f + 1 AS DOUBLE)) - ln(CAST(r_f + 1 AS DOUBLE))" +
                 s" + ln(CAST(r_tot + $B AS DOUBLE)) - ln(CAST(t_tot + $B AS DOUBLE))")), 6)
            .as("log_ratio"))
      time("scored")(noop(scored))
      def full(fr: DataFrame): DataFrame = {
        val bt2 = fr.groupBy("f").agg(
          sum(when(col("is_target"), col("c")).otherwise(0L)).as("t_f"),
          sum(when(!col("is_target"), col("c")).otherwise(0L)).as("r_f"))
        val tot2 = bt2.agg(sum(col("t_f")).as("t_tot"), sum(col("r_f")).as("r_tot"))
        fr.filter(!col("is_target"))
          .join(broadcast(bt2), Seq("f"))
          .crossJoin(broadcast(tot2))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_feats"),
            round(sum(col("c").cast("double") *
              expr(s"ln(CAST(t_f + 1 AS DOUBLE)) - ln(CAST(r_f + 1 AS DOUBLE))" +
                   s" + ln(CAST(r_tot + ${B} AS DOUBLE)) - ln(CAST(t_tot + ${B} AS DOUBLE))")), 6)
              .as("log_ratio"))
          .select(col("doc_id"), col("n_feats"), col("log_ratio"),
            (col("log_ratio") >= 0).cast("int").as("selected"))
          .orderBy("doc_id")
      }
      (1 to 3).foreach { _ =>
        time("p69-two-scan")(noop(full(feats)))
        time("p69-ckpt")(noop(full(graft.Checkpoints.of(feats))))
      }
      spark.stop(); return
    }
    val docs = documents
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("words"))
      .filter(size(col("words")) >= 2)
      .withColumn("w1arr", expr("slice(words, 1, size(words) - 1)"))
      .withColumn("w2arr", expr("slice(words, 2, size(words) - 1)"))
    val dbg = docs
      .select(col("doc_id"), explode(arrays_zip(col("w1arr"), col("w2arr"))).as("z"))
      .select(col("doc_id"), col("z.w1arr").as("w1"), col("z.w2arr").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
    if (sys.env.contains("T36_EXPLAIN")) {
      val bg0 = dbg.groupBy("w1", "w2").agg(sum("n").as("c12"))
      println(bg0.queryExecution.executedPlan.toString.take(8000))
      spark.stop(); return
    }
    if (sys.env.contains("SPLIT_PROBE")) {
      graft.functions.GraftFunctions.register(spark)
      (1 to 2).foreach { _ =>
        time("scan-only")(noop(documents.select(col("doc_id"), length(col("text")).as("l"))))
        time("scan+split")(noop(documents.select(col("doc_id"),
          size(split(coalesce(col("text"), lit("")), " ")).as("s"))))
        time("split+bigramk")(noop(documents.select(col("doc_id"), explode(expr(
          "graft_bigram_counts(split(coalesce(text, ''), ' '))")).as("b"))))
        time("split+featk")(noop(documents.select(col("doc_id"), explode(expr(
          "graft_feat_counts(split(coalesce(text, ''), ' '))")).as("fc"))))
      }
      spark.stop(); return
    }
    if (sys.env.contains("T36_AB")) {
      graft.functions.GraftFunctions.register(spark)
      def score(dbg: DataFrame): DataFrame = {
        val bg = dbg.groupBy("w1", "w2").agg(sum("n").as("c12"))
        val model = bg.join(broadcast(bg.groupBy("w1").agg(sum("c12").as("c1"))), Seq("w1"))
          .select(col("w1"), col("w2"), expr("c12 * 1000000 DIV c1").as("s_ppm"))
        dbg.join(broadcast(model), Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(sum(col("n")).as("n_bigrams"), sum(col("n") * col("s_ppm")).as("tot"))
          .select(col("doc_id"), col("n_bigrams"), expr("tot DIV n_bigrams").as("lm_score_ppm"))
          .orderBy("doc_id")
      }
      def dbgRaw = documents
        .select(col("doc_id"), explode(expr(
          "graft_bigram_counts(split(coalesce(text, ''), ' '))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"), col("b.n").as("n"))
      (1 to 3).foreach { _ =>
        time("two-scan")(noop(score(dbgRaw)))
        time("ckpt")(noop(score(graft.Checkpoints.of(dbgRaw))))
      }
      spark.stop(); return
    }
    time("scan+split")(noop(docs))
    time("explode")(noop(docs.select(col("doc_id"),
      explode(arrays_zip(col("w1arr"), col("w2arr"))).as("z"))))
    time("dbg")(noop(dbg))
    val bg = dbg.groupBy("w1", "w2").agg(sum("n").as("c12"))
    time("bg")(noop(bg))
    val model = bg.join(broadcast(bg.groupBy("w1").agg(sum("c12").as("c1"))), Seq("w1"))
      .select(col("w1"), col("w2"), expr("c12 * 1000000 DIV c1").as("s_ppm"))
    time("model")(noop(model))
    val full = dbg.join(broadcast(model), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"), sum(col("n") * col("s_ppm")).as("tot"))
      .select(col("doc_id"), col("n_bigrams"), expr("tot DIV n_bigrams").as("lm_score_ppm"))
    time("full")(noop(full))
    time("full+sort")(noop(full.orderBy("doc_id")))
    spark.stop()
  }
}
