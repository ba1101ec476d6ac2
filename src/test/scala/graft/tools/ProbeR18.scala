package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r18 scratch probe: adjudicate the q70 orphan-check shapes and the
  * q10/q11/q12/q20 aggregate-then-window family stage costs (VERDICT
  * r18 items 1-2). Each arm is timed min-of-2 after a warmup of the
  * input scans, full evaluation via the noop sink.
  *
  * Usage: tools/run.sh graft.ProbeR18 /root/repo/benchdata/sf10 [armPrefix]
  */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only = args.lift(1).getOrElse("")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      // "fam" selects the whole aggregate-then-window block below
      if (!name.startsWith(only) && only != "fam") return
      val ts = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(50)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-32s ${ts.min}%.2f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val o = Tables.orders(spark, dir)
    val liDf = Tables.lineitem(spark, dir)

    // warm the page cache so arm deltas are compute, not IO
    o.write.format("noop").mode("overwrite").save()
    liDf.select("l_orderkey", "l_shipdate").write.format("noop").mode("overwrite").save()

    def oAgg = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_cust"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("n_bad_status"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("n_bad_price"))
    def okeys = o.filter(col("o_orderkey").isNotNull)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("kc"))
    def unionKeyGrain = o.filter(col("o_orderkey").isNotNull)
        .select(col("o_orderkey").as("k"), lit(1L).as("ord"), lit(0L).as("li"))
      .unionAll(liDf.select(col("l_orderkey").as("k"),
        lit(0L).as("ord"), lit(1L).as("li")))
      .groupBy("k")
      .agg(sum(col("ord")).as("n_ord"), sum(col("li")).as("n_li_k"))

    if (only != "fam") {
    time("q70.a row-level oAgg")(oAgg)
    time("q70.b okeys key agg")(okeys)
    time("q70.c union key agg")(unionKeyGrain)
    time("q70.d union agg + stats")(unionKeyGrain.agg(
      sum(when(col("n_ord") > 0L, 1L).otherwise(0L)).as("n_keys"),
      sum(when(col("n_ord") === 0L, col("n_li_k")).otherwise(0L)).as("n_orphan"),
      sum(col("n_li_k")).as("n_li")))
    // the r17 production shape: okeys feeds n_keys AND the SHJ anti build
    time("q70.e r17 anti-join full") {
      val keyStats = okeys.agg(count(lit(1)).as("n_keys"))
      val orphans = liDf
        .join(okeys.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      val li = liDf.agg(count(lit(1)).as("n_li"))
      oAgg.crossJoin(broadcast(keyStats))
        .crossJoin(broadcast(orphans)).crossJoin(broadcast(li))
    }
    // r17 shape but the anti probe side pre-aggregated to the key grain
    time("q70.f li-preagg anti full") {
      val keyStats = okeys.agg(count(lit(1)).as("n_keys"))
      val liKeys = liDf.groupBy(col("l_orderkey")).agg(count(lit(1)).as("lc"))
      val orphans = liKeys
        .join(okeys.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(sum(col("lc")).as("n_orphan"))
      val li = liKeys.agg(sum(col("lc")).as("n_li"))
      oAgg.crossJoin(broadcast(keyStats))
        .crossJoin(broadcast(orphans)).crossJoin(broadcast(li))
    }
    time("q70.g production (current)")(
      graft.operators.CoreQueries.q70ConstraintAudit(spark, dir))
    }

    // ---- t30: two corpus scans (per-source sums + distinct vocab) vs
    // ---- ONE fused scan where doc stats ride the pos==0 explode row
    val docs0 = Tables.documents(spark, dir)
    if ("t30".startsWith(only) || only.startsWith("t30")) {
      docs0.select("source", "text").write.format("noop").mode("overwrite").save()
      val docsW = docs0.withColumn("words", split(col("text"), " "))
      time("t30.a perSource sums")(docsW.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("words"))).as("total_tokens"),
          sum(length(col("text"))).as("total_chars"),
          round(avg(size(col("words"))), 4).as("avg_tokens")))
      time("t30.b vocab distinct")(docsW
        .select(col("source"), explode(array_distinct(col("words"))).as("w"))
        .groupBy("source")
        .agg(countDistinct(col("w")).as("n_distinct_tokens")))
      time("t30.c production (current)")(
        graft.operators.TextAnalysis.t30Tokencount(spark, dir))
      graft.functions.GraftFunctions.register(spark)
      time("t30.e kernel perSource") {
        docs0.select(col("source"), col("text"),
            expr("graft_ws_token_count(text)").as("nt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"),
            sum(length(col("text"))).as("total_chars"),
            round(avg(col("nt")), 4).as("avg_tokens"))
      }
      time("t30.f kernel vocab") {
        docs0
          .select(col("source"), explode(expr("graft_distinct_tokens(text)")).as("w"))
          .groupBy("source")
          .agg(countDistinct(col("w")).as("n_distinct_tokens"))
      }
      time("t30.g kernel full") {
        val perSource = docs0.select(col("source"), col("text"),
            expr("graft_ws_token_count(text)").as("nt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"),
            sum(length(col("text"))).as("total_chars"),
            round(avg(col("nt")), 4).as("avg_tokens"))
        val vocab = docs0
          .select(col("source"), explode(expr("graft_distinct_tokens(text)")).as("w"))
          .groupBy("source")
          .agg(countDistinct(col("w")).as("n_distinct_tokens"))
        perSource.join(vocab, Seq("source"))
      }
      time("t30.d fused single scan") {
        val rows = docsW
          .select(col("source"), size(col("words")).as("nw"),
            length(col("text")).as("nc"),
            posexplode_outer(array_distinct(col("words"))).as(Seq("pos", "w")))
        val marker = col("pos") === 0 || col("pos").isNull
        val g1 = rows.groupBy("source", "w")
          .agg(sum(when(marker, col("nw"))).as("p_nw"),
            sum(when(marker, col("nc"))).as("p_nc"),
            sum(when(marker, 1L).otherwise(0L)).as("p_docs"),
            sum(when(marker && col("nw").isNotNull, 1L).otherwise(0L)).as("p_nw_docs"))
        g1.groupBy("source")
          .agg(sum(col("p_docs")).as("n_docs"),
            sum(col("p_nw")).as("total_tokens"),
            sum(col("p_nc")).as("total_chars"),
            round(sum(col("p_nw")).cast("double") /
              sum(col("p_nw_docs")).cast("double"), 4).as("avg_tokens"),
            sum(when(col("w").isNotNull, 1L).otherwise(0L)).as("n_distinct_tokens"))
      }
    }

    // ---- the aggregate-then-window family: per-stage decompositions
    if (only.startsWith("fam")) {
      Tables.events(spark, dir).select("user_id").write.format("noop").mode("overwrite").save()
      // q12: the union-aggregate subject assembly vs its tail
      time("q12.a orderAssembly")(Tables.orderAssembly(spark, dir))
      time("q12.b +obs projection")(Tables.orderAssembly(spark, dir)
        .select(
          when(col("is_final"), datediff(col("last_ship"), col("odate")))
            .otherwise(datediff(lit("2002-06-01").cast("date"), col("odate")))
            .cast("long").as("t_days"),
          when(col("is_final"), 1L).otherwise(0L).as("event"))
        .filter(col("t_days").isNotNull))
      time("q12.c +byT grain")(Tables.orderAssembly(spark, dir)
        .select(
          when(col("is_final"), datediff(col("last_ship"), col("odate")))
            .otherwise(datediff(lit("2002-06-01").cast("date"), col("odate")))
            .cast("long").as("t_days"),
          when(col("is_final"), 1L).otherwise(0L).as("event"))
        .filter(col("t_days").isNotNull)
        .groupBy("t_days")
        .agg(sum(col("event")).as("n_events"),
          sum(lit(1L) - col("event")).as("n_censored"),
          count(lit(1)).as("n_obs")))
      time("q12.full")(graft.operators.CoreQueries.q12Survival(spark, dir))
      // q11: opened / closed legs
      time("q11.a opened agg")(o
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_opened")))
      time("q11.b closed leg")(liDf.select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("completed"))
        .join(o.filter(col("o_orderstatus") === "F")
            .select("o_orderkey").dropDuplicates("o_orderkey").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("completed")).as("month"))
        .agg(count(lit(1)).as("n_closed")))
      time("q11.b2 closed, li-preagg only")(liDf.select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("completed")))
      time("q11.full")(graft.operators.CoreQueries.q11Backlog(spark, dir))
      // q20: the fact-fact join vs its histogram tail
      val delay = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
      time("q20.a SHJ join only")(liDf.select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey")))
      time("q20.full")(graft.operators.CoreQueries.q20Histogram(spark, dir))
      // q10 stages are in ProbeR17 (r17 decomposition still current)
      time("q10.full")(graft.operators.CoreQueries.q10Quantiles(spark, dir))
    }

    // ---- q44: r17 SHJ anti-join vs a q70-style tagged union-aggregate
    if (only.startsWith("q44")) {
      time("q44.a r17 SHJ anti (current)")(
        graft.operators.CoreQueries.q44AntiJoin(spark, dir))
      time("q44.b union-agg") {
        // status as an int code (string agg buffers force SortAggregate
        // — the r16 orderAssembly lesson)
        val stCode = when(col("o_orderstatus") === "F", 0)
          .when(col("o_orderstatus") === "O", 1).otherwise(2)
        val keyGrain = o
            .select(col("o_orderkey").as("k"), stCode.as("st"),
              col("o_totalprice").as("pr"), lit(0L).as("li"))
          .unionAll(liDf.select(col("l_orderkey").as("k"),
            lit(null).cast("int").as("st"), lit(null).cast("double").as("pr"),
            lit(1L).as("li")))
          .groupBy("k")
          .agg(max(col("st")).as("st"), max(col("pr")).as("pr"),
            sum(col("li")).as("n_li"))
        keyGrain.filter(col("n_li") === 0L && col("st").isNotNull)
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n_no_items"),
            round(sum(col("pr")), 2).as("stranded_value"))
      }
      time("q44.a2 r17 SHJ anti again")(
        graft.operators.CoreQueries.q44AntiJoin(spark, dir))
    }

    // ---- q57: where do the bulk-sink seconds go at sf10?
    if (only.startsWith("q57")) {
      val url = "jdbc:derby:memory:graftdb;create=true"
      val orders57 = o
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      val cfSlice = orders57
        .filter(col("o_orderkey") % 4 =!= 3)
        .select(col("o_orderkey").as("cf_key"),
          when(col("o_orderkey") % 11 === 1, lit(9))
            .when(col("o_orderstatus") === "F", lit(0))
            .when(col("o_orderstatus") === "O", lit(3))
            .otherwise(lit(1)).as("completion_status"))
        .unionAll(orders57.filter(col("o_orderkey") % 13 === 0)
          .select((-(col("o_orderkey") + 1)).as("cf_key"), lit(0).as("completion_status")))
      val stage = java.nio.file.Files.createTempDirectory("probe_q57_").toString
      def t[A](name: String)(body: => A): A = {
        val t0 = System.nanoTime(); val r = body
        println(f"[probe] q57.$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      t("csv write")(cfSlice.write.mode("overwrite").csv(stage))
      val conn = java.sql.DriverManager.getConnection(url)
      val st = conn.createStatement()
      st.execute("""CREATE TABLE probe57 ("cf_key" BIGINT, "completion_status" INT)""")
      val shards = new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).sortBy(_.getName)
      println(s"[probe] q57 shards=${shards.length}")
      t("import all shards") {
        val c = conn.prepareCall("CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(?, ?, ?, ?, ?, ?, ?)")
        shards.foreach { f =>
          c.setString(1, "APP"); c.setString(2, "PROBE57"); c.setString(3, f.getAbsolutePath)
          c.setString(4, ","); c.setString(5, "\""); c.setString(6, "UTF-8"); c.setInt(7, 0)
          c.execute()
        }
        c.close()
      }
      t("jdbc read+count") {
        spark.read.format("jdbc").option("url", url).option("dbtable", "probe57")
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          .option("partitionColumn", "cf_key")
          .option("lowerBound", "-20000000").option("upperBound", "20000000")
          .option("numPartitions", "4").load()
          .write.format("noop").mode("overwrite").save()
      }
      st.execute("DROP TABLE probe57"); st.close(); conn.close()
    }

    spark.stop()
  }
}
