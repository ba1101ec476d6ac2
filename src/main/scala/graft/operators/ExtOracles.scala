package graft.operators

/** DuckDB oracle SQL for the round-3 operators q46–q48 — exact mirrors
  * of [[Chains]] and [[EventLog]]. q46's iterate-to-fixpoint resolution
  * is expressed as WITH RECURSIVE (the declarative equivalent of the
  * reference's repeat-until-no-change loop).
  */
object ExtOracles {

  private val q46Sql: String =
    """WITH RECURSIVE l0 AS (
      |  SELECT o_orderkey AS id,
      |         CASE WHEN o_orderkey % 10 = 0 THEN NULL
      |              WHEN o_orderkey % 1000 = 555 THEN -o_orderkey - 1
      |              ELSE o_orderkey - 1 END AS parent
      |  FROM orders
      |), links AS (
      |  SELECT a.id, CASE WHEN p.id IS NULL THEN NULL ELSE a.parent END AS parent
      |  FROM l0 a LEFT JOIN l0 p ON a.parent = p.id
      |), walk AS (
      |  SELECT id, id AS cur, 0 AS depth FROM links
      |  UNION ALL
      |  SELECT w.id, l.parent AS cur, w.depth + 1
      |  FROM walk w JOIN links l ON w.cur = l.id
      |  WHERE l.parent IS NOT NULL
      |), root AS (
      |  SELECT id, cur AS chain_root, depth,
      |         ROW_NUMBER() OVER (PARTITION BY id ORDER BY depth DESC) AS rn
      |  FROM walk
      |)
      |SELECT id AS o_orderkey, chain_root, CAST(depth AS BIGINT) AS depth,
      |       COUNT(*) OVER (PARTITION BY chain_root) AS chain_size
      |FROM root WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin

  private val q47Sql: String =
    """SELECT * FROM (
      |  SELECT l_orderkey AS case_key, CAST(l_linenumber AS BIGINT) AS line,
      |         'QTY' AS event_type, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'PRICE', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'DISCOUNT', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'TAX', l_tax FROM lineitem
      |  UNION ALL
      |  SELECT o_orderkey, 0, 'TOTAL', o_totalprice FROM orders
      |) WHERE value IS NOT NULL
      |ORDER BY case_key, line, event_type""".stripMargin

  private val q48Sql: String =
    """SELECT c.c_custkey, c.c_name,
      |       c.c_custkey - (c.c_custkey % 10) AS lead_key,
      |       l.c_name AS lead_name, n.n_name AS lead_nation,
      |       (c.c_nationkey = l.c_nationkey) AS same_nation
      |FROM customer c
      |LEFT JOIN customer l ON l.c_custkey = c.c_custkey - (c.c_custkey % 10)
      |LEFT JOIN nation n ON l.c_nationkey = n.n_nationkey
      |ORDER BY c.c_custkey""".stripMargin

  // exact mirror of Sketches.q49HllSketch — constants injected from the
  // same PortableHash fields the Spark plan uses
  private val q49Sql: String = {
    import graft.functions.PortableHash._
    val m = HllBuckets; val pb1 = HllPatternBits + 1
    val two53 = 1L << pb1
    s"""WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
      |), h AS (
      |  SELECT source, tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
      |), rr AS (
      |  SELECT source, h % $m AS bucket,
      |         CASE WHEN h // $m = 0 THEN $pb1
      |              ELSE $pb1 - length(bin(h // $m)) END AS rho
      |  FROM h
      |), bm AS (
      |  SELECT source, bucket, MAX(rho) AS mx FROM rr GROUP BY source, bucket
      |), z AS (
      |  SELECT source,
      |         CAST(SUM(CAST(1 AS BIGINT) << CAST($pb1 - mx AS INT)) AS BIGINT) AS zp,
      |         COUNT(*) AS nb
      |  FROM bm GROUP BY source
      |), e AS (
      |  SELECT source, zp + ($m - nb) * $two53 AS zint, $m - nb AS zeros FROM z
      |), est AS (
      |  -- all literals cast to DOUBLE: DuckDB types bare decimal
      |  -- literals as DECIMAL and overflows the multiplication
      |  SELECT source, zeros,
      |         CAST($HllAlpha AS DOUBLE) * CAST(${m.toDouble * m} AS DOUBLE)
      |           * CAST(${two53.toDouble} AS DOUBLE) / CAST(zint AS DOUBLE) AS est_raw
      |  FROM e
      |), fin AS (
      |  SELECT source,
      |         ROUND(CASE WHEN zeros > 0 AND est_raw <= CAST(${2.5 * m} AS DOUBLE)
      |                    THEN CAST(${m.toDouble} AS DOUBLE)
      |                         * ln(CAST(${m.toDouble} AS DOUBLE) / CAST(zeros AS DOUBLE))
      |                    ELSE est_raw END, 4) AS hll_estimate
      |  FROM est
      |), ex AS (
      |  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact FROM h GROUP BY source
      |)
      |SELECT f.source AS source, n_exact, hll_estimate,
      |       ROUND(ABS(hll_estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 4) AS rel_err
      |FROM fin f JOIN ex ON f.source = ex.source
      |ORDER BY source""".stripMargin
  }

  // exact mirror of Sketches.q61SlidingDistinct — the q49 register
  // arithmetic on the (day, user) grain, dense day×bucket grid, windowed
  // register max, same Z/estimate/correction expressions
  private val q61Sql: String = {
    import graft.functions.PortableHash._
    import graft.operators.Sketches.SlideDays
    val m = HllBuckets; val pb1 = HllPatternBits + 1
    val two53 = 1L << pb1; val wm1 = SlideDays - 1
    s"""WITH du AS (
      |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
      |  FROM events
      |), dud AS (
      |  SELECT day, CAST(day - DATE '1970-01-01' AS BIGINT) AS dd, user_id FROM du
      |), rr AS (
      |  SELECT dd, day,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % $m AS bucket,
      |         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT // $m = 0 THEN $pb1
      |              ELSE $pb1 - length(bin(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT // $m)) END AS rho
      |  FROM dud
      |), bm AS (
      |  SELECT dd, day, bucket, MAX(rho) AS mx FROM rr GROUP BY 1, 2, 3
      |), days AS (
      |  SELECT DISTINCT dd, day FROM dud
      |), grid AS (
      |  SELECT d.dd, d.day, t.b AS bucket FROM days d CROSS JOIN range(0, $m) t(b)
      |), merged AS (
      |  SELECT g.dd, g.day, g.bucket,
      |         MAX(bm.mx) OVER (PARTITION BY g.bucket ORDER BY g.dd
      |                          RANGE BETWEEN $wm1 PRECEDING AND CURRENT ROW) AS mmx
      |  FROM grid g LEFT JOIN bm ON g.dd = bm.dd AND g.bucket = bm.bucket
      |), z AS (
      |  SELECT dd, day,
      |         CAST(SUM(CASE WHEN mmx IS NOT NULL
      |                       THEN CAST(1 AS BIGINT) << CAST($pb1 - mmx AS INT)
      |                       ELSE 0 END) AS BIGINT) AS zp,
      |         SUM(CASE WHEN mmx IS NOT NULL THEN 1 ELSE 0 END) AS nb
      |  FROM merged GROUP BY 1, 2
      |), e AS (
      |  SELECT dd, day, zp + ($m - nb) * $two53 AS zint, $m - nb AS zeros FROM z
      |), est AS (
      |  SELECT dd, day, zeros,
      |         CAST($HllAlpha AS DOUBLE) * CAST(${m.toDouble * m} AS DOUBLE)
      |           * CAST(${two53.toDouble} AS DOUBLE) / CAST(zint AS DOUBLE) AS est_raw
      |  FROM e
      |), fin AS (
      |  SELECT dd, day,
      |         ROUND(CASE WHEN zeros > 0 AND est_raw <= CAST(${2.5 * m} AS DOUBLE)
      |                    THEN CAST(${m.toDouble} AS DOUBLE)
      |                         * ln(CAST(${m.toDouble} AS DOUBLE) / CAST(zeros AS DOUBLE))
      |                    ELSE est_raw END, 4) AS hll_estimate
      |  FROM est
      |), ex AS (
      |  SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_exact
      |  FROM days d JOIN dud u ON u.dd BETWEEN d.dd - $wm1 AND d.dd
      |  GROUP BY d.day
      |)
      |SELECT CAST(f.day AS TIMESTAMP) AS day, n_exact, hll_estimate,
      |       ROUND(ABS(hll_estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 4) AS rel_err
      |FROM fin f JOIN ex ON f.day = ex.day
      |ORDER BY day""".stripMargin
  }

  // exact mirror of Sketches.q69IncrRollup: same arrival split, same
  // per-side partial state, same add/max merge, and the SAME estimate
  // chain generated twice from one template (merged + full-rebuild)
  private val q69Sql: String = {
    import graft.functions.PortableHash._
    import graft.operators.Dedup.IncrementalBatchMod
    val m = HllBuckets; val pb1 = HllPatternBits + 1
    val two53 = 1L << pb1
    def estCtes(tag: String, src: String): String =
      s"""z$tag AS (
        |  SELECT event_type, day,
        |         CAST(SUM(CAST(1 AS BIGINT) << CAST($pb1 - mx AS INT)) AS BIGINT) AS zp,
        |         COUNT(*) AS nb
        |  FROM $src GROUP BY 1, 2
        |), e$tag AS (
        |  SELECT event_type, day, zp + ($m - nb) * $two53 AS zint, $m - nb AS zeros FROM z$tag
        |), s$tag AS (
        |  SELECT event_type, day, zeros,
        |         CAST($HllAlpha AS DOUBLE) * CAST(${m.toDouble * m} AS DOUBLE)
        |           * CAST(${two53.toDouble} AS DOUBLE) / CAST(zint AS DOUBLE) AS est_raw
        |  FROM e$tag
        |), f$tag AS (
        |  SELECT event_type, day,
        |         ROUND(CASE WHEN zeros > 0 AND est_raw <= CAST(${2.5 * m} AS DOUBLE)
        |                    THEN CAST(${m.toDouble} AS DOUBLE)
        |                         * ln(CAST(${m.toDouble} AS DOUBLE) / CAST(zeros AS DOUBLE))
        |                    ELSE est_raw END, 4) AS est
        |  FROM s$tag
        |)""".stripMargin
    s"""WITH ev AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |         CAST(floor(value * 100) AS BIGINT) AS v100,
      |         (event_id % $IncrementalBatchMod = 0) AS is_delta,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events
      |), rr AS (
      |  SELECT *, h % $m AS bucket,
      |         CASE WHEN h // $m = 0 THEN $pb1
      |              ELSE $pb1 - length(bin(h // $m)) END AS rho
      |  FROM ev
      |), parts AS (
      |  SELECT is_delta, event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(v100) AS BIGINT) AS sv
      |  FROM rr GROUP BY 1, 2, 3
      |), mergedagg AS (
      |  SELECT event_type, day, CAST(SUM(n) AS BIGINT) AS n_events,
      |         CAST(SUM(sv) AS BIGINT) AS sum_v100
      |  FROM parts GROUP BY 1, 2
      |), regs AS (
      |  SELECT is_delta, event_type, day, bucket, MAX(rho) AS mx
      |  FROM rr GROUP BY 1, 2, 3, 4
      |), mreg AS (
      |  SELECT event_type, day, bucket, MAX(mx) AS mx FROM regs GROUP BY 1, 2, 3
      |), freg AS (
      |  SELECT event_type, day, bucket, MAX(rho) AS mx FROM rr GROUP BY 1, 2, 3
      |), fullagg AS (
      |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_full,
      |         CAST(SUM(v100) AS BIGINT) AS sum_full
      |  FROM rr GROUP BY 1, 2
      |), ${estCtes("m", "mreg")}, ${estCtes("f", "freg")}
      |SELECT ma.event_type, CAST(ma.day AS TIMESTAMP) AS day,
      |       ma.n_events, ma.sum_v100,
      |       fm.est AS est_users, ff.est AS est_users_full,
      |       (ma.n_events = fa.n_full AND ma.sum_v100 = fa.sum_full
      |        AND fm.est = ff.est) AS maintenance_exact
      |FROM mergedagg ma
      |JOIN fm ON fm.event_type = ma.event_type AND fm.day = ma.day
      |JOIN fullagg fa ON fa.event_type = ma.event_type AND fa.day = ma.day
      |JOIN ff ON ff.event_type = ma.event_type AND ff.day = ma.day
      |ORDER BY ma.event_type, ma.day""".stripMargin
  }

  // exact mirror of Multimodal.m33FrameSample: frame byte ranges and
  // integer features recomputed by slicing the payload's hex string
  // (DuckDB 1.0 cannot slice blobs directly)
  private val m33Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS len FROM documents
      |), f AS (
      |  SELECT doc_id, hx, CAST(t.k AS INT) AS frame_idx,
      |         (t.k * len) // ${Multimodal.NumFrames} AS s,
      |         ((t.k + 1) * len) // ${Multimodal.NumFrames} AS e
      |  FROM d, range(0, ${Multimodal.NumFrames}) t(k)
      |), b AS (
      |  SELECT doc_id, frame_idx, e - s AS n_frame_bytes,
      |         list_transform(generate_series(s, e - 1),
      |           i -> ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::INT) AS bytes
      |  FROM f WHERE e > s
      |)
      |SELECT doc_id, frame_idx, CAST(n_frame_bytes AS BIGINT) AS n_frame_bytes,
      |       CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
      |       CAST(list_min(bytes) AS INT) AS byte_min,
      |       CAST(list_max(bytes) AS INT) AS byte_max,
      |       CAST(list_sum(bytes) AS BIGINT) // CAST(n_frame_bytes AS BIGINT) AS luma_q
      |FROM b
      |ORDER BY doc_id, frame_idx""".stripMargin

  // exact mirror of RangeJoin.q50SnapshotAges (grid-bucketized interval
  // join; DuckDB can afford the same equi shape)
  private val q50Sql: String =
    """WITH comp AS (
      |  SELECT l_orderkey, MAX(l_shipdate) AS completed FROM lineitem GROUP BY 1
      |), iv AS (
      |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS startd,
      |         COALESCE(CASE WHEN o_orderstatus = 'F' THEN CAST(completed AS DATE) END,
      |                  DATE '2002-06-01') AS endd
      |  FROM orders LEFT JOIN comp ON o_orderkey = l_orderkey
      |), cells AS (
      |  SELECT o_orderkey, startd, endd,
      |         CAST(unnest(generate_series(CAST(date_trunc('quarter', startd) AS DATE),
      |           CAST(date_trunc('quarter', GREATEST(endd, startd)) AS DATE),
      |           INTERVAL 3 MONTH)) AS DATE) AS cell
      |  FROM iv
      |), snaps AS (
      |  SELECT CAST(unnest(generate_series(DATE '1995-04-01', DATE '2002-04-01',
      |    INTERVAL 3 MONTH)) AS DATE) AS s
      |), j AS (
      |  SELECT s, date_diff('day', startd, s) // 30 AS age_bin
      |  FROM snaps JOIN cells ON cell = s
      |  WHERE startd <= s AND endd > s
      |), pb AS (
      |  SELECT s, age_bin, COUNT(*) AS cnt FROM j GROUP BY s, age_bin
      |), cum AS (
      |  SELECT s, age_bin, cnt,
      |         SUM(cnt) OVER (PARTITION BY s) AS n_open,
      |         SUM(cnt) OVER (PARTITION BY s ORDER BY age_bin
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM pb
      |)
      |SELECT CAST(s AS TIMESTAMP) AS snapshot,
      |       CAST(MAX(n_open) AS BIGINT) AS n_open,
      |       CAST(MIN(CASE WHEN cum >= 0.5 * n_open THEN age_bin END) AS DOUBLE) * 30 AS p50_age_days,
      |       CAST(MIN(CASE WHEN cum >= 0.9 * n_open THEN age_bin END) AS DOUBLE) * 30 AS p90_age_days
      |FROM cum GROUP BY s
      |ORDER BY snapshot""".stripMargin

  // mirror of Docket.q64BacklogForecast: identical rate window, the same
  // canonical DIV forms (integer division is not associative — each
  // divisor appears exactly as the Spark expression writes it), and the
  // clamped recurrence as WITH RECURSIVE (the q46 convention for the
  // reference's for-loop)
  private val q64Sql: String = {
    import graft.operators.Docket.{ClosePmPerYear, ForecastMonths}
    s"""WITH RECURSIVE comp AS (
      |  SELECT l_orderkey, MAX(l_shipdate) AS completed FROM lineitem GROUP BY 1
      |), rates AS (
      |  SELECT CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS backlog0,
      |         CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1997-08-01'
      |                        AND CAST(o_orderdate AS DATE) < DATE '1998-08-01'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS arr_yr,
      |         CAST(SUM(CASE WHEN o_orderstatus = 'F'
      |                        AND CAST(completed AS DATE) >= DATE '1997-08-01'
      |                        AND CAST(completed AS DATE) < DATE '1998-08-01'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS res_yr
      |  FROM orders LEFT JOIN comp ON o_orderkey = l_orderkey
      |), r AS (
      |  SELECT 0 AS i, backlog0 AS backlog FROM rates
      |  UNION ALL
      |  SELECT i + 1,
      |         GREATEST(0, backlog
      |           + (arr_yr // 12) * LEAST((i + 1) * 10000 // 12, 10000) // 10000
      |           - res_yr // 12 - backlog * $ClosePmPerYear // 120000)
      |  FROM r, rates WHERE i < $ForecastMonths
      |)
      |SELECT CAST(i AS BIGINT) AS month_idx,
      |       CAST((arr_yr // 12) * LEAST(i * 10000 // 12, 10000) // 10000 AS BIGINT) AS new_requests,
      |       CAST(res_yr // 12 AS BIGINT) AS resolutions,
      |       CAST(backlog AS BIGINT) AS backlog
      |FROM r, rates WHERE i >= 1
      |ORDER BY month_idx""".stripMargin
  }

  // mirror of RangeJoin.q63FteUtilization: same weighted (startd, compd)
  // pair collapse, month-cell explode, greatest/least overlap clipping
  // and guarded integer productivity ratios
  private val q63Sql: String =
    """WITH comp AS (
      |  SELECT l_orderkey, MAX(l_shipdate) AS completed FROM lineitem GROUP BY 1
      |), iv AS (
      |  SELECT CAST(o_orderdate AS DATE) AS startd,
      |         CASE WHEN o_orderstatus = 'F' THEN CAST(completed AS DATE) END AS compd
      |  FROM orders LEFT JOIN comp ON o_orderkey = l_orderkey
      |), pairs AS (
      |  SELECT startd, compd, CAST(COUNT(*) AS BIGINT) AS w,
      |         COALESCE(compd, DATE '2002-06-01') AS endd,
      |         startd + 180 AS probd
      |  FROM iv GROUP BY startd, compd
      |), cells AS (
      |  SELECT startd, endd, probd, w,
      |         CAST(unnest(generate_series(CAST(date_trunc('month', startd) AS DATE),
      |           CAST(date_trunc('month', GREATEST(endd, probd)) AS DATE),
      |           INTERVAL 1 MONTH)) AS DATE) AS m
      |  FROM pairs
      |), ov AS (
      |  SELECT m, w,
      |         GREATEST(0, date_diff('day', GREATEST(startd, m),
      |           LEAST(endd, CAST(m + INTERVAL 1 MONTH AS DATE)))) AS ov_fte,
      |         GREATEST(0, date_diff('day', GREATEST(startd, m),
      |           LEAST(probd, CAST(m + INTERVAL 1 MONTH AS DATE)))) AS ov_prob
      |  FROM cells
      |), fte AS (
      |  SELECT m, CAST(SUM(ov_fte * w) AS BIGINT) AS fte_days,
      |         CAST(SUM(ov_prob * w) AS BIGINT) AS prob_days
      |  FROM ov GROUP BY m
      |), dec AS (
      |  SELECT CAST(date_trunc('month', compd) AS DATE) AS m,
      |         CAST(SUM(w) AS BIGINT) AS n_decisions
      |  FROM pairs WHERE compd IS NOT NULL GROUP BY 1
      |), months AS (
      |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2002-05-01',
      |    INTERVAL 1 MONTH)) AS DATE) AS m
      |), j AS (
      |  SELECT months.m,
      |         CAST(date_diff('day', months.m,
      |           CAST(months.m + INTERVAL 1 MONTH AS DATE)) AS BIGINT) AS days,
      |         COALESCE(fte.fte_days, 0) AS fte_days,
      |         COALESCE(fte.prob_days, 0) AS prob_days,
      |         COALESCE(dec.n_decisions, 0) AS n_decisions
      |  FROM months LEFT JOIN fte ON months.m = fte.m
      |  LEFT JOIN dec ON months.m = dec.m
      |)
      |SELECT CAST(m AS TIMESTAMP) AS month,
      |       CAST(fte_days * 10000 // days AS BIGINT) AS fte_x10000,
      |       CAST(prob_days * 10000 // days AS BIGINT) AS prob_x10000,
      |       CAST(n_decisions AS BIGINT) AS n_decisions,
      |       CAST(CASE WHEN fte_days > 0
      |            THEN n_decisions * days * 10000 // fte_days ELSE 0 END AS BIGINT) AS dpf_x10000,
      |       CAST(CASE WHEN fte_days - prob_days > 0
      |            THEN n_decisions * days * 10000 // (fte_days - prob_days)
      |            ELSE 0 END AS BIGINT) AS adj_dpf_x10000
      |FROM j ORDER BY month""".stripMargin

  // exact mirror of Sketches.q51QuantileSketch — all numeric literals
  // cast to DOUBLE (DuckDB types bare decimals as DECIMAL)
  private val q51Sql: String = {
    def pick(q: String, name: String) =
      s"""SELECT flag, ROUND(CAST(bin AS DOUBLE) * CAST(100.0 AS DOUBLE) + CAST(100.0 AS DOUBLE)
        |           * (target - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE), 4) AS $name
        |  FROM (
        |    SELECT flag, bin, cnt, cum, CAST($q AS DOUBLE) * CAST(n AS DOUBLE) AS target,
        |           ROW_NUMBER() OVER (PARTITION BY flag ORDER BY bin) AS rn
        |    FROM c WHERE CAST(cum AS DOUBLE) >= CAST($q AS DOUBLE) * CAST(n AS DOUBLE)
        |  ) WHERE rn = 1""".stripMargin
    s"""WITH b AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS v,
      |         CAST(FLOOR(l_extendedprice / CAST(100.0 AS DOUBLE)) AS BIGINT) AS bin
      |  FROM lineitem
      |), h AS (
      |  SELECT flag, bin, COUNT(*) AS cnt FROM b GROUP BY flag, bin
      |), c AS (
      |  SELECT flag, bin, cnt,
      |         CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |         CAST(SUM(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n
      |  FROM h
      |), s50 AS (
      |  ${pick("0.5", "p50_sketch")}
      |), s95 AS (
      |  ${pick("0.95", "p95_sketch")}
      |), ex AS (
      |  SELECT flag, COUNT(*) AS n_rows, ROUND(quantile_cont(v, 0.5), 4) AS p50_exact,
      |         ROUND(quantile_cont(v, 0.95), 4) AS p95_exact
      |  FROM b GROUP BY flag
      |)
      |SELECT ex.flag AS flag, n_rows, p50_sketch, p50_exact, p95_sketch, p95_exact
      |FROM ex JOIN s50 ON ex.flag = s50.flag JOIN s95 ON ex.flag = s95.flag
      |ORDER BY flag""".stripMargin
  }

  private val st36Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private val st35Sql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  // st39: the file sink's exactly-once guarantee means the sink
  // directory aggregates to exactly the source-table aggregate
  private val st39Sql: String =
    """SELECT user_id, COUNT(*) AS n_purchases, ROUND(SUM(value), 2) AS sum_value
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** The per-case trace CTE q52 and q55 share — mirrors
    * [[EventLog]]'s caseTraces (one definition on both sides). */
  private val traceCte: String =
    """WITH t AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |         LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events
      |), s AS (
      |  SELECT user_id, event_id, event_type, ts,
      |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM t
      |), g AS (
      |  SELECT user_id, event_id, event_type, ts,
      |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_num
      |  FROM s
      |), tr AS (
      |  SELECT user_id, session_num,
      |         string_agg(event_type, '>' ORDER BY ts, event_id) AS trace
      |  FROM g GROUP BY user_id, session_num
      |)""".stripMargin

  /** q52: q07's sessionization feeding a string_agg trace per session,
    * then trace frequency/coverage ranking — mirrors [[EventLog.q52Traces]].
    */
  private val q52Sql: String =
    s"""$traceCte, f AS (
      |  SELECT trace, COUNT(*) AS n_cases FROM tr GROUP BY trace
      |), r AS (
      |  SELECT trace, n_cases,
      |         SUM(n_cases) OVER () AS total,
      |         SUM(n_cases) OVER (ORDER BY n_cases DESC, trace
      |                            ROWS UNBOUNDED PRECEDING) AS cum_n,
      |         ROW_NUMBER() OVER (ORDER BY n_cases DESC, trace) AS rnk
      |  FROM f
      |)
      |SELECT rnk, trace, n_cases,
      |       ROUND(CAST(n_cases AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage,
      |       ROUND(CAST(cum_n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_coverage
      |FROM r WHERE rnk <= 88
      |ORDER BY rnk""".stripMargin

  /** q55: conformance classification against the top-K trace variants —
    * mirrors [[EventLog.q55Conformance]] (same trace CTE, same
    * tie-breaks, same prefix rule).
    */
  private val q55Sql: String = {
    val k = EventLog.ConformanceTopK
    val p = EventLog.ConformancePrefix
    s"""$traceCte, ref AS (
      |  SELECT trace AS ref_trace FROM (
      |    SELECT trace, COUNT(*) AS n FROM tr GROUP BY trace
      |    ORDER BY n DESC, trace LIMIT $k
      |  )
      |), refp AS (
      |  SELECT DISTINCT array_to_string((string_split(ref_trace, '>'))[1:$p], '>') AS ref_prefix
      |  FROM ref
      |), c AS (
      |  SELECT tr.trace,
      |         CASE WHEN ref.ref_trace IS NOT NULL THEN 'conformant'
      |              WHEN refp.ref_prefix IS NOT NULL THEN 'prefix_only'
      |              ELSE 'deviant' END AS status
      |  FROM tr
      |  LEFT JOIN ref ON tr.trace = ref.ref_trace
      |  LEFT JOIN refp ON array_to_string((string_split(tr.trace, '>'))[1:$p], '>') = refp.ref_prefix
      |), agg AS (
      |  SELECT status, COUNT(*) AS n_cases,
      |         COUNT(DISTINCT trace) AS n_distinct_traces
      |  FROM c GROUP BY status
      |)
      |SELECT status, n_cases, n_distinct_traces,
      |       CAST(n_cases * 10000 // SUM(n_cases) OVER () AS BIGINT) AS share_pm
      |FROM agg
      |ORDER BY status""".stripMargin
  }

  /** The per-session lead/lag grain q62 and st42 both derive edges
    * from, and the shared edge-rollup tail — mirrors
    * [[EventLog.aggregateEdges]] (one definition on both sides). */
  private val sgCte: String =
    """, sg AS (
      |  SELECT user_id, session_num, event_type AS act,
      |         epoch_us(ts) AS us,
      |         LEAD(event_type) OVER w AS nxt,
      |         LEAD(epoch_us(ts)) OVER w AS nxt_us,
      |         LAG(event_type) OVER w AS prv
      |  FROM g
      |  WINDOW w AS (PARTITION BY user_id, session_num ORDER BY ts, event_id)
      |)""".stripMargin

  private val edgeAggTail: String =
    """, a AS (
      |  SELECT from_act, to_act, CAST(COUNT(*) AS BIGINT) AS n_obs,
      |         CAST(COUNT(DISTINCT (user_id, session_num)) AS BIGINT) AS n_cases,
      |         SUM(gap_us) AS gap_sum
      |  FROM edges GROUP BY from_act, to_act
      |)
      |SELECT from_act, to_act, n_obs, n_cases,
      |       CAST(n_obs * 10000 // SUM(n_obs) OVER (PARTITION BY from_act) AS BIGINT) AS share_out_pm,
      |       CAST(gap_sum // n_obs // 1000000 AS BIGINT) AS mean_gap_s
      |FROM a
      |ORDER BY from_act, to_act""".stripMargin

  /** q62: directly-follows process-map edges — mirrors
    * [[EventLog.q62Transitions]] (same session CTE `g`, same virtual
    * START/END edges, same integer share/gap arithmetic). */
  private val q62Sql: String =
    s"""$traceCte$sgCte, edges AS (
      |  SELECT user_id, session_num, 'START' AS from_act, act AS to_act,
      |         CAST(NULL AS BIGINT) AS gap_us
      |  FROM sg WHERE prv IS NULL
      |  UNION ALL
      |  SELECT user_id, session_num, act, COALESCE(nxt, 'END'),
      |         nxt_us - us
      |  FROM sg
      |)$edgeAggTail""".stripMargin

  /** st42: q62's edges minus each user's trailing-session END edge (the
    * open session cannot close in append mode) — mirrors
    * [[graft.streaming.Streams.st42StreamTransitions]]'s contract. */
  private val st42Sql: String =
    s"""$traceCte$sgCte, mx AS (
      |  SELECT user_id, MAX(session_num) AS mxs FROM sg GROUP BY user_id
      |), edges AS (
      |  SELECT user_id, session_num, 'START' AS from_act, act AS to_act,
      |         CAST(NULL AS BIGINT) AS gap_us
      |  FROM sg WHERE prv IS NULL
      |  UNION ALL
      |  SELECT user_id, session_num, act, nxt, nxt_us - us
      |  FROM sg WHERE nxt IS NOT NULL
      |  UNION ALL
      |  SELECT sg.user_id, sg.session_num, act, 'END', CAST(NULL AS BIGINT)
      |  FROM sg JOIN mx ON sg.user_id = mx.user_id
      |  WHERE nxt IS NULL AND sg.session_num < mx.mxs
      |)$edgeAggTail""".stripMargin

  /** q53: Aalen-Johansen competing-risks CIF with delayed entry —
    * mirrors [[Survival.q53CompetingRisks]].
    */
  private val q53Sql: String =
    """WITH comp AS (
      |  SELECT l_orderkey, MAX(l_shipdate) AS completed FROM lineitem GROUP BY l_orderkey
      |), obs0 AS (
      |  SELECT CAST(o_orderdate AS DATE) AS birth,
      |         CASE WHEN o_orderstatus = 'F' THEN CAST(completed AS DATE) END AS evdate,
      |         CASE WHEN o_orderstatus <> 'F' THEN 'censor'
      |              WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'expedited'
      |              ELSE 'normal' END AS state
      |  FROM orders LEFT JOIN comp ON o_orderkey = l_orderkey
      |), obs AS (
      |  SELECT GREATEST(0, date_diff('day', birth, DATE '1995-01-01')) AS age_enter,
      |         COALESCE(date_diff('day', birth, evdate),
      |                  date_diff('day', birth, DATE '2002-06-01')) AS age_exit,
      |         state
      |  FROM obs0
      |  WHERE COALESCE(date_diff('day', birth, evdate),
      |                 date_diff('day', birth, DATE '2002-06-01')) >
      |        GREATEST(0, date_diff('day', birth, DATE '1995-01-01'))
      |), ent AS (
      |  SELECT age_enter AS t, COUNT(*) AS n_ent FROM obs GROUP BY age_enter
      |), ex AS (
      |  SELECT age_exit AS t,
      |         CAST(SUM(CASE WHEN state='expedited' THEN 1 ELSE 0 END) AS BIGINT) AS d_expedited,
      |         CAST(SUM(CASE WHEN state='normal' THEN 1 ELSE 0 END) AS BIGINT) AS d_normal,
      |         CAST(SUM(CASE WHEN state='censor' THEN 1 ELSE 0 END) AS BIGINT) AS n_censored,
      |         COUNT(*) AS n_exit
      |  FROM obs GROUP BY age_exit
      |), grid AS (
      |  SELECT COALESCE(ent.t, ex.t) AS t,
      |         COALESCE(n_ent, 0) AS n_ent,
      |         COALESCE(d_expedited, 0) AS d_expedited,
      |         COALESCE(d_normal, 0) AS d_normal,
      |         COALESCE(n_censored, 0) AS n_censored,
      |         COALESCE(n_exit, 0) AS n_exit
      |  FROM ent FULL JOIN ex ON ent.t = ex.t
      |), r AS (
      |  SELECT *,
      |    CAST(COALESCE(SUM(n_ent) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |       - COALESCE(SUM(n_exit) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk,
      |    d_expedited + d_normal AS d_tot
      |  FROM grid
      |), f AS (
      |  SELECT *,
      |    CASE WHEN d_tot > 0
      |         THEN GREATEST(CAST(n_risk - d_tot AS DOUBLE) / CAST(n_risk AS DOUBLE), CAST(1e-300 AS DOUBLE))
      |         ELSE CAST(1.0 AS DOUBLE) END AS factor
      |  FROM r
      |), s AS (
      |  SELECT *,
      |    EXP(SUM(LN(factor)) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) AS surv
      |  FROM f
      |), s2 AS (
      |  SELECT *, COALESCE(LAG(surv) OVER (ORDER BY t), CAST(1.0 AS DOUBLE)) AS surv_prev FROM s
      |), c AS (
      |  SELECT *,
      |    SUM(CASE WHEN d_tot > 0 THEN surv_prev * CAST(d_expedited AS DOUBLE) / CAST(n_risk AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
      |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cif_expedited,
      |    SUM(CASE WHEN d_tot > 0 THEN surv_prev * CAST(d_normal AS DOUBLE) / CAST(n_risk AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
      |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cif_normal
      |  FROM s2
      |)
      |SELECT t AS t_days, n_risk, d_expedited, d_normal, n_censored,
      |       ROUND(surv, 6) AS surv,
      |       ROUND(cif_expedited, 6) AS cif_expedited,
      |       ROUND(cif_normal, 6) AS cif_normal
      |FROM c WHERE n_exit > 0
      |ORDER BY t_days""".stripMargin

  /** q54: candidate-set merge disambiguation — mirrors
    * [[Linking.q54MergeDisambiguation]].
    */
  private val q54Sql: String =
    """WITH cats AS (
      |  SELECT l_orderkey, list(p_brand) AS cats
      |  FROM (SELECT DISTINCT l_orderkey, p_brand FROM lineitem JOIN part ON l_partkey = p_partkey)
      |  GROUP BY l_orderkey
      |), apps AS (
      |  SELECT o_orderkey AS key, o_custkey AS cust,
      |         year(CAST(o_orderdate AS DATE)) AS yr,
      |         COALESCE(cats, []) AS cats
      |  FROM orders LEFT JOIN cats ON o_orderkey = l_orderkey
      |), pairs AS (
      |  SELECT c.key AS child_key, p.key AS p_key,
      |         CASE WHEN p.key IS NOT NULL AND len(list_intersect(c.cats, p.cats)) > 0
      |              THEN 1 ELSE 0 END AS overlap
      |  FROM apps c LEFT JOIN apps p ON c.cust = p.cust AND p.yr = c.yr - 1
      |), v AS (
      |  SELECT child_key,
      |         COUNT(p_key) AS n_cand,
      |         MIN(p_key) AS cand_single,
      |         CAST(SUM(overlap) AS BIGINT) AS n_overlap,
      |         MIN(CASE WHEN overlap = 1 THEN p_key END) AS overlap_single
      |  FROM pairs GROUP BY child_key
      |)
      |SELECT child_key,
      |       CASE WHEN n_cand = 0 THEN 'error_missingpriordec'
      |            WHEN n_cand = 1 THEN 'match_priordec'
      |            WHEN n_overlap = 1 THEN 'match_issues'
      |            WHEN n_overlap > 1 THEN 'error_multipleissuecandidates'
      |            ELSE 'error_noissuecandidate' END AS status,
      |       CASE WHEN n_cand = 1 THEN cand_single
      |            WHEN n_overlap = 1 THEN overlap_single END AS parent
      |FROM v ORDER BY child_key""".stripMargin

  /** q56: docket-position wait-time prediction — mirrors
    * [[Docket.q56DocketWait]] expression-for-expression. The unrolled
    * fixpoint is generated by the same step template on both sides, and
    * the FP operation TREE is mirrored exactly (expAdv computed as
    * adv − expAct, then (adv − expAdv) re-derived from it, never
    * simplified to expAct) so both engines produce bit-identical doubles
    * before the final ROUND. The Weibull 1.5 exponent is u·√u on both
    * sides — `*`/`sqrt` are correctly-rounded IEEE-754 everywhere,
    * unlike pow. */
  private val q56Sql: String = {
    import Docket.{PredDate, OutcodeLagDays, WeibullScaleDays, DocketMargin,
      AdvWithdrawnRate, OrigAttritionRate, FixpointSteps}
    val pred = s"DATE '$PredDate'"
    val lag = OutcodeLagDays.toDouble
    def weib(y: String): String =
      s"(1.0 - exp(-((GREATEST($y, 0.0) / $WeibullScaleDays) * sqrt(GREATEST($y, 0.0) / $WeibullScaleDays))))"
    val carry = "docket_month, ahead_cnt, orig_cnt, adv_cnt, rem_cnt, " +
      "ahead_d, orig_d, adv_d, rem_d, rate_total, rem_steady, initial_t"
    // one fixpoint refinement: expected advance activations at t (Weibull
    // fold over prior docket months), remand interpolation, balance eqn
    def step(i: Int): String = {
      val t = s"t${i - 1}"
      val w0 = weib("b.age")
      s""", e$i AS (
         |  SELECT p.*,
         |         (SELECT COALESCE(SUM(b.n * ((${weib(s"b.age + p.$t")} - $w0) / (1.0 - $w0))), 0.0)
         |          FROM bym b WHERE b.docket_month < p.docket_month) AS ea
         |  FROM s${i - 1} p
         |), s$i AS (
         |  SELECT $carry,
         |         GREATEST(0.0, (ahead_d - (adv_d - ea)
         |            - (adv_d - (adv_d - ea)) * $AdvWithdrawnRate
         |            - orig_d * $OrigAttritionRate
         |            - (rem_steady * LEAST(GREATEST($t / $lag, 0.0), 1.0)
         |               + rem_d * (1.0 - LEAST(GREATEST($t / $lag, 0.0), 1.0)))
         |            - $DocketMargin) / rate_total) AS t$i
         |  FROM e$i
         |)""".stripMargin
    }
    s"""WITH comp AS (
       |  SELECT l_orderkey, MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
       |  FROM lineitem GROUP BY l_orderkey
       |), cs AS (
       |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS docket_month,
       |         (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS orig,
       |         CASE WHEN o_orderstatus = 'F' THEN CAST(last_ship AS DATE) END AS decision_date,
       |         CAST(first_ship AS DATE) AS activation_date
       |  FROM orders LEFT JOIN comp ON o_orderkey = l_orderkey
       |), fl AS (
       |  SELECT docket_month, orig, decision_date,
       |         (decision_date IS NULL OR decision_date >= $pred) AS pending,
       |         (decision_date IS NULL OR decision_date >= ($pred - $OutcodeLagDays)) AS ahead_eligible,
       |         (decision_date IS NOT NULL AND decision_date < $pred
       |            AND decision_date >= ($pred - $OutcodeLagDays)) AS rempool,
       |         (orig AND (decision_date IS NULL OR decision_date >= $pred)
       |            AND (activation_date IS NULL OR activation_date >= $pred)) AS adv
       |  FROM cs
       |), bymonth AS (
       |  SELECT docket_month,
       |         COUNT(*) FILTER (WHERE ahead_eligible) AS n_ahead,
       |         COUNT(*) FILTER (WHERE ahead_eligible AND orig AND pending) AS n_orig,
       |         COUNT(*) FILTER (WHERE adv) AS n_adv,
       |         COUNT(*) FILTER (WHERE rempool) AS n_rem,
       |         COUNT(*) FILTER (WHERE decision_date >= ($pred - 365) AND decision_date < $pred) AS n_dec_trailing
       |  FROM fl GROUP BY docket_month
       |), rates AS (
       |  SELECT CAST(SUM(n_dec_trailing) AS DOUBLE) / 365.0 AS rate_total FROM bymonth
       |), bym AS (
       |  SELECT docket_month,
       |         CAST(date_diff('day', docket_month, $pred) AS DOUBLE) AS age,
       |         CAST(n_adv AS DOUBLE) AS n
       |  FROM bymonth
       |), coh AS (
       |  SELECT docket_month,
       |         COALESCE(CAST(SUM(n_ahead) OVER w AS BIGINT), 0) AS ahead_cnt,
       |         COALESCE(CAST(SUM(n_orig) OVER w AS BIGINT), 0) AS orig_cnt,
       |         COALESCE(CAST(SUM(n_adv) OVER w AS BIGINT), 0) AS adv_cnt,
       |         COALESCE(CAST(SUM(n_rem) OVER w AS BIGINT), 0) AS rem_cnt
       |  FROM bymonth
       |  WHERE docket_month <= $pred
       |  WINDOW w AS (ORDER BY docket_month ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), s0 AS (
       |  SELECT c.docket_month, c.ahead_cnt, c.orig_cnt, c.adv_cnt, c.rem_cnt,
       |         CAST(c.ahead_cnt AS DOUBLE) AS ahead_d,
       |         CAST(c.orig_cnt AS DOUBLE) AS orig_d,
       |         CAST(c.adv_cnt AS DOUBLE) AS adv_d,
       |         CAST(c.rem_cnt AS DOUBLE) AS rem_d,
       |         r.rate_total,
       |         r.rate_total * $lag AS rem_steady,
       |         (CAST(c.ahead_cnt AS DOUBLE) - CAST(c.adv_cnt AS DOUBLE)
       |            - r.rate_total * $lag - $DocketMargin) / r.rate_total AS initial_t,
       |         GREATEST(0.0, (CAST(c.ahead_cnt AS DOUBLE) - CAST(c.adv_cnt AS DOUBLE)
       |            - r.rate_total * $lag - $DocketMargin) / r.rate_total) AS t0
       |  FROM coh c CROSS JOIN rates r
       |)${(1 to FixpointSteps).map(step).mkString}
       |SELECT CAST(docket_month AS TIMESTAMP) AS docket_month,
       |       ahead_cnt, orig_cnt, adv_cnt, rem_cnt,
       |       ROUND(initial_t, 4) AS initial_t,
       |       ROUND(t$FixpointSteps, 4) AS final_t,
       |       CAST($pred + CAST(ROUND(t$FixpointSteps) AS INT) AS TIMESTAMP) AS predicted_date
       |FROM s$FixpointSteps
       |ORDER BY docket_month""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q56_docket_wait"   -> q56Sql,
    "q46_chain_resolve" -> q46Sql,
    "q52_traces"        -> q52Sql,
    "q55_conformance"   -> q55Sql,
    "q62_transitions"   -> q62Sql,
    "st42_stream_transitions" -> st42Sql,
    "q53_competing_risks" -> q53Sql,
    "q54_merge_disambiguation" -> q54Sql,
    "q47_param_unpivot" -> q47Sql,
    "q48_self_dim_join" -> q48Sql,
    "q49_hll_sketch"    -> q49Sql,
    "q61_sliding_distinct" -> q61Sql,
    "q69_incr_rollup" -> q69Sql,
    // st46's drained cell state IS q69's merged state (shared projection
    // + report definitions) — one oracle, the st43/st44/st45 device
    "st46_stream_rollup" -> q69Sql,
    "q50_snapshot_ages" -> q50Sql,
    "q63_fte_utilization" -> q63Sql,
    "q64_backlog_forecast" -> q64Sql,
    "q51_quantile_sketch" -> q51Sql,
    "m33_frame_sample"  -> m33Sql,
    "st35_stream_dedup" -> st35Sql,
    "st36_stream_static_join" -> st36Sql,
    "st39_stream_file_sink" -> st39Sql
  )
}
