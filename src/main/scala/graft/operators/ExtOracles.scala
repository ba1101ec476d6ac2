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
      |              WHEN o_orderkey % 1000 = 555 THEN o_orderkey - 1 + 10000000
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

  val sql: Map[String, String] = Map(
    "q46_chain_resolve" -> q46Sql,
    "q47_param_unpivot" -> q47Sql,
    "q48_self_dim_join" -> q48Sql
  )
}
