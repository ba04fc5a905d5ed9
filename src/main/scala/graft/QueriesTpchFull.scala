package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The four TPC-H shapes (Q2, Q9, Q11, Q20) that need the `partsupp`
  * table the synthetic schema omits — completed here over a DERIVED
  * partsupp: the distinct `(l_partkey, l_suppkey)` pairs actually
  * present in lineitem, with `ps_availqty` / `ps_supplycost` produced
  * by pure integer arithmetic on the two keys. The derivation is the
  * same SQL text on both engines, so the DuckDB oracle re-derives the
  * identical table — nothing is materialized, nothing random.
  *
  * Why distinct-pairs rather than the spec's 4-suppliers-per-part
  * layout: the synthetic lineitem draws `l_suppkey` uniformly, so a
  * 4-row partsupp would void the Q9/Q20 `(partkey, suppkey)` equi-join
  * that gives these queries their shape. Distinct-pairs keeps every
  * lineitem row joinable — the TPC-H invariant that matters to the
  * plan — at ~`min(parts×supps, |lineitem|)` rows, still dimension-
  * sized next to the fact table.
  *
  * Determinism contract (same as the other 18 shapes): money in exact
  * integer cents (`round(x*100)` before any arithmetic), quantities
  * as BIGINT, every aggregate integer — the hash compare never sees a
  * float. All four shapes keep their canonical plan: Q2 min-cost
  * per-part join back on the min, Q9 multi-dim fact join rolled up to
  * (nation, year), Q11 group + scalar-subquery threshold, Q20
  * semi-join chain into a supplier projection.
  *
  * Scale notes (100 TB): the derived partsupp is a `distinct` over
  * lineitem's two key columns — one shuffle on exactly the key the
  * downstream join needs, so AQE reuses the partitioning; at real
  * scale partsupp is a stored dimension and the CTE disappears. Q2 /
  * Q11 / Q20 operate on dimension-sized inputs (supplier, part,
  * partsupp) with region/nation prunes broadcast down the chain; Q9
  * is the one fact-sized join (lineitem → partsupp on the composite
  * key) and groups to a tiny (nation, year) grid, so partial
  * aggregation collapses the shuffle.
  */
private[graft] object QueriesTpchFull {
  import SparkEntryRegistry.Q

  /** Shared `WITH partsupp AS (...)` prefix — one source of truth for
    * the derivation in all four queries (and their oracles, which are
    * the same text). availqty in 1..50 so Q20's stock-vs-shipped
    * comparison has both outcomes on this corpus; supplycost in exact
    * cents 100..100099.
    */
  private[graft] val PartsuppCte =
    """partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST((ps_partkey * 7 + ps_suppkey * 11) % 50 + 1 AS BIGINT)
      |      AS ps_availqty,
      |    CAST((ps_partkey * 13 + ps_suppkey * 17) % 100000 + 100
      |      AS BIGINT) AS ps_supplycost_c
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
      |          l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  /** TPC-H Q2 shape (min-cost supplier): for every EUROPE-supplied
    * part of the target size/type, the supplier(s) achieving the
    * regional minimum supply cost. The min is computed once per part
    * (group), then joined back — not a correlated re-scan.
    */
  private val TpchQ2Sql =
    s"""WITH $PartsuppCte,
      |eu AS (SELECT n.n_nationkey, n.n_name FROM nation n
      |  JOIN region r ON r.r_regionkey = n.n_regionkey
      |    AND r.r_name = 'EUROPE'),
      |sp AS (SELECT ps.ps_partkey, ps.ps_supplycost_c,
      |    s.s_suppkey, s.s_name, s.s_acctbal, eu.n_name
      |  FROM partsupp ps
      |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      |  JOIN eu ON eu.n_nationkey = s.s_nationkey),
      |mn AS (SELECT ps_partkey, MIN(ps_supplycost_c) AS min_cost_c
      |  FROM sp GROUP BY ps_partkey)
      |SELECT CAST(round(sp.s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
      |  sp.s_name AS s_name, sp.n_name AS n_name,
      |  p.p_partkey AS p_partkey,
      |  sp.ps_supplycost_c AS ps_supplycost_c
      |FROM sp
      |JOIN mn ON mn.ps_partkey = sp.ps_partkey
      |  AND sp.ps_supplycost_c = mn.min_cost_c
      |JOIN part p ON p.p_partkey = sp.ps_partkey
      |WHERE p.p_size = 15 AND p.p_type = 'SMALL'
      |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 shape (product-type profit): every 'bolt' lineitem's
    * revenue minus its supply cost, rolled up to (supplier nation,
    * order year). Profit in cents·pct so revenue (cents × pct) and
    * cost (cents × 100 × qty) share a unit and stay integer-exact.
    */
  private val TpchQ9Sql =
    s"""WITH $PartsuppCte,
      |pr AS (SELECT n.n_name AS nation,
      |    year(o.o_orderdate) AS o_year,
      |    CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(round(l.l_discount * 100) AS BIGINT)) -
      |      ps.ps_supplycost_c * 100 *
      |      CAST(round(l.l_quantity) AS BIGINT) AS amount_c_pct
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |    AND p.p_name LIKE '%bolt%'
      |  JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
      |    AND ps.ps_suppkey = l.l_suppkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey)
      |SELECT nation, o_year,
      |  CAST(SUM(amount_c_pct) AS BIGINT) AS profit_c_pct
      |FROM pr GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 shape (important stock): per-part inventory value held
    * by NATION_7's suppliers, kept where the part's value exceeds
    * 1/2000 of the nation total — the scalar-subquery threshold is
    * computed once and broadcast, not re-evaluated per row.
    */
  private val TpchQ11Sql =
    s"""WITH $PartsuppCte,
      |sv AS (SELECT ps.ps_partkey,
      |    CAST(SUM(ps.ps_supplycost_c * ps.ps_availqty) AS BIGINT)
      |      AS value_c
      |  FROM partsupp ps
      |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |    AND n.n_name = 'NATION_7'
      |  GROUP BY ps.ps_partkey),
      |tot AS (SELECT CAST(SUM(value_c) AS BIGINT) AS t FROM sv)
      |SELECT sv.ps_partkey AS ps_partkey, sv.value_c AS value_c
      |FROM sv, tot
      |WHERE sv.value_c * 2000 > tot.t
      |ORDER BY value_c DESC, ps_partkey""".stripMargin

  /** TPC-H Q20 shape (potential part promotion): suppliers in the
    * target nations whose stock of some 'red' part exceeds half of
    * what they shipped of it in 1996 — a three-step semi-join chain
    * (part prune → shipped-qty aggregate → availqty compare) that
    * never widens beyond partsupp.
    */
  private val TpchQ20Sql =
    s"""WITH $PartsuppCte,
      |sq AS (SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
      |      AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |pk AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      |ag AS (SELECT DISTINCT ps.ps_suppkey FROM partsupp ps
      |  JOIN pk ON pk.p_partkey = ps.ps_partkey
      |  JOIN sq ON sq.l_partkey = ps.ps_partkey
      |    AND sq.l_suppkey = ps.ps_suppkey
      |  WHERE ps.ps_availqty * 2 > sq.qty)
      |SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
      |  n.n_name AS n_name
      |FROM supplier s
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  AND n.n_name IN ('NATION_3', 'NATION_8')
      |WHERE s.s_suppkey IN (SELECT ps_suppkey FROM ag)
      |ORDER BY s_suppkey""".stripMargin

  private def sqlQuery(sql: String, tables: Seq[String])(
      s: SparkSession, dir: String): DataFrame = {
    tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    s.sql(sql)
  }

  def registry: Seq[Q] = Seq(
    Q("q297_tpch_q2",
      sqlQuery(TpchQ2Sql,
        Seq("lineitem", "part", "supplier", "nation", "region")) _,
      Some(TpchQ2Sql)),
    Q("q298_tpch_q9",
      sqlQuery(TpchQ9Sql,
        Seq("lineitem", "part", "supplier", "nation", "orders")) _,
      Some(TpchQ9Sql)),
    Q("q299_tpch_q11",
      sqlQuery(TpchQ11Sql, Seq("lineitem", "supplier", "nation")) _,
      Some(TpchQ11Sql)),
    Q("q300_tpch_q20",
      sqlQuery(TpchQ20Sql,
        Seq("lineitem", "part", "supplier", "nation")) _,
      Some(TpchQ20Sql)))
}
