package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.criteria.Criteria

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * scale-path extension), expressed Spark-first; [[oracleSql]] carries
  * the DuckDB-equivalent SQL the driver uses as a correctness oracle
  * on the same parquet tables. Both sides alias result columns
  * identically and pin a deterministic total ordering (SURVEY.md §7.5
  * item 4 — `LIMIT`/`collect_list`/tie nondeterminism would otherwise
  * break the hash compare).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship threshold alert (alerts/an_alert.yml):
    * Presto criteria rewritten by the dialect shim, group-counted by
    * the aggregation key, threshold-filtered.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_threshold_trigger")(spark, "/root/testdata/sf0.001")

  import SparkEntryRegistry.Q

  private def registry: Seq[Q] = {
    val all = coreQueries ++ QueriesAlert.registry ++
      QueriesPipeline.registry ++ QueriesTpchFull.registry ++
      QueriesExt.registry
    // a duplicate name would silently shadow a query AND its oracle
    // check — the correctness gate would shrink with no signal
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  // ----------------------------------------------------------------------
  // Core relational surface: scan/filter/pushdown, aggregation, joins,
  // ordering — the query layer the reference delegates to Athena
  // (SURVEY.md §2.2, §2.9). These double as the benchmark headliners.
  // ----------------------------------------------------------------------

  private def coreQueries: Seq[Q] = Seq(
    // S1+§2.2: scan + envelope predicate + projection. Filter and the
    // 2-column projection must reach the parquet scan (PushedFilters).
    Q("q02_filter_pushdown",
      (s, dir) => Tables(s, dir, "events")
        .where(col("event_type") === "purchase" && col("value") > 150)
        .select(col("event_id"), col("user_id"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id FROM events
             |WHERE event_type = 'purchase' AND value > 150
             |ORDER BY event_id""".stripMargin)),

    // G1/O1 at TPC-H shape: full-scan hash aggregate with map-side
    // partial aggregation; decimal-exact sums so the hash compare is
    // order-independent.
    Q("q01_pricing_agg",
      (s, dir) => Tables(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          // cast each factor to decimal BEFORE multiplying: decimal
          // arithmetic is exact, so Spark's half-up vs DuckDB's
          // half-even double→decimal rounding never gets a midpoint.
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS count_order,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // §2.9 scale path: 3-way join. customer is small → broadcast; the
    // orders⋈lineitem side shuffles on the join key once.
    Q("q03_join_agg",
      (s, dir) => {
        val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = Tables(s, dir, "orders")
          .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("o_orderpriority")
          .agg(
            countDistinct("o_orderkey").as("order_count"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
                (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("double").as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  COUNT(DISTINCT o_orderkey) AS order_count,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Broadcast-dim join: part is a classic small dimension — at 100 TB
    // the fact side never shuffles for this join.
    Q("q04_broadcast_join",
      (s, dir) => {
        val p = Tables(s, dir, "part").where(col("p_size") <= 10)
        Tables(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size <= 10
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin)),

    // O1-O4 / window functions: top-3 events per user by value with a
    // deterministic tie-break — rank inside the shuffle partition of
    // the user key, no global sort until the final (small) output.
    Q("q11_window_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("user_id", "rn", "event_id", "value")
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, rn, event_id, value FROM (
             |  SELECT user_id, event_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             |  FROM events) t
             |WHERE rn <= 3
             |ORDER BY user_id, rn""".stripMargin)),
  )
}
