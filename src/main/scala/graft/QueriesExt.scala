package graft

import org.apache.spark.sql.functions._

import graft.ops.{Stats, TextAnalysis}

/** Round-4 extension registry (q301+): operators added after the
  * QueriesPipeline file reached review-hostile size. Same contract as
  * every other registry — Spark-first implementation + a full DuckDB
  * oracle restating the arithmetic, column names aliased identically
  * on both sides, deterministic total ordering.
  */
private[graft] object QueriesExt {
  import SparkEntryRegistry.Q

  def registry: Seq[Q] = Seq(
    // Distributed suffix-array construction (prefix doubling: ⌈log₂
    // maxLen⌉ per-doc window rounds, no joins) — the index behind
    // exact duplicated-span mining at corpus scale. Oracle sorts the
    // suffixes directly (row_number over substr) and checks the
    // per-doc Σ pos·rank checksum, which pins every rank.
    Q("q301_suffix_array",
      (s, dir) => TextAnalysis.suffixArrayChecksum(
        Tables(s, dir, "documents"), maxLen = 600),
      Some("""WITH p AS (SELECT doc_id, substr(text, 1, 600) AS t
             |  FROM documents
             |  WHERE text IS NOT NULL AND length(text) > 0),
             |s AS (SELECT doc_id, pos,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY substr(t, pos)) AS rank
             |  FROM (SELECT doc_id, t,
             |      unnest(range(1, length(t) + 1)) AS pos FROM p))
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_suffixes,
             |  CAST(SUM(pos * rank) AS BIGINT) AS rank_checksum
             |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Matrix-profile-lite on the hourly count series: nearest
    // non-overlapping window by exact integer dist² (motif/discord
    // primitive). The data-sized work is one combinable hourly
    // aggregate; the profile runs on the span-bounded series.
    Q("q302_matrix_profile",
      (s, dir) => Stats.matrixProfile(Tables(s, dir, "events")),
      Some("""WITH c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             |    CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |sp AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM c),
             |g AS (SELECT unnest(range(sp.h0, sp.h1 + 1)) AS h,
             |    sp.h0 AS h0 FROM sp),
             |se AS (SELECT g.h - g.h0 AS s, COALESCE(c.y, 0) AS y
             |  FROM g LEFT JOIN c ON c.h = g.h),
             |n AS (SELECT MAX(s) AS smax FROM se),
             |wv AS (SELECT a.s AS s, b.s - a.s AS off, b.y AS y
             |  FROM se a JOIN se b ON b.s - a.s BETWEEN 0 AND 23
             |  WHERE a.s <= (SELECT smax FROM n) - 23),
             |p AS (SELECT x.s AS s, y.s AS s2,
             |    CAST(SUM((x.y - y.y) * (x.y - y.y)) AS BIGINT) AS d2
             |  FROM wv x JOIN wv y
             |    ON x.off = y.off AND abs(x.s - y.s) >= 24
             |  GROUP BY 1, 2),
             |r AS (SELECT s, s2, d2, ROW_NUMBER() OVER
             |    (PARTITION BY s ORDER BY d2, s2) AS rn FROM p)
             |SELECT s, d2 AS dist2, s2 AS nn FROM r WHERE rn = 1
             |ORDER BY s""".stripMargin)),

    // Gini concentration of spend per contributor within each event
    // type — the inequality summary beside q176's HHI, exact to the
    // ppm on cent totals.
    Q("q303_gini",
      (s, dir) => Stats.giniConcentration(Tables(s, dir, "events")),
      Some("""WITH per AS (SELECT event_type AS grp, user_id AS k,
             |    CAST(SUM(CAST(round(value * 100) AS BIGINT))
             |      AS BIGINT) AS xc
             |  FROM events
             |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |r AS (SELECT grp, xc, CAST(ROW_NUMBER() OVER
             |    (PARTITION BY grp ORDER BY xc, k) AS BIGINT) AS i
             |  FROM per)
             |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(xc) AS BIGINT) AS total_c,
             |  CAST((2 * SUM(i * xc) - (COUNT(*) + 1) * SUM(xc))
             |    * 1000000 // NULLIF(COUNT(*) * SUM(xc), 0) AS BIGINT)
             |    AS gini_ppm
             |FROM r GROUP BY grp ORDER BY grp""".stripMargin)))
}
