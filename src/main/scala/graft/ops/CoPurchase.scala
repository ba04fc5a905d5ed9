package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared, materialized-once co-purchase graph.
  *
  * Nine registered graph queries (PageRank, triangles, clustering
  * coefficient, label propagation, k-core, k-truss, link prediction,
  * PPR) analyze the same derived graph: parts are nodes, an edge
  * joins two parts that share a lineitem order. Re-deriving the ~1M
  * edge self-join from the fact table per query is correct but pays
  * the derivation N times per run — at 100 TB the derived graph is a
  * lake asset you materialize ONCE (one shuffle over the fact table)
  * and every downstream algorithm scans the compact edge parquet
  * instead of the fact table (the same persisted-artifact story as
  * [[Ivf.buildIndex]]'s q36 index).
  *
  * Only the canonical u<v distinct edge set is persisted — the
  * both-orientations view is a cheap union-flip on read, never a
  * second derivation. Keyed by the sf-dir tag; computeIfAbsent makes
  * concurrent first callers of one tag build exactly once.
  *
  * Semantics: every consumer ([[Graph]] ops) dedupes its input edge
  * set internally, so handing it the pre-distincted shared set is
  * result-identical to each query's inline derivation — the oracles
  * (all of which restate `DISTINCT` edges) are unchanged.
  */
object CoPurchase {

  /** Per-JVM scratch root (same contract as the query registry's
    * lakeRoot: two concurrent processes must not race on one
    * overwrite path; removed on JVM exit).
    */
  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_").toFile
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(dir)
    }
    dir.getAbsolutePath
  }

  private val paths = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def materialize(key: String)(build: => DataFrame): String =
    paths.computeIfAbsent(key, _ => {
      val p = s"$root/$key"
      build.write.mode("overwrite").parquet(p)
      p
    })

  /** Cache tag: basename + a hash of the CANONICAL path, so two sf
    * dirs that share a basename (/a/sf1 vs /b/sf1) never alias to one
    * cached graph in the same JVM. Basename kept for debuggability.
    */
  private def tag(dir: String): String = {
    val f = new java.io.File(dir)
    val canon = scala.util.Try(f.getCanonicalPath)
      .getOrElse(f.getAbsolutePath)
    f"${f.getName}_${canon.hashCode & 0x7fffffff}%08x"
  }

  /** Canonical undirected co-purchase edges (src < dst, distinct)
    * over the whole part catalog — derived once per sf dir, then a
    * parquet scan.
    */
  def undirected(s: SparkSession, dir: String): DataFrame = {
    val p = materialize(s"und_${tag(dir)}") {
      val li = graft.Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst"))
        .distinct()
    }
    graft.Tables.readCachedSchema(s, p)
  }

  /** Both-orientations view (src <> dst, distinct): the persisted
    * canonical set plus its flip — no second fact-table pass.
    */
  def directed(s: SparkSession, dir: String): DataFrame = {
    val und = undirected(s, dir)
    und.union(und.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Degree-order ORIENTED edges ([[Graph.orientEdges]] output,
    * `(src, dst, dd)`) — a pure function of the undirected set, so
    * it persists once per sf dir like the set itself. The triangle
    * and clustering-coefficient queries consume this directly and
    * skip the degree aggregate + orientation joins per run; at
    * 100 TB the oriented list is the second lake artifact of the
    * graph family (degrees reconstruct from it exactly).
    */
  def oriented(s: SparkSession, dir: String): DataFrame = {
    val p = materialize(s"ord_${tag(dir)}") {
      Graph.orientEdges(undirected(s, dir))
    }
    graft.Tables.readCachedSchema(s, p)
  }

  /** Deterministic DeepWalk corpus over the co-purchase graph
    * ([[Graph.deterministicWalks]] at the registered defaults) —
    * itself a lake asset three queries consume (q359 walk dump, q360
    * skip-gram pairs, q363 SGNS shards): the hash-derived steps make
    * it bit-stable, so materializing once per sf dir is
    * result-identical to inline derivation, and downstream consumers
    * scan a compact parquet instead of replaying the per-hop joins.
    */
  def walks(s: SparkSession, dir: String): DataFrame = {
    val p = materialize(s"walks_${tag(dir)}") {
      Graph.deterministicWalks(undirected(s, dir))
    }
    graft.Tables.readCachedSchema(s, p)
  }

  /** Canonical undirected edges over the small-parts subgraph
    * (p_size <= 5) — the q239/q244/q245 slice.
    */
  def undirectedSmall(s: SparkSession, dir: String): DataFrame = {
    val p = materialize(s"undsmall_${tag(dir)}") {
      val pk = graft.Tables(s, dir, "part").where(col("p_size") <= 5)
        .select(col("p_partkey").as("l_partkey"))
      val li = graft.Tables(s, dir, "lineitem")
        .join(broadcast(pk), "l_partkey")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst"))
        .distinct()
    }
    graft.Tables.readCachedSchema(s, p)
  }

  /** Both-orientations view of the small-parts subgraph. */
  def directedSmall(s: SparkSession, dir: String): DataFrame = {
    val und = undirectedSmall(s, dir)
    und.union(und.select(col("dst").as("src"), col("src").as("dst")))
  }
}
