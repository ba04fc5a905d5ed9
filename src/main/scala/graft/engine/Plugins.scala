package graft.engine

import org.apache.spark.sql.Dataset

import graft.functions.Json
import graft.model.AlertDoc
import graft.model.AlertDoc.Doc

/** The per-event transform plugin chain (P8, utils/plugins.py:32-108):
  * ingest-side enrichment/filter hooks that run before events land in
  * the lake.
  *
  * A plugin declares `registration` match tokens and a `priority`; it
  * runs on an event when its tokens intersect the event's top-level
  * keys ∪ tags ∪ category — or always, for the `"*"` wildcard. A
  * plugin may mutate the event or return None to DROP it; executed
  * plugin names append to the event's `plugins` provenance array.
  *
  * Execution is a `mapPartitions` over JSON-line events — plugins are
  * arbitrary row-level Scala, so this is the one place the engine
  * deliberately steps outside Catalyst; it is map-only, pipelined, and
  * shuffle-free, so it scales linearly with input splits.
  */
trait EventPlugin extends Serializable {
  def name: String
  /** match tokens; "*" = always run (utils/plugins.py:64-80) */
  def registration: Seq[String]
  /** lower runs earlier (utils/plugins.py:49-57) */
  def priority: Int = 50
  /** transform or drop (None) */
  def message(event: Doc): Option[Doc]
}

object Plugins {

  /** Token set of an event: keys ∪ tags ∪ category, lowercased. */
  private def eventTokens(event: Doc): Set[String] = {
    val tags = AlertDoc.seq(event, "tags").map(_.toString)
    val cat = event.get("category").filter(_ != null).map(_.toString).toSeq
    (event.keySet ++ tags ++ cat).map(_.toLowerCase)
  }

  /** Token match: registration ∩ (keys ∪ tags ∪ category), or "*". */
  def matches(plugin: EventPlugin, event: Doc): Boolean =
    plugin.registration.contains("*") ||
      plugin.registration.exists(r => eventTokens(event).contains(r.toLowerCase))

  /** A plugin with its match predicate precomputed once per chain —
    * the registration lowercase and wildcard check are invariant
    * across the whole ingest, not per (event, plugin) pair.
    */
  private final case class Compiled(plugin: EventPlugin,
      wildcard: Boolean, tokens: Set[String])

  private def compile(plugins: Seq[EventPlugin]): Seq[Compiled] =
    plugins.sortBy(_.priority).map(p => Compiled(p,
      p.registration.contains("*"),
      p.registration.map(_.toLowerCase).toSet))

  /** Run the chain over one event, priority order. */
  def sendEventToPlugins(event: Doc, plugins: Seq[EventPlugin]): Option[Doc] =
    runCompiled(event, compile(plugins))

  /** Per-event hot path: the event token set is computed lazily and
    * only recomputed after a plugin actually mutated the event — a
    * chain of non-matching plugins costs one set build, not N.
    */
  private def runCompiled(event: Doc, chain: Seq[Compiled]): Option[Doc] = {
    var ev = event
    var tokens: Set[String] = null
    for (c <- chain) {
      if (tokens == null) tokens = eventTokens(ev)
      if (c.wildcard || c.tokens.exists(tokens.contains)) {
        c.plugin.message(ev) match {
          case None => return None
          case Some(out) =>
            val prov = AlertDoc.seq(out, "plugins").map(_.toString) :+ c.plugin.name
            ev = out + ("plugins" -> prov)
            tokens = null // keys/tags may have changed
        }
      }
    }
    Some(ev)
  }

  /** Runtime plugin discovery — the analogue of the reference's
    * plugin-directory scan (utils/plugins.py:32-61, `registerPlugins`
    * globbing the plugins dir for .py modules and importing each):
    * plugins are
    * discovered from the classpath via `java.util.ServiceLoader`, so
    * dropping a jar with a
    * `META-INF/services/graft.engine.EventPlugin` entry onto the
    * executor classpath registers its plugins with no code change.
    * Discovery order is irrelevant — the chain sorts by `priority`
    * exactly like the directory scan did.
    */
  def discover(loader: ClassLoader = Thread.currentThread().getContextClassLoader)
      : Seq[EventPlugin] = {
    val it = java.util.ServiceLoader.load(classOf[EventPlugin], loader).iterator()
    val out = Seq.newBuilder[EventPlugin]
    while (it.hasNext) out += it.next()
    out.result()
  }

  /** Distributed form over JSON-line events (the lake ingest path). */
  def run(events: Dataset[String], plugins: Seq[EventPlugin]): Dataset[String] = {
    import events.sparkSession.implicits._
    val chain = compile(plugins)
    events.mapPartitions { it =>
      it.flatMap { line =>
        Json.parse(line) match {
          case Some(m: Map[_, _]) =>
            runCompiled(m.asInstanceOf[Doc], chain).map(Json.write)
          case _ => Some(line) // non-object lines pass through untouched
        }
      }
    }
  }
}
