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

  /** Token match: registration ∩ (keys ∪ tags ∪ category), or "*". */
  def matches(plugin: EventPlugin, event: Doc): Boolean = {
    if (plugin.registration.contains("*")) return true
    val tags = AlertDoc.seq(event, "tags").map(_.toString)
    val cat = event.get("category").filter(_ != null).map(_.toString).toSeq
    val tokens = (event.keySet ++ tags ++ cat).map(_.toLowerCase)
    plugin.registration.exists(r => tokens.contains(r.toLowerCase))
  }

  /** Run the chain over one event, priority order. */
  def sendEventToPlugins(event: Doc, plugins: Seq[EventPlugin]): Option[Doc] =
    runSorted(event, plugins.sortBy(_.priority))

  /** Chain already priority-sorted — the per-event hot path. */
  private def runSorted(event: Doc, sorted: Seq[EventPlugin]): Option[Doc] =
    sorted.foldLeft(Option(event)) { (acc, p) =>
      acc.flatMap { ev =>
        if (!matches(p, ev)) Some(ev)
        else p.message(ev).map { out =>
          val prov = AlertDoc.seq(out, "plugins").map(_.toString) :+ p.name
          out + ("plugins" -> prov)
        }
      }
    }

  /** Distributed form over JSON-line events (the lake ingest path). */
  def run(events: Dataset[String], plugins: Seq[EventPlugin]): Dataset[String] = {
    import events.sparkSession.implicits._
    val chain = plugins.sortBy(_.priority)
    events.mapPartitions { it =>
      it.flatMap { line =>
        Json.parse(line) match {
          case Some(m: Map[_, _]) =>
            runSorted(m.asInstanceOf[Doc], chain).map(Json.write)
          case _ => Some(line) // non-object lines pass through untouched
        }
      }
    }
  }
}
