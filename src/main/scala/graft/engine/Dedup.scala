package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Event-id dedup (A2/A3): the reference probes Mongo once per
  * candidate event with `$elemMatch` (alerta.py:38-73); here both
  * become a single `left_anti` join. The alerted-id side is bounded
  * (ids of events already inside stored alerts) → broadcast, so the
  * candidate side — the 100 TB side — never shuffles.
  */
object Dedup {

  /** remove_previously_alerted (alerta.py:38-57). */
  def removePreviouslyAlerted(events: DataFrame, alertedIds: DataFrame,
      idCol: String = "eventid"): DataFrame =
    antiJoin(events, alertedIds, idCol)

  /** remove_inflight_events (alerta.py:60-73). */
  def removeInflightEvents(events: DataFrame, inflightIds: DataFrame,
      idCol: String = "eventid"): DataFrame =
    antiJoin(events, inflightIds, idCol)

  private val log = org.apache.log4j.Logger.getLogger(getClass)

  private def antiJoin(events: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    if (!events.columns.contains(idCol)) {
      // a lake without the id column means dedup can't run — every
      // alert would re-fire each run. Be loud, like the
      // bad-aggregation-key path in Trigger.
      log.warn(s"dedup id column '$idCol' not in the event schema — " +
        "already-alerted suppression is OFF for this run")
      events
    } else events.join(broadcast(ids), Seq(idCol), "left_anti")
}
