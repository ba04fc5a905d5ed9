package graft.engine

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Dates, Paths, Template}
import graft.model.AlertDoc
import graft.model.AlertDoc.Doc

/** Threshold / deadman trigger evaluation — the reference's
  * `determine_threshold_trigger` (alerta.py:428-459) and
  * `determine_deadman_trigger` (alerta.py:358-410) re-expressed as one
  * single-pass DataFrame pipeline:
  *
  *   groupBy(aggregation key) → count + collect_list(event struct)
  *   → trigger filter (>= / <=) → count-desc order (mostCommon O1)
  *   → alert columns + in-plan Mustache rendering of summary+snippets.
  *
  * The reference's two passes (Counter, then a Python re-scan per
  * group to attach events) collapse into the aggregate; rendering is
  * a compiled `concat` column, so the whole evaluation is one Spark
  * job with map-side partial aggregation and no driver loop. Alerts
  * stay bounded (events per rule per run are LIMIT-capped upstream,
  * alerta.py:147), so `collect_list` memory is bounded by design.
  */
object Trigger {

  /** G2: fire on count >= threshold. */
  def threshold(events: DataFrame, spec: Doc, now: Instant = Dates.utcnow()): DataFrame = {
    val th = AlertDoc.int(spec, "threshold", 1)
    val groups = grouped(events, aggKey(spec)).where(col("__count") >= th)
    alertify(groups, spec, now, events.schema)
  }

  /** G3: fire on count <= threshold; absent events/groups synthesize
    * the deadman meta-event and a zero count (alerta.py:366-386).
    */
  def deadman(events: DataFrame, spec: Doc, now: Instant = Dates.utcnow()): DataFrame = {
    val th = AlertDoc.int(spec, "threshold", 0)
    val key = aggKey(spec)
    // materialized once: the emptiness probe is semantically required
    // (a deadman's whole point is noticing absence), and without the
    // checkpoint the aggregation would run twice — once for isEmpty,
    // once for the real evaluation. The materialized relation is
    // alert-scale (one row per group).
    val g = grouped(events, key).localCheckpoint()
    if (g.isEmpty) {
      // No group has the aggregation key: fabricate a (key, 0) count
      // (alerta.py:384-386). Its attached events are empty by
      // construction — no event can have key-value == the key string
      // when no event produced any key value at all (the reference's
      // meta-event never matches either, alerta.py:399-403).
      val spark = events.sparkSession
      val evType = ArrayType(events.schema)
      val fabricated = spark.range(1).select(
        lit(key).as("__value"),
        lit(0L).as("__count"),
        from_json(lit("[]"), evType).as("__events"))
      if (0 <= th) alertify(fabricated, spec, now, events.schema)
      else alertify(fabricated.limit(0), spec, now, events.schema)
    } else {
      alertify(g.where(col("__count") <= th), spec, now, events.schema)
    }
  }

  private def aggKey(spec: Doc): String = AlertDoc.str(spec, "aggregation_key")

  /** mostCommon (G1): group-count by the dotted aggregation key, with
    * the group's events collected and deterministically ordered.
    * Events with no value at the key path don't form groups (the
    * reference's keypaths() only yields existing leaves).
    */
  private val log = org.apache.log4j.Logger.getLogger(getClass)

  private def grouped(events: DataFrame, dottedKey: String): DataFrame = {
    // a blank or unresolvable key makes every __value NULL — the rule
    // would silently never fire, indistinguishable from a quiet lake.
    // Be loud about it (the bad-criteria path already is).
    if (dottedKey.trim.isEmpty)
      log.warn("aggregation_key is blank — rule can never fire")
    else if (Paths.leafType(events.schema, dottedKey).isEmpty)
      log.warn(s"aggregation_key '$dottedKey' does not resolve against the " +
        s"event schema — rule can never fire")
    val keyCol = Paths.column(events.schema, dottedKey).cast(StringType)
    val evStruct = struct(events.columns.map(col): _*)
    events
      .withColumn("__value", keyCol)
      .where(col("__value").isNotNull)
      .groupBy("__value")
      .agg(
        count(lit(1)).as("__count"),
        sort_array(collect_list(evStruct)).as("__events"))
  }

  /** Build the alert rows: spec fields as literals, `metadata.value/
    * count` from the group, the group's events, and the summary
    * rendered in-plan — base template over the alert context, then
    * " " + snippet for each of the first `event_sample_count` events
    * (alerta.py:453-458 append semantics, trailing-space quirks
    * included).
    */
  private def alertify(groups: DataFrame, spec: Doc, now: Instant,
      eventSchema: StructType): DataFrame = {
    val tags = AlertDoc.seq(spec, "tags").map(_.toString)
    val sampleCount = AlertDoc.int(spec, "event_sample_count", 0)
    val summaryTpl = AlertDoc.str(spec, "summary")
    val snippetTpl = AlertDoc.str(spec, "event_snippet")

    val base = groups
      .orderBy(col("__count").desc, col("__value"))
      .select(
        lit(AlertDoc.str(spec, "alert_name", "unnamed")).as("alert_name"),
        lit(AlertDoc.str(spec, "alert_type")).as("alert_type"),
        lit(Dates.iso(now)).as("utctimestamp"),
        lit(AlertDoc.str(spec, "severity", "INFO")).as("severity"),
        lit(AlertDoc.str(spec, "category")).as("category"),
        (if (tags.isEmpty) array().cast(ArrayType(StringType))
         else array(tags.map(lit): _*)).as("tags"),
        // record the same default the evaluation used: threshold
        // alerts fire at count >= 1 when unspecified, deadman at <= 0
        lit(AlertDoc.int(spec, "threshold",
          if (AlertDoc.str(spec, "alert_type") == "threshold") 1 else 0)).as("threshold"),
        lit(AlertDoc.str(spec, "aggregation_key")).as("aggregation_key"),
        lit(AlertDoc.str(spec, "criteria")).as("criteria"),
        lit(snippetTpl).as("event_snippet"),
        lit(sampleCount).as("event_sample_count"),
        lit(true).as("triggered"),
        struct(col("__value").as("value"), col("__count").as("count")).as("metadata"),
        col("__events").as("events"))

    val summaryBase = Template.compile(summaryTpl, base.schema)
    val snippets =
      if (sampleCount <= 0) lit("")
      else coalesce(
        array_join(
          transform(
            slice(col("events"), 1, sampleCount),
            e => concat(lit(" "),
              Template.compile(snippetTpl, eventSchema, name => e.getField(name)))),
          ""),
        lit(""))
    base.withColumn("summary", concat(summaryBase, snippets))
      .select("alert_name", "alert_type", "utctimestamp", "severity", "summary",
        "event_snippet", "event_sample_count", "category", "tags", "threshold",
        "aggregation_key", "criteria", "triggered", "metadata", "events")
  }
}
