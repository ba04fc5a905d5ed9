package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.functions.Dates
import graft.model.AlertDoc.Doc

/** Row ↔ driver-side document conversion. Trigger evaluation produces
  * alert *rows* (distributed); sequence state and stores hold alert
  * *documents* (driver-scale nested maps). This is the boundary.
  */
object Rows {

  def toDoc(r: Row): Doc =
    r.schema.fields.zipWithIndex.map { case (f, i) =>
      f.name -> convert(r.get(i))
    }.toMap

  private def convert(v: Any): Any = v match {
    case r: Row                  => toDoc(r)
    // collection.Seq: Spark returns mutable.ArraySeq for array columns
    case s: collection.Seq[_]    => s.toSeq.map(convert)
    case m: Map[_, _]            => m.map { case (k, mv) => k.toString -> convert(mv) }
    case t: java.sql.Timestamp   => Dates.iso(t.toInstant)
    case d: java.sql.Date        => d.toString
    case b: Array[Byte]          => java.util.Base64.getEncoder.encodeToString(b)
    case bd: java.math.BigDecimal => bd
    case other                   => other
  }
}
