package graft.functions

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper

/** Minimal JSON bridge over Jackson (already on the Spark classpath).
  * Parses to plain Scala Map/Seq values for driver-side template
  * contexts and alert-document state; renders the same shapes back.
  * Only the driver ever touches this — executor-side JSON work goes
  * through `get_json_object`/`from_json` columns.
  */
object Json {
  private val mapper = new ObjectMapper()

  def parse(s: String): Option[Any] =
    Try(fromJava(mapper.readValue(s, classOf[Object]))).toOption

  def parseMap(s: String): Map[String, Any] =
    parse(s) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _                  => Map.empty
    }

  def write(v: Any): String = mapper.writeValueAsString(toJava(v))

  private[graft] def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, value) => k.toString -> fromJava(value) }.toMap
    case l: java.util.List[_] => l.asScala.map(fromJava).toSeq
    case other                => other
  }

  private def toJava(v: Any): Any = v match {
    case m: collection.Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, value) => out.put(k.toString, toJava(value)) }
      out
    case s: collection.Seq[_] =>
      val out = new java.util.ArrayList[Any]()
      s.foreach(e => out.add(toJava(e)))
      out
    case i: java.time.Instant => i.toString
    case other => other
  }
}
