package graft.functions

import scala.util.Try

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mustache-subset template renderer.
  *
  * The reference renders alert summaries, per-event snippets, and even
  * later sequence-slot SQL criteria through chevron/Mustache
  * (alerta.py:291, 404-409, 453-458). The shipped corpus only uses
  * plain `{{dotted.path}}` interpolation — no sections, partials, or
  * HTML escaping — so that is the contract here (SURVEY.md §2.6 T1).
  * Paths may index arrays numerically (`slots.0.events.0.details.x`)
  * and may cross into JSON-string columns. A missing path renders as
  * the empty string (Mustache semantics).
  *
  * Two forms:
  *   - [[render]]: driver-side, over nested Scala/Java maps, Rows and
  *     JSON strings — used for sequence-slot criteria synthesis, which
  *     must happen before SQL parsing (same lifecycle position as the
  *     reference).
  *   - [[compile]]: schema-aware compilation into a codegen'd Column
  *     (`concat` of literals and field lookups) — used to render
  *     summary/snippet columns inside the query plan, with no UDF and
  *     no driver round-trip. At 100 TB rendering stays distributed and
  *     inside whole-stage codegen.
  */
object Template {

  /** A parsed template: Left = literal text, Right = variable path. */
  def parts(tpl: String): Seq[Either[String, String]] = {
    val rx = raw"\{\{\s*([^{}]+?)\s*\}\}".r
    val out = Seq.newBuilder[Either[String, String]]
    var last = 0
    for (m <- rx.findAllMatchIn(tpl)) {
      if (m.start > last) out += Left(tpl.substring(last, m.start))
      out += Right(m.group(1))
      last = m.end
    }
    if (last < tpl.length) out += Left(tpl.substring(last))
    out.result()
  }

  def variables(tpl: String): Seq[String] = parts(tpl).collect { case Right(p) => p }

  // --- driver-side rendering ---------------------------------------------

  /** Render over an arbitrary nested context (Map / java.util.Map /
    * Row / Seq / JSON string). Missing path → "".
    */
  def render(tpl: String, ctx: Any): String =
    parts(tpl).map {
      case Left(s)  => s
      case Right(p) => lookup(ctx, p.split('.').toList).map(format).getOrElse("")
    }.mkString

  def format(v: Any): String = v match {
    case null               => ""
    case d: Double if d.isWhole && math.abs(d) < 1e15 =>
      // JSON-parsed integers may surface as Doubles; alert authors
      // expect "87", not "87.0", when the source literal was integral.
      d.toLong.toString
    case s: collection.Seq[_] => s.map(format).mkString("[", ", ", "]")
    case other              => other.toString
  }

  def lookup(ctx: Any, path: List[String]): Option[Any] = path match {
    case Nil => Option(ctx)
    case seg :: rest =>
      ctx match {
        // JSON-string value (e.g. `details`): parse, then continue the walk.
        case s: String if s.startsWith("{") || s.startsWith("[") =>
          Json.parse(s).flatMap(parsed => lookup(parsed, path))
        case _ =>
          val stepped: Option[Any] = ctx match {
            case m: collection.Map[_, _] =>
              m.asInstanceOf[collection.Map[String, Any]].get(seg)
            case m: java.util.Map[_, _] =>
              Option(m.asInstanceOf[java.util.Map[String, Any]].get(seg))
            case r: Row =>
              Try(r.getAs[Any](seg)).toOption
            case s: collection.Seq[_] if seg.forall(_.isDigit) => s.lift(seg.toInt)
            case l: java.util.List[_] if seg.forall(_.isDigit) =>
              if (seg.toInt < l.size) Option(l.get(seg.toInt)) else None
            case _ => None
          }
          stepped.filter(_ != null).flatMap(v => lookup(v, rest))
      }
  }

  // --- plan-side compilation ---------------------------------------------

  /** Compile a template against a schema into a single Column that
    * renders it row-by-row. `root` maps a top-level field name to its
    * Column (defaults to `col(_)`; pass `base.getField _` to render
    * relative to a struct, e.g. inside a `transform` lambda).
    */
  def compile(tpl: String, schema: StructType, root: String => Column = col): Column = {
    val cols = parts(tpl).map {
      case Left(s)  => lit(s)
      case Right(p) =>
        val leaf = Paths.leafType(schema, p).getOrElse(StringType)
        coalesce(asString(Paths.column(schema, p, root), leaf), lit(""))
    }
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }

  /** Leaf stringification: doubles holding integral JSON numbers are
    * formatted without the trailing ".0" to match driver-side
    * rendering of JSON-parsed integers.
    */
  private def asString(c: Column, dt: DataType): Column = dt match {
    // mirror driver-side format exactly: Doubles only, and only below
    // 1e15 (above it Double.toString goes scientific and the driver
    // keeps that form); Floats render via toString on both sides
    case DoubleType =>
      when(c.cast(LongType).cast(dt) === c && abs(c) < lit(1e15),
        c.cast(LongType).cast(StringType))
        .otherwise(c.cast(StringType))
    case _ => c.cast(StringType)
  }
}
