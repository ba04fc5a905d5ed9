package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dotted-path field addressing over a DataFrame schema — the Spark
  * analogue of the reference's universal `DotDict.get("a.b.c")` /
  * `getValueByPath` scheme (utils/dotdict.py:14-36,
  * utils/mostcommon.py:28-37). Aggregation keys, template variables
  * and snippet fields all address event data this way.
  *
  * Resolution is schema-driven (exact path), not the reference's
  * set-of-segments match — see SURVEY.md §2.2 G1a for the documented
  * divergence. Missing paths resolve to NULL (the DotDict `None`
  * default, P3); a path that dives into a StringType column becomes a
  * `get_json_object` JSONPath (the `details` JSON-as-string case).
  */
object Paths {

  /** Column for a dotted path, or null literal if unresolvable. */
  def column(schema: StructType, dotted: String, root: String => Column = col): Column =
    dotted.split('.').toList match {
      case head :: rest =>
        schema.fields.find(_.name == head) match {
          case Some(f) => resolve(root(head), f.dataType, rest)
          case None    => lit(null).cast(StringType)
        }
      case Nil => lit(null).cast(StringType)
    }

  /** Same, keeping the native leaf type where the full path resolves
    * through typed columns (JSON-string hops still yield strings).
    */
  def resolve(c: Column, dt: DataType, path: List[String]): Column =
    (dt, path) match {
      case (_, Nil) => c
      case (st: StructType, seg :: rest) =>
        st.fields.find(_.name == seg) match {
          case Some(f) => resolve(c.getField(seg), f.dataType, rest)
          case None    => lit(null).cast(StringType)
        }
      // try_element_at, not element_at: the DotDict contract is NULL
      // on any miss (P3), and under ANSI the builtin element_at
      // throws on an out-of-range array index
      case (at: ArrayType, seg :: rest) if seg.forall(_.isDigit) =>
        resolve(try_element_at(c, lit(seg.toInt + 1)), at.elementType, rest)
      case (mt: MapType, seg :: rest) =>
        resolve(try_element_at(c, lit(seg)), mt.valueType, rest)
      case (StringType, segs) =>
        get_json_object(c, "$" + jsonPath(segs))
      case _ => lit(null).cast(StringType)
    }

  /** JSONPath for the remaining segments: numeric segments are array
    * indexes and must be spelled `[n]` — `$.a.0` would be read as an
    * object key by Spark's JSON path parser and return NULL.
    */
  private def jsonPath(segs: List[String]): String =
    segs.map(s => if (s.nonEmpty && s.forall(_.isDigit)) s"[$s]" else s".$s").mkString

  /** Leaf DataType a dotted path resolves to, if statically known. */
  def leafType(schema: StructType, dotted: String): Option[DataType] = {
    def walk(dt: DataType, path: List[String]): Option[DataType] = (dt, path) match {
      case (t, Nil)                   => Some(t)
      case (st: StructType, s :: r)   => st.fields.find(_.name == s).flatMap(f => walk(f.dataType, r))
      case (at: ArrayType, s :: r) if s.forall(_.isDigit) => walk(at.elementType, r)
      case (mt: MapType, _ :: r)      => walk(mt.valueType, r)
      case (StringType, _)            => Some(StringType) // JSON hop
      case _                          => None
    }
    dotted.split('.').toList match {
      case h :: r => schema.fields.find(_.name == h).flatMap(f => walk(f.dataType, r))
      case Nil    => None
    }
  }
}
