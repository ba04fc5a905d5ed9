package graft

import graft.engine.EventPlugin
import graft.model.AlertDoc.Doc

/** Registered through `META-INF/services/graft.engine.EventPlugin` in
  * test resources — exercises the ServiceLoader discovery path
  * (`Plugins.discover`), the classpath analogue of the reference's
  * plugin-directory scan.
  */
class TestLoaderPlugin extends EventPlugin {
  def name = "loader_tag"
  def registration: Seq[String] = Seq("*")
  override def priority: Int = 10
  def message(event: Doc): Option[Doc] = Some(event + ("loaded" -> true))
}
