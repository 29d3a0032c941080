package graft.plans

/** Plugin info surface (kiara_api.py:483 `list_available_plugin_names`,
  * :498 `retrieve_plugin_info`, :516 `retrieve_plugin_infos`).
  *
  * kiara plugins are python entry points discovered at import time; the
  * JVM has no entry-point machinery, so the honest twin is the named
  * extension bundle: a `SparkSessionExtensions` injector (SQL functions +
  * optimizer rules) or an operation-catalog registrar. The builtin
  * bundles self-register; user bundles join via [[PluginRegistry.register]].
  */
object PluginRegistry {

  /** Info record for one plugin (kiara's PluginInfo analogue): the
    * implementing class is what a deployment puts on the classpath /
    * `spark.sql.extensions`; `provides` names the surface it adds. */
  final case class PluginInfo(name: String, implementing: String,
                              description: String, provides: Seq[String])

  private val plugins = scala.collection.concurrent.TrieMap[String, PluginInfo]()

  def register(info: PluginInfo): Unit = plugins.put(info.name, info)

  def names: Seq[String] = plugins.keys.toSeq.sorted
  def info(name: String): PluginInfo = plugins.getOrElse(name,
    throw new NoSuchElementException(s"plugin not registered: $name"))
  def infos: Seq[PluginInfo] = names.map(info)

  // the engine's own bundles — registered up front so the catalog is
  // populated out of the box, like kiara's always-installed core plugins
  register(PluginInfo("graft-extensions",
    "org.apache.spark.sql.graftext.GraftExtensions",
    "SparkSessionExtensions injector: SQL function graft_dot (native " +
      "codegen'd dot product) + RewriteHofDot optimizer rule (interpreted " +
      "HOF dot-product idiom rewritten to the native expression) + " +
      "GroupTopKStrategy planner strategy (per-group top-k as bounded " +
      "heaps with map-side partial pruning)",
    Seq("graft_dot", "RewriteHofDot", "GroupTopKStrategy")))
  register(PluginInfo("graft-builtins",
    "graft.plans.Builtins",
    "builtin operation catalog: default-configured table transforms over " +
      "the engine operators, grouped into module types",
    Seq("text", "dedup", "mm", "profile")))
}
