package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded table rendering — kiara pretty_print / render_value
  * (operations/included_core_operations/pretty_print.py:68,
  * render_value.py:54, render_data.py:34).
  *
  * Rendering only ever materializes a bounded slice (limit/offset pushed
  * into the plan → TakeOrderedAndProject / GlobalLimit, never a full
  * collect) — the kiara behavior of previewing arbitrarily large values
  * cheaply, kept safe at 100 TB.
  */
object Render {

  /** Fixed-width text table of the first `rows` rows (kiara pretty_print). */
  def prettyPrint(df: DataFrame, rows: Int = 20, maxColWidth: Int = 30): String = {
    val header = df.columns.toSeq
    val data = df.limit(rows).collect().map(_.toSeq.map {
      case null => "null"
      case v    => v.toString
    })
    val all = header +: data.toSeq
    def clip(s: String) = if (s.length > maxColWidth) s.take(maxColWidth - 1) + "…" else s
    val widths = header.indices.map(i => all.map(r => clip(r(i).toString).length).max)
    def fmt(r: Seq[Any]) =
      r.zip(widths).map { case (v, w) => clip(v.toString).padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, fmt(header), sep) ++ data.map(fmt) :+ sep).mkString("\n")
  }

  /** Paginated sorted slice (kiara render_value): page is 0-based. */
  def page(df: DataFrame, sortCols: Seq[String], pageSize: Int, pageNo: Int): DataFrame =
    df.orderBy(sortCols.map(col): _*).offset(pageSize * pageNo).limit(pageSize)

  /** pretty_print as a VALUE→VALUE operation (kiara pretty_print.py's
    * 'rendered_value' output — the module contract is value in, rendered
    * VALUE out, which is what lets pretty_print terminate a pipeline;
    * graft values are tables, so the rendered value is a (line_no, line)
    * table of the fixed-width text render). Same bounded-slice
    * materialization as [[prettyPrint]] — `rows`+4 lines total, built on
    * the driver and re-parallelized, never a full collect. */
  def prettyLines(df: DataFrame, rows: Int = 20, maxColWidth: Int = 30): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    prettyPrint(df, rows, maxColWidth).split('\n').toSeq.zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("line_no", "line")
  }

  private def boundedRows(df: DataFrame, rows: Int): Seq[Seq[String]] =
    df.limit(rows).collect().toSeq.map(_.toSeq.map {
      case null => ""
      case v    => v.toString
    })

  /** GitHub-style markdown table of the first `rows` rows — kiara's
    * render_value `markdown` target (render_value.py:54 dispatches on
    * target format; same bounded-slice materialization as prettyPrint). */
  def markdown(df: DataFrame, rows: Int = 20): String = {
    val header = df.columns.toSeq
    val body = boundedRows(df, rows)
    (Seq(header.mkString("| ", " | ", " |"),
      header.map(_ => "---").mkString("| ", " | ", " |")) ++
      body.map(_.mkString("| ", " | ", " |"))).mkString("\n")
  }

  /** The renderer catalog — kiara's `render list-renderers`
    * (reference interfaces/cli/render/commands.py:60): target name →
    * one-line description, the dispatch table [[as]] uses. */
  val renderers: Seq[(String, String)] = Seq(
    "string" -> "fixed-width text table (pretty_print)",
    "markdown" -> "GitHub-style markdown table",
    "html" -> "escaped HTML table",
    "template" -> "user template rendered per row ({{col}} substitution)")

  /** Render a frame through a named target — kiara's `render item`
    * dispatch (render_value.py:54 picks the renderer by format). The
    * `template` target needs the user template (kiara's jinja renderer
    * takes it as a render-config input, renderers/jinja.py:92). */
  def as(target: String, df: DataFrame, rows: Int = 20,
         tpl: Option[String] = None): String = target match {
    case "string"   => prettyPrint(df, rows)
    case "markdown" => markdown(df, rows)
    case "html"     => html(df, rows)
    case "template" => template(df, tpl.getOrElse(throw new IllegalArgumentException(
      "renderer 'template' needs a template (render item template <q> <sf> <tpl>)")), rows)
    case other =>
      // value→value fall-through (r12): an unknown STRING target may be
      // a registered value renderer for the table type — render through
      // it, then pretty-print the RESULTING value for the CLI surface
      ValueRenderOps.find("table", other) match {
        case Some(_) => prettyPrint(ValueRenderOps.render("table", other, df), rows)
        case None => throw new IllegalArgumentException(
          s"unknown renderer: $other (see `render list-renderers`)")
      }
  }

  private val Placeholder = """\{\{\s*([A-Za-z0-9_]+)\s*\}\}""".r

  /** Template-driven rendering — kiara's jinja renderer
    * (reference renderers/jinja.py:1-103) re-expressed without the
    * jinja dependency: the template renders once per row of the bounded
    * slice, `{{col}}` substituting that row's column value (null → "");
    * a placeholder naming no column is an error listing what IS
    * available, like jinja's missing-template diagnostics
    * (jinja.py:78-86). Same bounded-slice materialization as every
    * other target — templates never pull more than `rows` rows. */
  def template(df: DataFrame, tpl: String, rows: Int = 20): String = {
    val cols = df.columns
    Placeholder.findAllMatchIn(tpl).map(_.group(1)).toSeq.distinct
      .filterNot(cols.contains) match {
      case Seq() =>
      case missing => throw new IllegalArgumentException(
        s"template references unknown column(s) ${missing.mkString(", ")}; " +
          s"available: ${cols.mkString(", ")}")
    }
    val idx = cols.zipWithIndex.toMap
    df.limit(rows).collect().toSeq.map { r =>
      Placeholder.replaceAllIn(tpl, m =>
        scala.util.matching.Regex.quoteReplacement {
          val v = r.get(idx(m.group(1)))
          if (v == null) "" else v.toString
        })
    }.mkString("\n")
  }

  /** Minimal HTML table — kiara's render_value `html` target. Cell text
    * is escaped, so values cannot inject markup. */
  def html(df: DataFrame, rows: Int = 20): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val header = df.columns.toSeq.map(c => s"<th>${esc(c)}</th>").mkString
    val body = boundedRows(df, rows)
      .map(_.map(v => s"<td>${esc(v)}</td>").mkString)
      .map(r => s"<tr>$r</tr>").mkString
    s"<table><thead><tr>$header</tr></thead><tbody>$body</tbody></table>"
  }

  // ---- pipeline renderers ------------------------------------------------

  /** Pipeline renderer catalog — kiara renders a PIPELINE (not just
    * values) to several targets (renderers/included_renderers/pipeline.py:
    * :60 PipelineRendererHtml, :91 Markdown, :197 PipelineInfoRenderer,
    * :235 PythonScriptRenderer, plus the png graph renderers at :120).
    * The `mermaid` target is the portable twin of kiara's png execution
    * graph (same topology, text format — the sandbox renders text, not
    * graphviz images); `script` mirrors PythonScriptRenderer with a
    * runnable Scala snippet over OpRegistry. */
  val pipelineRenderers: Seq[(String, String)] = Seq(
    "markdown" -> "pipeline structure as a markdown document",
    "html" -> "pipeline structure as a static html page",
    "mermaid" -> "execution DAG as a mermaid graph definition",
    "script" -> "runnable scala snippet replaying the pipeline")

  /** One renderable step: (step name, op name, input name). The DAG edge
    * is input → step; an input naming no step is a pipeline INPUT. */
  type PipelineStep = (String, String, String)

  private def pipelineInputs(steps: Seq[PipelineStep]): Seq[String] = {
    val produced = steps.map(_._1).toSet
    steps.map(_._3).filterNot(produced).distinct
  }

  /** Leaf steps — produced values nothing downstream consumes (kiara's
    * pipeline output fields). */
  private def pipelineOutputs(steps: Seq[PipelineStep]): Seq[String] = {
    val consumed = steps.map(_._3).toSet
    steps.map(_._1).filterNot(consumed)
  }

  /** Steps in execution order (single-input DAG topological walk —
    * same ready-set rule as Pipeline.run, cycles reported loudly). */
  private def topo(steps: Seq[PipelineStep]): Seq[PipelineStep] = {
    var available = pipelineInputs(steps).toSet
    var remaining = steps
    var ordered = Vector.empty[PipelineStep]
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(s => available.contains(s._3))
      require(ready.nonEmpty,
        s"pipeline cannot progress (cycle or unknown input) at steps: " +
          blocked.map(_._1).mkString(", "))
      ordered ++= ready
      available ++= ready.map(_._1)
      remaining = blocked
    }
    ordered
  }

  /** Render a pipeline's step topology through a named target — kiara's
    * `render --source-type pipeline item <name> <target>`. */
  def pipeline(name: String, steps: Seq[PipelineStep], target: String): String = {
    require(steps.nonEmpty, s"pipeline $name has no steps to render")
    target match {
      case "markdown" => pipelineMarkdown(name, steps)
      case "html"     => pipelineHtml(name, steps)
      case "mermaid"  => pipelineMermaid(name, steps)
      case "script"   => pipelineScript(name, steps)
      case other => throw new IllegalArgumentException(
        s"unknown pipeline renderer: $other (available: " +
          pipelineRenderers.map(_._1).mkString(", ") + ")")
    }
  }

  /** kiara pipeline.md.j2 structure: title, inputs, step table, outputs. */
  private def pipelineMarkdown(name: String, steps: Seq[PipelineStep]): String = {
    val rows = topo(steps).map { case (s, op, in) => s"| $s | $op | $in |" }
    (Seq(s"# pipeline: $name", "", "## inputs", "") ++
      pipelineInputs(steps).map(i => s"- $i") ++
      Seq("", "## steps (execution order)", "",
        "| step | operation | input |", "| --- | --- | --- |") ++ rows ++
      Seq("", "## outputs", "") ++
      pipelineOutputs(steps).map(o => s"- $o")).mkString("\n")
  }

  private def pipelineHtml(name: String, steps: Seq[PipelineStep]): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val ins = pipelineInputs(steps).map(i => s"<li>${esc(i)}</li>").mkString
    val outs = pipelineOutputs(steps).map(o => s"<li>${esc(o)}</li>").mkString
    val rows = topo(steps).map { case (s, op, in) =>
      s"<tr><td>${esc(s)}</td><td>${esc(op)}</td><td>${esc(in)}</td></tr>"
    }.mkString
    s"<html><body><h1>pipeline: ${esc(name)}</h1>" +
      s"<h2>inputs</h2><ul>$ins</ul>" +
      "<h2>steps</h2><table><thead><tr><th>step</th><th>operation</th>" +
      s"<th>input</th></tr></thead><tbody>$rows</tbody></table>" +
      s"<h2>outputs</h2><ul>$outs</ul></body></html>"
  }

  /** Execution DAG as mermaid `graph TD` — node ids are positional (i0/s0)
    * so arbitrary step names can't break mermaid syntax; labels carry the
    * real names. Inputs render as stadium nodes, steps as boxes labeled
    * with their operation. */
  private def pipelineMermaid(name: String, steps: Seq[PipelineStep]): String = {
    topo(steps) // cycle / unknown-input check: every target fails loudly, not just the tabular ones
    val ins = pipelineInputs(steps)
    val inId = ins.zipWithIndex.map { case (n, i) => n -> s"i$i" }.toMap
    val stepId = steps.map(_._1).zipWithIndex.map { case (n, i) => n -> s"s$i" }.toMap
    def esc(s: String) = s.replace("\"", "#quot;")
    val nodes =
      ins.map(n => s"""  ${inId(n)}(["${esc(n)}"])""") ++
        steps.map { case (s, op, _) => s"""  ${stepId(s)}["${esc(s)}<br/>${esc(op)}"]""" }
    val edges = steps.map { case (s, _, in) =>
      s"  ${inId.getOrElse(in, stepId(in))} --> ${stepId(s)}"
    }
    (s"---\ntitle: $name\n---" +: "graph TD" +: (nodes ++ edges)).mkString("\n")
  }

  /** Runnable Scala replay — kiara's PythonScriptRenderer (pipeline.py:235)
    * emits a python script with `<TODO_SET_INPUT>` placeholders for
    * unbound pipeline inputs; the Scala twin binds each input to a loud
    * failure the user replaces with a real DataFrame. */
  private def pipelineScript(name: String, steps: Seq[PipelineStep]): String = {
    def v(s: String) = s.replace('-', '_').replace('.', '_')
    // '-' and '.' both mangle to '_', so distinct names like 'a-b' and
    // 'a.b' could collide into one Scala val — that would silently emit a
    // shadowing (wrong-wiring) or non-compiling script; refuse loudly
    // with the colliding pair named instead
    val allNames = (pipelineInputs(steps) ++ steps.map(_._1)).distinct
    allNames.groupBy(v).collectFirst { case (id, ns) if ns.size > 1 => (id, ns) }
      .foreach { case (id, ns) =>
        throw new IllegalArgumentException(
          s"pipeline $name: step/input names ${ns.mkString("'", "', '", "'")} " +
            s"all mangle to script identifier '$id' — rename one")
      }
    val header = Seq(
      s"// graft pipeline '$name' — generated replay (render pipeline $name script)",
      "import graft.plans.OpRegistry")
    val binds = pipelineInputs(steps).map(i =>
      s"""val ${v(i)}: org.apache.spark.sql.DataFrame = sys.error("bind pipeline input '$i'")""")
    val body = topo(steps).map { case (s, op, in) =>
      s"""val ${v(s)} = OpRegistry.get("$op")(${v(in)})"""
    }
    val outs = pipelineOutputs(steps).map(o => s"// output: ${v(o)}")
    (header ++ Seq("") ++ binds ++ body ++ outs).mkString("\n")
  }

  // ---- archive + job renderers --------------------------------------------

  /** Archive inspection as a static html page — kiara's ArchiveRendererHtml
    * (renderers/included_renderers/archive.py:55 renders a KiArchive to
    * `archive/static_page/page.html.j2`). Same metadata-only source as the
    * CLI text view: manifest + parquet footers, never a data scan. */
  def archiveHtml(info: graft.registries.Archive.ArchiveInfo): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val vals = info.values.map(v =>
      s"<tr><td>${esc(v.id)}</td><td>${v.rows}</td><td>${v.sizeBytes}</td><td>${v.files}</td></tr>"
    ).mkString
    val als = info.aliases.map { case (a, t) =>
      s"<tr><td>${esc(a)}</td><td>${esc(t)}</td></tr>" }.mkString
    s"<html><body><h1>archive (version ${info.version})</h1>" +
      s"<p>${info.values.size} values, ${info.aliases.size} aliases, " +
      s"${info.lineageRecords} lineage records</p>" +
      "<h2>values</h2><table><thead><tr><th>id</th><th>rows</th>" +
      s"<th>bytes</th><th>files</th></tr></thead><tbody>$vals</tbody></table>" +
      (if (als.isEmpty) ""
       else "<h2>aliases</h2><table><thead><tr><th>alias</th><th>value</th>" +
         s"</tr></thead><tbody>$als</tbody></table>") +
      "</body></html>"
  }

  // ---- API doc renderers ---------------------------------------------------

  /** API renderer catalog (listed by `render list-renderers` as
    * `api:<target>`), twin of kiara's api_to_<target> renderer aliases. */
  val apiRenderers: Seq[(String, String)] = Seq(
    "markdown" -> "endpoint catalog as a markdown reference",
    "html" -> "endpoint catalog as a static html page",
    "kiara_api" -> "delegating Scala facade source (marker-injected client stub)")

  /** The API's endpoint catalog rendered as markdown — kiara's
    * BaseApiDocRenderer family (renderers/included_renderers/api/
    * base_api.py:40 renders the BaseAPI endpoint list, with doc and
    * signature per endpoint, via introspection). The answer to "what can
    * this API do?" without reading source. */
  def apiMarkdown(eps: Seq[graft.GraftApi.Endpoint]): String =
    (s"# graft API endpoints (${eps.size})" +: "" +:
      "| endpoint | signature | doc |" +: "| --- | --- | --- |" +:
      eps.map(e =>
        s"| ${e.name} | `${e.signature.replace("|", "\\|")}` | ${e.doc} |"))
      .mkString("\n")

  /** The endpoint catalog as a static html page (escaped, like every
    * other html target — signatures cannot inject markup). */
  def apiHtml(eps: Seq[graft.GraftApi.Endpoint]): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val rows = eps.map(e =>
      s"<tr><td>${esc(e.name)}</td><td><code>${esc(e.signature)}</code></td>" +
        s"<td>${esc(e.doc)}</td></tr>").mkString
    s"<html><body><h1>graft API endpoints (${eps.size})</h1>" +
      "<table><thead><tr><th>endpoint</th><th>signature</th><th>doc</th>" +
      s"</tr></thead><tbody>$rows</tbody></table></body></html>"
  }

  // ---- typed value→value render dispatch -----------------------------------

  /** kiara's RenderValueOperationType seam (reference
    * renderers/included_renderers/value.py:67 ValueRenderer +
    * SourceTransformer, operations/included_core_operations/
    * render_value.py): "render a value of type S AS a value of type T"
    * resolves a REGISTERED operation from the (source, target) type
    * pair — so new value renderers are DATA (one registration), not
    * code (a new match arm). Registrations also land in
    * [[graft.plans.OpRegistry]] under `render.<source>.<target>`, so
    * they surface in the operations catalog and run in pipelines like
    * any other operation. */
  object ValueRenderOps {
    private val index =
      scala.collection.concurrent.TrieMap[(String, String), String]()

    /** Register (and index) a value→value render operation; returns the
      * operation name it was registered under. Re-registration replaces
      * (the OpRegistry contract). */
    def register(sourceType: String, targetType: String,
                 op: DataFrame => DataFrame, doc: String = ""): String = {
      graft.registries.Names.validate("render source type", sourceType)
      graft.registries.Names.validate("render target type", targetType)
      val name = s"render.$sourceType.$targetType"
      graft.plans.OpRegistry.register(name, op,
        doc = if (doc.nonEmpty) doc
          else s"render a '$sourceType' value as a '$targetType' value",
        inputType = sourceType, outputType = targetType, module = "render")
      index.put((sourceType, targetType), name)
      name
    }

    def find(sourceType: String, targetType: String): Option[String] =
      index.get((sourceType, targetType))

    /** All registered (source, target, operation) triples. */
    def list: Seq[(String, String, String)] =
      index.toSeq.map { case ((s, t), n) => (s, t, n) }.sorted

    /** Dispatch: value in, value out (value.py:101 _render resolves the
      * op for (source, target) and runs it; missing registration is an
      * error naming the pair, like the reference's). */
    def render(sourceType: String, targetType: String,
               df: DataFrame): DataFrame =
      index.get((sourceType, targetType)) match {
        case Some(n) => graft.plans.OpRegistry.get(n)(df)
        case None => throw new IllegalArgumentException(
          s"no render operation registered for '$sourceType' -> '$targetType' " +
            s"(registered: ${list.map { case (s, t, _) => s"$s->$t" }.mkString(", ")})")
      }
  }

  /** The pretty_print OPERATION TYPE registry — kiara's
    * PrettyPrintOperationType (operations/included_core_operations/
    * pretty_print.py:59): a second (source, target) → operation index
    * next to [[ValueRenderOps]], because the reference keeps
    * 'pretty_print' and 'render_value' as DISTINCT operation types that
    * assemble_render_pipeline chooses between via use_pretty_print.
    * Operation ids follow _calculate_op_id (pretty_print.py:70):
    * `pretty_print.<source>.as.<target>`, or `pretty_print.as.<target>`
    * when the source type is 'any'. */
  object PrettyPrintOps {
    private val index =
      scala.collection.concurrent.TrieMap[(String, String), String]()

    def register(sourceType: String, targetType: String,
                 op: DataFrame => DataFrame, doc: String = ""): String = {
      graft.registries.Names.validate("pretty_print source type", sourceType)
      graft.registries.Names.validate("pretty_print target type", targetType)
      val name =
        if (sourceType == "any") s"pretty_print.as.$targetType"
        else s"pretty_print.$sourceType.as.$targetType"
      graft.plans.OpRegistry.register(name, op,
        doc = if (doc.nonEmpty) doc
          else s"pretty-print a '$sourceType' value as a '$targetType' value",
        inputType = sourceType, outputType = targetType, module = "pretty_print")
      index.put((sourceType, targetType), name)
      name
    }

    def find(sourceType: String, targetType: String): Option[String] =
      index.get((sourceType, targetType))

    /** All registered (source, target, operation) triples. */
    def list: Seq[(String, String, String)] =
      index.toSeq.map { case ((s, t), n) => (s, t, n) }.sorted
  }

  val BeginEndpointsMarker = "// BEGIN AUTO-GENERATED-ENDPOINTS"
  val EndEndpointsMarker = "// END AUTO-GENERATED-ENDPOINTS"

  /** The endpoint catalog rendered into CLIENT SOURCE CODE — kiara's
    * BaseToKiaraApiRenderer (renderers/included_renderers/api/
    * base_api.py:165: the KiaraAPI facade class is REGENERATED from the
    * introspected BaseAPI endpoint list by injecting delegating proxy
    * methods between template markers, instead of being hand-maintained).
    * The Scala twin: one `def` per endpoint delegating to an inner
    * [[graft.GraftApi]], injected between [[BeginEndpointsMarker]] /
    * [[EndEndpointsMarker]] in `template` (default: a self-contained
    * facade class). Reflection's `<>` generics convert to Scala `[]`;
    * parameters are named arg0..argN (reflection does not retain source
    * names). */
  def apiScala(eps: Seq[graft.GraftApi.Endpoint],
               template: Option[String] = None): String = {
    val tpl = template.getOrElse(defaultApiTemplate)
    Seq(BeginEndpointsMarker, EndEndpointsMarker).foreach(m =>
      require(tpl.contains(m), s"template does not contain marker: $m"))
    // bracket-depth-aware split: generic types carry ", " inside []
    def splitParams(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; var start = 0
      s.indices.foreach { i =>
        s.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1
          case ',' if depth == 0 =>
            out += s.substring(start, i).trim; start = i + 1
          case _ =>
        }
      }
      val last = s.substring(start).trim
      if (last.nonEmpty) out += last
      out.toSeq
    }
    val methods = eps.map { e =>
      val sig = e.signature.replace('<', '[').replace('>', ']')
      val doc = if (e.doc.nonEmpty) s"  /** ${e.doc} */\n" else ""
      val open = sig.indexOf('(')
      if (open < 0) {
        // zero-arg endpoint renders `name: R`
        val ret = sig.substring(sig.indexOf(':') + 1).trim
        s"$doc  def ${e.name}: $ret =\n    api.${e.name}"
      } else {
        val close = sig.lastIndexOf(')')
        val params = splitParams(sig.substring(open + 1, close))
        val ret = sig.substring(close + 2).trim // skip "): "
        val decl = params.zipWithIndex
          .map { case (t, i) => s"arg$i: $t" }.mkString(", ")
        val pass = params.indices.map(i => s"arg$i").mkString(", ")
        s"$doc  def ${e.name}($decl): $ret =\n    api.${e.name}($pass)"
      }
    }
    val begin = tpl.indexOf(BeginEndpointsMarker)
    val end = tpl.indexOf(EndEndpointsMarker)
    require(begin < end, "template markers out of order")
    tpl.substring(0, begin + BeginEndpointsMarker.length) + "\n\n" +
      methods.mkString("\n\n") + "\n\n  " +
      tpl.substring(end)
  }

  /** Self-contained default facade template: everything outside the
    * marker pair survives regeneration verbatim (base_api.py's
    * template-file contract). */
  private def defaultApiTemplate: String =
    """// GraftApiFacade — GENERATED by `graft.Cli render api kiara_api`.
      |// Only the block between the endpoint markers is regenerated;
      |// everything else is yours to edit (kiara base_api.py template
      |// contract). Exotic parameter types may need extra imports.
      |package graft.client
      |
      |import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
      |
      |final class GraftApiFacade(spark: SparkSession, root: String) {
      |  private val api = new graft.GraftApi(spark, root)
      |
      |  // BEGIN AUTO-GENERATED-ENDPOINTS
      |  // END AUTO-GENERATED-ENDPOINTS
      |}
      |""".stripMargin

  /** One JOB record as a runnable replay script — kiara's
    * JobDescPythonScriptRenderer (renderers/included_renderers/job.py:56
    * renders a JobDesc through the pipeline script template: a job IS a
    * one-step pipeline). Reuses [[pipelineScript]] with the job's
    * (operation, input) as the single step; the bound input is the
    * stored value the job consumed. */
  def jobScript(jobId: String, operation: String, input: String): String =
    Seq(s"// graft job '$jobId' — generated replay (render job <root> $jobId script)",
      pipelineScript(jobId, Seq((s"${jobId}_out", operation, input)))
        .linesIterator.drop(1).mkString("\n")).mkString("\n")
}
