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
    case other => throw new IllegalArgumentException(
      s"unknown renderer: $other (see `render list-renderers`)")
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
}
