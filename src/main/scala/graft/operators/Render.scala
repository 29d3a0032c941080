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
    "html" -> "escaped HTML table")

  /** Render a frame through a named target — kiara's `render item`
    * dispatch (render_value.py:54 picks the renderer by format). */
  def as(target: String, df: DataFrame, rows: Int = 20): String = target match {
    case "string"   => prettyPrint(df, rows)
    case "markdown" => markdown(df, rows)
    case "html"     => html(df, rows)
    case other => throw new IllegalArgumentException(
      s"unknown renderer: $other (see `render list-renderers`)")
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
