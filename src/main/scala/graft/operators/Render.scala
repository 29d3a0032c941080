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
}
