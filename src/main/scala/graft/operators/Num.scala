package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object Num {
  /** Portable round-to-dp: floor(x·10^dp + 0.5)/10^dp with identical IEEE
    * ops in Spark and DuckDB. Plain round() disagrees between the engines
    * on half-boundaries (Spark rounds the shortest decimal string, DuckDB
    * rounds the binary double) — which small-integer ratios like jaccard
    * 7/160 actually hit. Oracle SQL must use the same formula. */
  def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * f + 0.5).cast("double") / f
  }
}
