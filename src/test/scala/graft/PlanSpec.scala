package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Executable plan-quality assertions — the properties PLANS.md claims,
  * verified on the live plans rather than by inspection: predicates and
  * column pruning must reach the parquet scan, dimension joins must
  * broadcast, and orderBy+limit must not shuffle a full sort.
  */
class PlanSpec extends SparkTestBase {

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    flattenPlan(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
  }

  test("q2_filter pushes predicates and prunes columns at the scan") {
    val scans = scansOf(SparkEntry.queries("q2_filter")(spark, sfDir))
    assert(scans.size == 1)
    val s = scans.head
    // both conjuncts reach the parquet reader as pushed filters
    val pushed = s.metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(l_quantity"), s"pushed=$pushed")
    assert(pushed.contains("GreaterThan(l_discount"), s"pushed=$pushed")
    // only the referenced columns are read — not the 16-column table
    val readCols = s.requiredSchema.fieldNames.toSet
    assert(readCols == Set("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount"), s"read=$readCols")
  }

  test("text queries read only the columns they use") {
    val scans = scansOf(SparkEntry.queries("text_tokens")(spark, sfDir))
    assert(scans.size == 1)
    assert(scans.head.requiredSchema.fieldNames.toSet == Set("doc_id", "text"))
  }

  test("size-based planning broadcasts small join sides without hints") {
    // newSession INHERITS the builder-level threshold=-1 from TestSpark,
    // so restore the Spark default explicitly — and use q3, which since
    // r3 carries NO broadcast hints: the BroadcastHashJoin below must
    // come from size estimation alone
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val df = SparkEntry.queries("q3_join")(s2, sfDir)
    df.collect()
    val all = flattenPlan(df.queryExecution.executedPlan)
    val bhj = all.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "expected size-based broadcast joins at sf0.001")
    val joinSubtreeShuffles = bhj.flatMap(j => flattenPlan(j))
      .collect { case e: ShuffleExchangeExec => e }
    assert(joinSubtreeShuffles.isEmpty,
      "dimension join inputs must not shuffle")
  }

  test("hinted dimension joins broadcast with no shuffle below the join") {
    val df = SparkEntry.queries("q6_region_join")(spark, sfDir)
    df.collect()
    val all = flattenPlan(df.queryExecution.executedPlan)
    val bhj = all.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, "expected both dims broadcast")
    assert(bhj.flatMap(j => flattenPlan(j))
      .collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("orderBy+limit compiles to TakeOrderedAndProject (no global sort)") {
    val df = SparkEntry.queries("q4_sort_limit")(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val top = flattenPlan(df.queryExecution.executedPlan)
      .collect { case t: TakeOrderedAndProjectExec => t }
    assert(top.nonEmpty, s"plan:\n${df.queryExecution.executedPlan}")
  }
}
