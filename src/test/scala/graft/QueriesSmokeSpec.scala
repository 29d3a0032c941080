package graft

/** Every registered query key must execute end-to-end at sf0.001 and
  * produce a sane row count — the same surface the driver exercises.
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val expectEmptyOk = Set("dedup_minhash", "dedup_simhash")

  test("entry produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!expectEmptyOk(name)) assert(n > 0, s"$name returned no rows")
      else assert(n >= 0)
    }
  }
}
