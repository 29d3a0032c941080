package graft

/** Every registered query key must execute end-to-end at sf0.001 and
  * produce a sane row count — the same surface the driver exercises.
  */
class QueriesSmokeSpec extends SparkTestBase {

  // dedup_simhash left this set in r8: its planted tail-edit twins
  // guarantee pairs at any SF
  private val expectEmptyOk = Set("dedup_minhash")

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

  test("q13Approx tracks the exact percentiles within 1%") {
    import org.apache.spark.sql.functions._
    val approx = graft.queries.Relational.q13Approx(spark, sfDir)
    val exact = graft.Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("median_exact"),
        expr("percentile(l_extendedprice, 0.75)").as("q75_exact"))
    approx.join(exact, "l_returnflag").collect().foreach { r =>
      val (ma, me) = (r.getDouble(1), r.getDouble(3))
      val (qa, qe) = (r.getDouble(2), r.getDouble(4))
      assert(math.abs(ma - me) <= math.max(1.0, me * 0.01), s"median drifted: $ma vs $me")
      assert(math.abs(qa - qe) <= math.max(1.0, qe * 0.01), s"q75 drifted: $qa vs $qe")
    }
  }
}
