package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.VectorFunctions

/** The SQL kernel catalog (r15): every graftext kernel callable from SQL
  * text, matching its Column-API twin bit-for-bit, and staying inside
  * whole-stage codegen (no interpreted fallback — the r11 lesson that
  * killed the unrolled-Column formulation applies doubly to a SQL front
  * door that users will put in join conditions).
  */
class SqlKernelsSpec extends SparkTestBase {
  import spark.implicits._

  private def ensure(): Unit = VectorFunctions.registerAll(spark)

  test("every catalog kernel is registered and callable from SQL text") {
    ensure()
    VectorFunctions.sqlKernels.foreach { case (name, _) =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"kernel not registered: $name")
    }
  }

  test("row-local kernels match their Column-API twins from SQL") {
    ensure()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with other words entirely"))
      .toDF("doc_id", "text")
      .withColumn("toks", split(lower(col("text")), " "))
    docs.createOrReplaceTempView("sk_docs")
    // minhash signature
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash_sig(toks, 3, 32) AS sig FROM sk_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = docs.select(col("doc_id"),
      org.apache.spark.sql.graftext.Shingles.minhashSig(col("toks"), 3, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaCol)
    // gram hashes + winnowing
    val gSql = spark.sql("SELECT graft_gram_hashes(toks, 3) FROM sk_docs WHERE doc_id = 1")
      .head().getSeq[Long](0)
    val gCol = docs.filter($"doc_id" === 1).select(
      org.apache.spark.sql.graftext.Shingles.gramHashes(col("toks"), 3))
      .head().getSeq[Long](0)
    assert(gSql == gCol && gSql.nonEmpty)
    val wSql = spark.sql("SELECT graft_winnow_fps(toks, 3, 4) FROM sk_docs WHERE doc_id = 1")
      .head().getSeq[Long](0)
    val wCol = docs.filter($"doc_id" === 1).select(
      org.apache.spark.sql.graftext.Shingles.winnowFps(col("toks"), 3, 4))
      .head().getSeq[Long](0)
    assert(wSql == wCol && wSql.nonEmpty)
    // row-local simhash
    val shSql = spark.sql("SELECT doc_id, graft_simhash(toks) AS h FROM sk_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shCol = docs.select(col("doc_id"),
      org.apache.spark.sql.graftext.SimHash.simhash(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shSql == shCol)
  }

  test("graft_nfc normalizes decomposed text; identity on ASCII") {
    ensure()
    Seq(("café", "café"), ("plain ascii", "plain ascii"))
      .toDF("raw", "want").createOrReplaceTempView("sk_nfc")
    val rows = spark.sql("SELECT graft_nfc(raw) = want FROM sk_nfc").collect()
    assert(rows.forall(_.getBoolean(0)))
  }

  test("graft_int8_quantize and graft_dot compose in SQL (quantized cosine path)") {
    ensure()
    Seq((Array(0.1f, -0.5f, 1.0f), Array(0.2f, 0.4f, -1.0f)))
      .toDF("a", "b").createOrReplaceTempView("sk_vec")
    val q = spark.sql(
      "SELECT graft_dot(graft_int8_quantize(a).q, graft_int8_quantize(b).q) FROM sk_vec")
      .head().getDouble(0)
    val qc = Seq((Array(0.1f, -0.5f, 1.0f), Array(0.2f, 0.4f, -1.0f))).toDF("a", "b")
      .select(VectorFunctions.dot(
        org.apache.spark.sql.graftext.Quantize.int8(col("a")).getField("q"),
        org.apache.spark.sql.graftext.Quantize.int8(col("b")).getField("q")))
      .head().getDouble(0)
    assert(q == qc)
  }

  test("graft_lsh_canon from SQL matches the Column twin and demands literals") {
    ensure()
    val df = Seq((Array(5, 3), Array(5, 7)), (Array(1, 2), Array(3, 4)))
      .toDF("q", "n")
    df.createOrReplaceTempView("sk_lsh")
    val viaSql = spark.sql("SELECT graft_lsh_canon(q, n, 4, true) FROM sk_lsh")
      .collect().map(_.getInt(0)).toSeq
    val viaCol = df.select(VectorFunctions.lshCanon(col("q"), col("n"), 4, multiProbe = true))
      .collect().map(_.getInt(0)).toSeq
    assert(viaSql == viaCol)
    // static params must be literals — they parameterize generated code
    val e = intercept[Exception](
      spark.sql("SELECT graft_lsh_canon(q, n, q[0], true) FROM sk_lsh").collect())
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("aggregate kernels: simhash_agg equals row-local simhash; sketches and bloom run") {
    ensure()
    Seq((1L, Seq("a", "b", "c")), (2L, Seq("x", "y", "z")))
      .toDF("doc_id", "toks").createOrReplaceTempView("sk_agg")
    // exploded-token aggregate == row-local expression (same bit rules)
    val both = spark.sql(
      """SELECT a.doc_id FROM
        |  (SELECT doc_id, graft_simhash_agg(xxhash64(tok)) AS h
        |   FROM (SELECT doc_id, explode(toks) AS tok FROM sk_agg) GROUP BY doc_id) a
        |JOIN (SELECT doc_id, graft_simhash(toks) AS h FROM sk_agg) b
        |  ON a.doc_id = b.doc_id AND a.h = b.h""".stripMargin).count()
    assert(both == 2L)
    // sketch aggregates produce usable output through SQL
    val row = spark.sql(
      """SELECT graft_theta(doc_id) AS t,
        |       graft_kll(cast(doc_id AS DOUBLE)) AS k,
        |       graft_frequent(cast(doc_id AS STRING), 4) AS f
        |FROM sk_agg""".stripMargin).head()
    assert(!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2))
    // bloom build + probe round trip
    spark.sql(
      """SELECT graft_bloom_agg(xxhash64(cast(doc_id AS STRING)), 100) AS bl
        |FROM sk_agg""".stripMargin).createOrReplaceTempView("sk_bloom")
    // the probe's sketch side must be a constant or scalar subquery
    // (Spark's might_contain contract — same as the Column-API lit(bytes))
    val probes = spark.sql(
      """SELECT graft_might_contain((SELECT bl FROM sk_bloom),
        |         xxhash64(cast(1 AS STRING))) AS hit,
        |       graft_might_contain((SELECT bl FROM sk_bloom),
        |         xxhash64(cast(999 AS STRING))) AS miss""".stripMargin).head()
    assert(probes.getBoolean(0))
    assert(!probes.getBoolean(1)) // ~1% fpp at 10 bits/item; key fixed → deterministic
  }

  test("SQL kernel projection stays inside whole-stage codegen") {
    ensure()
    // a parquet-backed scan: a LocalRelation would constant-fold the
    // whole projection into a LocalTableScan with no codegen to observe
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .createOrReplaceTempView("sk_cg")
    val df = spark.sql(
      "SELECT doc_id, graft_minhash_sig(toks, 3, 16) AS sig, graft_simhash(toks) AS h FROM sk_cg")
    df.collect()
    import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
    val plan = flattenPlan(df.queryExecution.executedPlan)
    val codegenned = plan.collect { case w: WholeStageCodegenExec => w }
      .flatMap(flattenPlan).collect { case p: ProjectExec => p }
    assert(codegenned.exists(_.projectList.exists(
      _.toString.contains("graft_minhash_sig"))),
      s"kernel projection fell out of codegen:\n${df.queryExecution.executedPlan}")
  }

  test("GraftExtensions injects the full catalog (not just graft_dot)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new org.apache.spark.sql.graftext.GraftExtensions().apply(ext)
    // injection applies at session build; building a second session in
    // this JVM is not possible, so assert the injected list by building
    // the catalog the extension iterates
    assert(VectorFunctions.sqlKernels.map(_._1).toSet.contains("graft_minhash_sig"))
    assert(VectorFunctions.sqlKernels.size >= 14)
  }
}
