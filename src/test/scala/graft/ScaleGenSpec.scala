package graft

import org.apache.spark.sql.functions._

class ScaleGenSpec extends SparkTestBase {

  test("ScaleGen: key-shifted replicas are disjoint, salted, calendar-extended") {
    val out = graft.sources.Export.tempDir("graft_scale_").toString
    ScaleGen.generate(spark, sfDir, out, reps = 2)
    def cnt(d: String, t: String) = Tables.t(spark, d, t).count()
    // facts double; true dimensions don't
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(cnt(out, t) == 2 * cnt(sfDir, t), s"$t not doubled")
    assert(cnt(out, "region") == cnt(sfDir, "region"))
    assert(cnt(out, "nation") == cnt(sfDir, "nation"))
    // replica keys are disjoint (distinct count doubles too)
    val docs = Tables.t(spark, out, "documents")
    assert(docs.select("doc_id").distinct().count() == 2 * cnt(sfDir, "documents"))
    // replica-1 text is salted: same doc across replicas differs, and the
    // shared-token overlap stays high enough to be the "same" distribution
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").as("t0"))
    val rep = docs.filter(col("doc_id") >= 10000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"), col("text").as("t1"),
        col("n_chars"))
    val joined = rep.join(base, "doc_id").cache()
    assert(joined.filter(col("t0") === col("t1")).count() == 0)
    assert(joined.filter(length(col("t1")) =!= col("n_chars")).count() == 0)
    // 3-gram jaccard between a doc and its salted twin sits below the 0.8
    // near-dup threshold (the quadratic-pair-explosion guard)
    def grams(toks: String) = expr(s"array_distinct(transform(" +
      s"sequence(1, greatest(size($toks) - 2, 1)), " +
      s"i -> concat_ws(' ', slice($toks, i, 3))))")
    val jac = joined
      .withColumn("k0", split(lower(col("t0")), "[^a-z0-9]+"))
      .withColumn("k1", split(lower(col("t1")), "[^a-z0-9]+"))
      .withColumn("g0", grams("k0"))
      .withColumn("g1", grams("k1"))
      .select((size(array_intersect(col("g0"), col("g1"))).cast("double") /
        size(array_union(col("g0"), col("g1")))).as("j"))
    assert(jac.agg(max("j")).head().getDouble(0) < 0.8)
    joined.unpersist()
    // events: calendar span roughly doubles, users disjoint
    val ev = Tables.t(spark, out, "events")
    val (mn, mx) = { val r = ev.agg(min("ts"), max("ts")).head()
      (r.getTimestamp(0), r.getTimestamp(1)) }
    val evBase = Tables.t(spark, sfDir, "events")
    val (bmn, bmx) = { val r = evBase.agg(min("ts"), max("ts")).head()
      (r.getTimestamp(0), r.getTimestamp(1)) }
    val baseSpan = bmx.getTime - bmn.getTime
    assert(mx.getTime - mn.getTime > 1.5 * baseSpan)
    assert(ev.select("user_id").distinct().count() ==
      2 * evBase.select("user_id").distinct().count())
    // embeddings: replica vectors are perturbed, not exact cosine twins
    val emb = Tables.t(spark, out, "embeddings")
    val e0 = emb.filter(col("vec_id") < 10000000L)
      .select(col("vec_id"), col("embedding").as("a"))
    val e1 = emb.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"), col("embedding").as("b"))
    assert(e0.join(e1, "vec_id").filter(expr("a = b")).count() == 0)
  }

  test("ScaleGen only= mode writes just the named tables") {
    val out = graft.sources.Export.tempDir("graft_scale_only_").toString
    ScaleGen.generate(spark, sfDir, out, reps = 2, only = Set("embeddings"))
    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(written == Set("embeddings.parquet"), s"wrote: $written")
    assert(Tables.t(spark, out, "embeddings").count() ==
      2 * Tables.t(spark, sfDir, "embeddings").count())
  }

  test("ScaleGen planted mode: disjoint replicas, prefix twins at controlled containment/jaccard") {
    val out = graft.sources.Export.tempDir("graft_scale_pl_").toString
    ScaleGen.generate(spark, sfDir, out, reps = 2, planted = true)
    val docs = Tables.t(spark, out, "documents").cache()
    val nBase = Tables.t(spark, sfDir, "documents").count()
    // every replica plants one twin per (doc_id % 101 == 0, >= 12 tokens) doc
    val nTwins = docs.filter(pmod(col("doc_id"), lit(10000000L)) >= 5000000L).count()
    assert(nTwins > 0 && nTwins < nBase / 20, s"twin count $nTwins out of band")
    assert(docs.count() == 2 * nBase + nTwins)
    // cross-replica gram overlap is ZERO: every replica-1 token is suffixed
    val shared = docs.filter(col("doc_id") < 5000000L)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .join(docs.filter(col("doc_id") >= 10000000L)
        .select(explode(split(col("text"), " ")).as("w")).distinct(), "w")
      .count()
    assert(shared == 0, s"$shared tokens shared across planted replicas")
    // each twin is a token PREFIX of its original: containment = 1.0 and
    // gram-jaccard ≈ the kept-length fraction (0.55–0.90 spread)
    def grams(toks: String) = expr(s"array_distinct(transform(" +
      s"sequence(1, greatest(size($toks) - 2, 1)), " +
      s"i -> concat_ws(' ', slice($toks, i, 3))))")
    val twins = docs.filter(pmod(col("doc_id"), lit(10000000L)) >= 5000000L)
      .select((col("doc_id") - 5000000L).as("doc_id"), col("text").as("tt"))
    val pairs = twins.join(docs.select(col("doc_id"), col("text").as("to")), "doc_id")
      .withColumn("gt", grams("split(tt, ' ')"))
      .withColumn("go", grams("split(to, ' ')"))
      .select(
        (size(array_intersect(col("gt"), col("go"))).cast("double") /
          size(col("gt"))).as("containment"),
        (size(array_intersect(col("gt"), col("go"))).cast("double") /
          size(array_union(col("gt"), col("go")))).as("j"))
      .cache()
    assert(pairs.count() == nTwins)
    assert(pairs.filter(col("containment") < 1.0).count() == 0)
    val (jmin, jmax) = { val r = pairs.agg(min("j"), max("j")).head()
      (r.getDouble(0), r.getDouble(1)) }
    assert(jmin >= 0.4 && jmax <= 0.95 && jmax - jmin > 0.1,
      s"jaccard spread [$jmin, $jmax] not controlled")
    pairs.unpersist(); docs.unpersist()
  }
}
