package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Convert, Export, Ingest, Serde, TypeMap}
import graft.registries.{AliasRegistry, DataRegistry}
import graft.operators.Profile

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("csv export → ingest round-trip preserves data") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    val tmp = Export.tempDir("t_csv_").toString
    Export.csv(df, tmp)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = Ingest.csv(spark, tmp, schema).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("json serde round-trip is identity") {
    val df = Tables.t(spark, sfDir, "nation")
    val back = Serde.roundTrip(df)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("convert resolves registered conversions and rejects unknown") {
    assert(Convert.available.contains(("csv", "table")))
    intercept[IllegalArgumentException] {
      Convert.convert("xml", "table")(spark, "/tmp/x", new StructType())
    }
  }

  test("file bundle read carries path metadata; pick subsets by path") {
    val tmp = Export.tempDir("t_bundle_").toString
    Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
      .repartition(2, col("lang")).write.partitionBy("lang").mode("overwrite").parquet(tmp)
    val bundle = Ingest.readBundle(spark, tmp)
    assert(bundle.columns.contains("_file_path") && bundle.columns.contains("_file_size"))
    val en = Ingest.pick(bundle, "lang=en")
    assert(en.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("type map: kiara types ⇄ spark types") {
    assert(TypeMap.toSpark("string") == StringType)
    assert(TypeMap.toSpark("integer") == LongType)
    assert(TypeMap.toKiara(DoubleType) == "float")
    assert(TypeMap.toKiara(MapType(StringType, StringType)) == "dict")
  }

  test("data + alias registry store/resolve/load round-trip") {
    val root = Export.tempDir("t_reg_").toString
    val reg = new DataRegistry(root)
    val al = new AliasRegistry(root)
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    reg.store("v1", df)
    al.set("latest", "v1")
    assert(reg.exists("v1") && reg.list == Seq("v1"))
    assert(al.resolve("latest").contains("v1"))
    assert(al.resolve("missing").isEmpty)
    val back = reg.load(spark, al.resolve("latest").get)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("x", "y"))
    intercept[IllegalArgumentException] { reg.store("../evil", df) }
  }

  test("profile computes one-pass stats with nulls") {
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, 1.0), (2L, null), (3L, 3.0))
      .toDF("id", "v")
    val p = Profile.profile(df, Seq("v")).head()
    assert(p.getString(0) == "v")
    assert(p.getLong(1) == 3L) // cnt
    assert(p.getLong(2) == 1L) // nulls
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 3.0)
    assert(p.getLong(5) == 2L) // ndv ignores null
  }

  test("schemaOf lists columns") {
    val s = Profile.schemaOf(Tables.t(spark, sfDir, "region")).collect()
    assert(s.map(_.getString(0)).toSeq == Seq("r_regionkey", "r_name"))
  }

  test("snapshots: versioned reads isolate appends; rollback is metadata-only") {
    import graft.sources.Snapshots
    val root = Export.tempDir("snapspec_").toString + "/t"
    assert(Snapshots.versions(root).isEmpty) // fresh table: no versions
    assert(Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root) == 1)
    assert(Snapshots.append(Seq((3L, "c")).toDF("id", "v"), root) == 2)
    assert(Snapshots.readAs(spark, root, 1).count() == 2) // v1 unaffected by the append
    assert(Snapshots.readAs(spark, root, 2).count() == 3)
    assert(Snapshots.rollback(root, 1) == 3)
    assert(Snapshots.readLatest(spark, root).count() == 2)
    assert(Snapshots.readAs(spark, root, 2).count() == 3) // time travel PAST the rollback
    assert(Snapshots.files(root, 3) == Snapshots.files(root, 1)) // no data moved
    // footer-derived counts equal the scan at every version — including
    // the rollback commit, whose manifest lists v1's files
    assert(Snapshots.metaCount(root, 1) == 2L)
    assert(Snapshots.metaCount(root, 2) == 3L)
    assert(Snapshots.metaCount(root, 3) == 2L)
  }

  test("snapshots: branch commits never touch main; publish fast-forwards metadata-only") {
    import graft.sources.Snapshots
    val root = Export.tempDir("snapbr_").toString + "/t"
    val v1 = Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    assert(Snapshots.createBranch(root, "wap", v1) == 1)
    Snapshots.append(Seq((3L, "m")).toDF("id", "v"), root)          // main diverges
    Snapshots.appendToBranch(Seq((4L, "s")).toDF("id", "v"), root, "wap")
    // isolation both ways
    assert(Snapshots.readLatest(spark, root).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(Snapshots.readBranch(spark, root, "wap").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    // publish: metadata-only fast-forward — no new data directories,
    // main now reads the branch head, the diverged version still
    // time-travels
    val dataDirsBefore = new java.io.File(s"$root/data").list().sorted.toSeq
    Snapshots.publishBranch(root, "wap")
    val dataDirsAfter = new java.io.File(s"$root/data").list().sorted.toSeq
    assert(dataDirsBefore == dataDirsAfter)
    assert(Snapshots.readLatest(spark, root).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(Snapshots.readAs(spark, root, 2).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // double-create refuses
    intercept[IllegalArgumentException] { Snapshots.createBranch(root, "wap", v1) }
  }

  test("snapshots: vacuum reclaims unreferenced files; added columns merge") {
    import graft.sources.Snapshots
    val root = Export.tempDir("snapvac_").toString + "/t"
    Snapshots.append(Seq((1L, "a")).toDF("id", "v"), root)           // v1
    Snapshots.append(Seq((2L, "b", 9.0)).toDF("id", "v", "w"), root) // v2 adds w
    val merged = Snapshots.readLatest(spark, root).orderBy("id").collect()
    assert(merged.map(_.schema.fieldNames.toSet).head == Set("id", "v", "w"))
    assert(merged(0).isNullAt(merged(0).fieldIndex("w"))) // pre-evolution row
    assert(merged(1).getDouble(merged(1).fieldIndex("w")) == 9.0)
    Snapshots.rollback(root, 1) // v3 = v1's files; v2's batch now orphanable
    val (dataGone, manifestsGone) = Snapshots.vacuum(root, keepLast = 1)
    assert(dataGone >= 1 && manifestsGone == 2)
    assert(Snapshots.versions(root) == Seq(3))
    assert(Snapshots.readLatest(spark, root).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("snapshots: vacuum spares branch-referenced files; orphan GC takes only strays") {
    import graft.sources.Snapshots
    val root = Export.tempDir("snaporphan_").toString + "/t"
    Snapshots.append(Seq((1L, "a")).toDF("id", "v"), root)            // v1
    Snapshots.append(Seq((2L, "b")).toDF("id", "v"), root)            // v2
    // branch forks at v1: its head references v1's batch even after the
    // main chain expires v1
    Snapshots.createBranch(root, "wap", 1)
    Snapshots.appendToBranch(Seq((3L, "c")).toDF("id", "v"), root, "wap")
    val (dataGone, _) = Snapshots.vacuum(root, keepLast = 1)
    assert(dataGone == 0, "vacuum must not reclaim branch-referenced batches")
    assert(Snapshots.readBranch(spark, root, "wap").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // a stray uncommitted write is an orphan; committed reads survive GC
    Seq((9L, "x")).toDF("id", "v").write.parquet(s"$root/data/stray_b99999")
    val deleted = Snapshots.orphanGc(root)
    assert(deleted.nonEmpty && deleted.forall(_.startsWith("data/stray_b99999")))
    assert(Snapshots.orphanGc(root).isEmpty, "second GC finds nothing")
    assert(Snapshots.readLatest(spark, root).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L)) // v2 is a cumulative append
    assert(Snapshots.readBranch(spark, root, "wap").count() == 2L)
    assert(Snapshots.listBranches(root) == Seq("wap"))
  }

  test("snapshots: replace overwrites, diff classifies keys, history survives") {
    import graft.sources.Snapshots
    val root = Export.tempDir("snapdiffspec_").toString + "/t"
    Snapshots.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root)  // v1
    Snapshots.replace(Seq((2L, 21.0), (3L, 30.0)).toDF("k", "v"), root) // v2
    val d = Snapshots.diff(spark, root, 1, 2, "k", Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(d.toSeq == Seq(("added", 3L), ("changed", 2L), ("removed", 1L)))
    // the overwrite did not touch v1's files: time travel still works
    assert(Snapshots.readAs(spark, root, 1).orderBy("k").collect()
      .map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
  }

  test("bucketed join is exchange-free and matches the plain join") {
    // disable broadcast so the join must be sort-merge: the bucketed
    // layout, not AQE's size heuristics, is what kills the shuffle
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.sources.Bucketing.ordersLineitemJoin(spark, sfDir)
      val rows = joined.collect()
      // Walk the post-AQE physical plan tree (the rendered string embeds
      // both the Final and Initial plan sections, so substring counting
      // is unreliable): find the SortMergeJoin node and assert its
      // subtree — traversing through AQE query-stage boundaries —
      // contains no shuffle. The orderBy/aggregate above it may still
      // exchange; only the join inputs must be co-located.
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val all = flattenPlan(joined.queryExecution.executedPlan)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount"),
        s"expected bucketed scans in plan:\n$planStr")
      val smj = all.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge join:\n$planStr")
      val shuffles = flattenPlan(smj.get).collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join inputs must not shuffle, found ${shuffles.size}:\n$planStr")
      // result parity with the straightforward non-bucketed join
      val plainRows = Tables.t(spark, sfDir, "orders")
        .join(Tables.t(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("o_orderstatus").collect()
      assert(rows.toSeq == plainRows.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("ParquetMeta walks hive-partitioned layouts recursively") {
    import graft.registries.ParquetMeta
    val dir = Export.tempDir("graft_meta_part_").toString + "/t"
    spark.range(100).selectExpr("id", "id % 4 AS k")
      .write.partitionBy("k").parquet(dir)
    assert(ParquetMeta.dirRowCount(dir) == 100L)
    assert(ParquetMeta.dirFileCount(dir) >= 4L)
    assert(ParquetMeta.dirSizeBytes(dir) > 0L)
    // non-directory input stays a zero, not an exception
    assert(ParquetMeta.dirRowCount(dir + "/nope") == 0L)
  }

  test("orc round trip is lossless and registered in the conversion graph") {
    val src = Tables.t(spark, sfDir, "supplier")
    val tmp = Export.tempDir("t_orc_").toString
    Export.orc(src, tmp)
    val back = Ingest.orc(spark, tmp)
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
    assert(Convert.available.contains(("orc", "table")))
  }

  test("equality deletes: merge-on-read filters, data files untouched, chains carry") {
    import graft.sources.Snapshots
    val root = Export.tempDir("dvspec_").toString + "/t"
    val rows = (1L to 20L).map(i => (i, i * 10.0)).toDF("k", "v")
    val v1 = Snapshots.append(rows, root)
    val v2 = Snapshots.deleteWhere(Seq(3L, 7L).toDF("k"), root, "k")
    // no data rewrite, and the plain reader refuses the delete version
    assert(Snapshots.files(root, v2) == Snapshots.files(root, v1))
    intercept[IllegalArgumentException](Snapshots.readAs(spark, root, v2))
    val got = Snapshots.readMergeOnRead(spark, root, v2, "k")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (1L to 20L).filterNot(Set(3L, 7L)))
    // a second delete CHAINS (carries the first version's keys)
    val v3 = Snapshots.deleteWhere(Seq(10L).toDF("k"), root, "k")
    val got3 = Snapshots.readMergeOnRead(spark, root, v3, "k")
      .collect().map(_.getLong(0)).sorted
    assert(got3.toSeq == (1L to 20L).filterNot(Set(3L, 7L, 10L)))
    // vacuum to the head must SPARE delete-vector files
    Snapshots.vacuum(root, keepLast = 1)
    val after = Snapshots.readMergeOnRead(spark, root, v3, "k")
      .collect().map(_.getLong(0)).sorted
    assert(after.toSeq == got3.toSeq, "vacuum must not reap delete vectors")
  }

  test("MoR upsert: one commit masks old rows without eating its own insert") {
    import graft.sources.Snapshots
    val root = Export.tempDir("upspec_").toString + "/t"
    val v1 = Snapshots.append((1L to 5L).map(i => (i, i * 10.0)).toDF("k", "v"), root)
    val v2 = Snapshots.upsert(Seq((2L, 999.0), (3L, 888.0)).toDF("k", "v"),
      root, "k")
    assert(v2 == v1 + 1, "one atomic version")
    val got = Snapshots.readMergeOnRead(spark, root, v2, "k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    // sequence semantics: the delete masks v1's rows for keys 2/3 but
    // NOT the same-version re-insert
    assert(got.toSeq == Seq((1L, 10.0), (2L, 999.0), (3L, 888.0),
      (4L, 40.0), (5L, 50.0)))
    // v1 still reads clean (no deletes at v1)
    assert(Snapshots.readAs(spark, root, v1).count() == 5)
  }

  test("maintMigrateFormat: adoption is lossless by all-column join") {
    val r = graft.queries.Suite.maintMigrateFormat(spark, sfDir).head()
    val (v, nSrc, nMig, nMatch) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(v == 1L && nSrc > 0)
    assert(nMig == nSrc && nMatch == nSrc,
      s"migration lost rows: src $nSrc migrated $nMig matching $nMatch")
  }
}
