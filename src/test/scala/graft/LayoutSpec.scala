package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.registries.ParquetMeta
import graft.sources.Export

class LayoutSpec extends SparkTestBase {

  /** Reference Morton interleave computed driver-side, bit by bit. */
  private def morton(zx: Long, zy: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((zx >> i) & 1L) << (2 * i)) | (((zy >> i) & 1L) << (2 * i + 1))
    }

  test("zValues matches the reference Morton interleave bit for bit") {
    // 64x64 grid: ranges fit 16 bits directly (grid width 1, zx == x)
    val d = spark.range(0, 4096)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y")
    val got = Layout.zValues(d, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size == 4096)
    got.foreach { case ((x, y), (zx, zy, zval)) =>
      assert(zx == x && zy == y, s"grid width must be 1 on a 64x64 grid ($x,$y)")
      assert(zval == morton(x, y), s"zval mismatch at ($x,$y)")
    }
    // hand-checked corner: x=0b11, y=0b01 -> 0b0111 = 7
    assert(morton(3, 1) == 7L)
  }

  test("grid coordinates stay within 16 bits for ranges beyond 65536") {
    val d = spark.range(0, 1000)
      .selectExpr("id * 1000 AS x", "id AS y") // x spans ~1M: width > 1
    val zs = Layout.zValues(d, "x", "y").agg(
      max(col("zx")).as("mx"), min(col("zx")).as("mn")).head()
    assert(zs.getLong(0) <= 65535L && zs.getLong(1) >= 0L)
  }

  test("z-order layout prunes files on BOTH dimensions; 1-D clustering on one") {
    val d = spark.range(0, 4096)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y", "id AS payload")
    val zdir = Export.tempDir("graft_zorder_").toString + "/t"
    val cdir = Export.tempDir("graft_linear_").toString + "/t"
    Layout.zorderWrite(d, "x", "y", zdir, 16)
    Layout.clusterWrite(d, "x", cdir, 16)
    assert(ParquetMeta.dirRowCount(zdir) == 4096L) // lossless
    val nz = ParquetMeta.dirFileCount(zdir).toInt
    val nc = ParquetMeta.dirFileCount(cdir).toInt
    // narrow predicates on each dimension: x in [0,3], y in [0,3]
    val zx = Layout.filesTouched(zdir, "x", 0, 3)
    val zy = Layout.filesTouched(zdir, "y", 0, 3)
    val cx = Layout.filesTouched(cdir, "x", 0, 3)
    val cy = Layout.filesTouched(cdir, "y", 0, 3)
    // z-order: each file is a rectangle tile, so BOTH dims prune well
    assert(zx <= nz / 2, s"zorder must prune on x: touched $zx of $nz")
    assert(zy <= nz / 2, s"zorder must prune on y: touched $zy of $nz")
    // 1-D clustering: perfect on the sort key...
    assert(cx <= 2, s"clustered layout must prune hard on its key: $cx of $nc")
    // ...and useless on the other dimension (every file spans all y)
    assert(cy == nc, s"1-D layout cannot prune the other dim: $cy of $nc")
    // and the zorder write is what a full-table reader still sums correctly
    assert(spark.read.parquet(zdir).agg(sum("payload")).head().getLong(0)
      == (0L until 4096L).sum)
  }

  test("filesTouched honors closed-interval overlap semantics") {
    val dir = Export.tempDir("graft_ft_").toString + "/t"
    Layout.clusterWrite(
      spark.range(0, 100).selectExpr("id AS k"), "k", dir, 4)
    val ranges = ParquetMeta.fileRanges(dir, "k").sortBy(_._2)
    assert(ranges.size > 1)
    // the whole domain touches every file; an out-of-range probe none
    assert(Layout.filesTouched(dir, "k", 0, 99) == ranges.size)
    assert(Layout.filesTouched(dir, "k", 1000, 2000) == 0)
    // a file's exact max is still inside that file (closed interval)
    val (_, _, firstMax) = ranges.head
    assert(Layout.filesTouched(dir, "k", firstMax, firstMax) >= 1)
  }

  test("hive-partitioned read prunes to one partition directory at planning time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs = Tables.t(spark, sfDir, "documents")
    val dir = Export.tempDir("hive_spec_").toString
    Layout.hivePartitionWrite(docs, "lang", dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en").select("doc_id")
    val scans = flattenPlan(q.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "the lang filter must become a partition filter, not a data filter")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      "only the lang=en directory may survive pruning")
    // and the partitioned round trip loses nothing
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("hidden partitioning: a raw ts-range read prunes to the matching day dirs") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = Tables.t(spark, sfDir, "events")
    val dir = Export.tempDir("hidden_spec_").toString + "/t"
    Layout.hiddenDayPartitionWrite(ev, "ts", dir)
    val total = spark.read.parquet(dir).select("__day").distinct().count()
    val q = Layout.timeRangeRead(spark, dir, "ts",
      "2024-01-10 00:00:00", "2024-01-15 00:00:00").select("event_id")
    val scans = flattenPlan(q.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "the derived day bounds must become partition filters")
    val touched = scans.head.selectedPartitions.partitionCount
    // [Jan 10, Jan 15) needs at most the 6 day dirs Jan 10..15
    assert(touched <= 6 && touched < total,
      s"expected <=6 of $total day dirs, scanned $touched")
    // and the pruned read returns exactly the raw-predicate rows
    assert(q.count() == ev.filter(
      col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
      col("ts") < to_timestamp(lit("2024-01-15 00:00:00"))).count())
  }

  test("bloom file index: a planted key prunes to its one file, an absent key to none") {
    import spark.implicits._
    // 8 files clustered by k; the probe column v is k-aligned so each v
    // value lives in exactly one file — but v's per-file min/max spans
    // overlap by construction (v = k with bit 20 flipped), so only the
    // bloom, not a zone map, can tell which file
    val df = (0L until 800L).map(k => (k, s"v${k ^ (1L << 20)}")).toDF("k", "v")
    val dir = Export.tempDir("bloom_spec_").toString + "/t"
    Layout.clusterWrite(df, "k", dir, 8)
    val idx = Layout.bloomFileIndex(spark, dir, col("v"))
    assert(idx.count() == 8)
    def hashOf(s0: String): Long =
      Seq(s0).toDF("p").select(xxhash64(col("p"))).head().getLong(0)
    val present = Layout.bloomFilesTouched(idx, Seq(hashOf(s"v${5L ^ (1L << 20)}")))
    assert(present.size == 1, s"one planted key must touch ~1 file, got $present")
    // the pruned read still finds the row
    val hit = spark.read.parquet(present: _*).filter(col("k") === 5L).count()
    assert(hit == 1L)
    val absent = Layout.bloomFilesTouched(idx, Seq(hashOf("not-a-value")))
    assert(absent.size <= 1, "an absent key may only touch false-positive files")
  }
}
