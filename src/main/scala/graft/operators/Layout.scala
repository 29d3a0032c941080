package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registries.ParquetMeta

/** Clustered storage layouts — the data-skipping half of table
  * maintenance (kiara keeps values as parquet dirs,
  * `registries/data/data_store/`; at 100 TB HOW those files are laid
  * out decides whether a selective query reads 1 file or all of them).
  *
  * Two layouts:
  *  - [[clusterWrite]]: range-partition + sort on ONE key → per-file
  *    key ranges are pairwise disjoint, so a point/range predicate on
  *    that key prunes to O(1) files from footer min/max stats alone.
  *  - [[zorderWrite]]: range-partition + sort on the Morton (Z-order)
  *    interleave of TWO keys → each file covers a small rectangle in
  *    (x,y) space, so a predicate on EITHER column skips most files —
  *    the multi-dimensional clustering trade: neither column gets the
  *    perfect 1-D layout, both get a usable one.
  *
  * Both are one declarative Catalyst plan (a range-exchange shuffle +
  * per-partition sort — the cost of any global sort, AQE-compatible).
  * The z-value is pure codegen'd integer arithmetic: grid coordinates
  * use only subtraction and integer division (NO multiplication, so
  * the expression cannot overflow however wide the key range — ANSI-
  * safe at any scale), then 16 shift/mask/or terms per dimension.
  * Column min/max bounds ride along as a broadcast 1-row aggregate —
  * nothing is collected to the driver.
  */
object Layout {

  /** Spark-SQL text of the 16-bit grid coordinate (c − min) DIV width,
    * width = ceil((max−min+1)/65536) ≥ 1 — guarantees the coordinate
    * fits 0..65535 with equal-width bins. `min`/`max` are column names
    * from the bounds aggregate. */
  private def gridSql(c: String, min: String, max: String): String =
    s"(($c - $min) DIV greatest(1L, ($max - $min + 65536L) DIV 65536L))"

  /** Morton interleave of the two 16-bit grid coordinates `zx`/`zy`
    * (column names): x bits land on even positions, y bits on odd. */
  private def mortonSql(zx: String, zy: String): String =
    (0 until 16).map { i =>
      s"shiftleft(shiftright($zx, $i) & 1, ${2 * i}) | " +
        s"shiftleft(shiftright($zy, $i) & 1, ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Project `df` plus its Z-order value over columns `x` and `y`
    * (both integral): zx/zy are the 16-bit grid coordinates, zval the
    * interleaved Morton code. The min/max bounds come from a broadcast
    * one-row aggregate, so this is two scans and zero driver state. */
  def zValues(df: DataFrame, x: String, y: String): DataFrame = {
    val b = df.agg(
      min(col(x)).cast("long").as("_minx"), max(col(x)).cast("long").as("_maxx"),
      min(col(y)).cast("long").as("_miny"), max(col(y)).cast("long").as("_maxy"))
    df.crossJoin(broadcast(b))
      .withColumn("zx", expr(gridSql(x, "_minx", "_maxx")).cast("long"))
      .withColumn("zy", expr(gridSql(y, "_miny", "_maxy")).cast("long"))
      .withColumn("zval", expr(mortonSql("zx", "zy")).cast("long"))
      .drop("_minx", "_maxx", "_miny", "_maxy")
  }

  /** Write `df` range-partitioned AND sorted on `key` into ~`nFiles`
    * files: per-file key ranges end up pairwise disjoint, so footer
    * stats alone answer "which files can hold key = k". */
  def clusterWrite(df: DataFrame, key: String, outDir: String, nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Write `df` clustered on the Z-order of (`x`,`y`): range-partition
    * by zval (so files tile the space-filling curve) and sort within
    * partitions (so row groups inside a file stay tight too). The zval
    * is layout-only and is not persisted. */
  def zorderWrite(df: DataFrame, x: String, y: String, outDir: String,
                  nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    zValues(df, x, y)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zx", "zy", "zval")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Hive-style partitioned layout: write split by a categorical
    * column's VALUE into per-value directories, so an equality filter on
    * it prunes whole directories at planning time — the scan never even
    * LISTS the other partitions' files. This is the coarsest and
    * cheapest data-skipping tier (no footer reads at all), sitting above
    * the min/max file skipping [[clusterWrite]]/[[zorderWrite]] give
    * INSIDE a partition; at 100 TB the two compose (partition by the
    * hot categorical, cluster within). Only low-cardinality columns
    * belong here — each value is a directory, and small-file explosion
    * is the classic failure mode of over-partitioning. */
  def hivePartitionWrite(df: DataFrame, key: String, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(key).parquet(outDir)

  /** How many part-files a scan with predicate `lo ≤ col ≤ hi` must
    * read, judged from footer min/max only — the file-skipping measure
    * (the planner's pruning uses exactly this metadata). */
  def filesTouched(dir: String, column: String, lo: Long, hi: Long): Int =
    ParquetMeta.fileRanges(dir, column).count { case (_, mn, mx) =>
      mx >= lo && mn <= hi
    }

  /** Iceberg-style HIDDEN partitioning: the table is physically
    * partitioned by a DERIVED transform of an existing column
    * (day(ts)), and the read path accepts predicates on the RAW column
    * — the caller never sees or manages the partition column, the
    * library derives the partition filter from the predicate. This is
    * what plain hive layouts ([[hivePartitionWrite]]) cannot offer:
    * there the user must know and filter the partition column
    * themselves, and a raw-ts predicate scans everything. */
  def hiddenDayPartitionWrite(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("__day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("__day").parquet(outDir)

  /** Read with a raw time-range predicate `[lo, hi)` (yyyy-MM-dd
    * HH:mm:ss strings, session zone): the day-transform bounds derive
    * from the predicate and become PARTITION filters (pruned at
    * planning — asserted in LayoutSpec), the exact bound re-applies on
    * the surviving rows. At 100 TB this is the difference between
    * touching a few day directories and scanning the table. */
  def timeRangeRead(spark: SparkSession, dir: String, tsCol: String,
                    lo: String, hi: String): DataFrame = {
    val (loDay, hiDay) = (lo.take(10), hi.take(10))
    spark.read.parquet(dir)
      .filter(col("__day") >= loDay && col("__day") <= hiDay)
      .filter(col(tsCol) >= to_timestamp(lit(lo)) && col(tsCol) < to_timestamp(lit(hi)))
      .drop("__day")
  }

  /** Per-file BLOOM index over an arbitrary expression — the skipping
    * story min/max zone maps cannot tell: a high-cardinality column
    * UNCORRELATED with the physical layout (a content hash over a
    * time-clustered corpus) has every file spanning the whole value
    * domain, so footer ranges prune nothing, while a per-file bloom
    * sketch answers "which files might hold THIS value" in O(files)
    * probes. This is the Iceberg/Parquet bloom-filter idea built from
    * Spark's own BloomFilterAggregate as an explicit, queryable index
    * table: (file, n_rows, bloom).
    *
    * Scale shape: ONE scan of the table builds every file's sketch in
    * parallel (grouped TypedImperativeAggregate on `_metadata.file_path`
    * — partials merge executor-side); sketches are sized from the
    * footer-only row count (no pre-scan), ~10 bits/row. The index is
    * file-count-sized — the thing a 100 TB table has thousands of, not
    * billions — so probing it is a metadata operation, and a false
    * positive only costs an extra file read, never a wrong row (the
    * exact predicate re-applies on the survivors). */
  def bloomFileIndex(spark: SparkSession, dir: String,
                     key: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.graftext.BloomMembership
    val nFiles = math.max(1L, ParquetMeta.dirFileCount(dir))
    val perFile = math.max(1024L, ParquetMeta.dirRowCount(dir) / nFiles)
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("n_rows"),
        BloomMembership.bloomAgg(xxhash64(key), perFile).as("bloom"))
  }

  /** The files a point lookup `key ∈ probes` must read, judged from the
    * bloom index alone. Probing happens DRIVER-side against the
    * collected index — the coordinator role every table format gives
    * file pruning — which is bounded because the index is
    * file-count-sized metadata, not data. `probeHashes` are xxhash64
    * values of the probe keys (the same hash the index was built on);
    * the sketches deserialize through the same
    * `org.apache.spark.util.sketch.BloomFilter` that
    * BloomFilterAggregate wrote, so probe and build share one bit
    * layout by construction. */
  def bloomFilesTouched(index: DataFrame, probeHashes: Seq[Long]): Seq[String] = {
    import org.apache.spark.util.sketch.BloomFilter
    index.select(col("file"), col("bloom")).collect().iterator.flatMap { r =>
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      if (probeHashes.exists(bf.mightContainLong)) Some(r.getString(0)) else None
    }.toSeq.sorted
  }

  /** DuckDB-portable SQL for the same grid + Morton computation (the
    * oracle side of the parity check): `//` integer division and
    * operator shifts instead of Spark's DIV/shiftleft. */
  def mortonOracleSql(zx: String, zy: String): String =
    (0 until 16).map { i =>
      s"((($zx >> $i) & 1) << ${2 * i}) | ((($zy >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  def gridOracleSql(c: String, min: String, max: String): String =
    s"(($c - $min) // greatest(1, ($max - $min + 65536) // 65536))"
}
