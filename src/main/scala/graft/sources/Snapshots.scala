package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot isolation over plain parquet — the minimal
  * table-format core (the Iceberg/Delta idea, dependency-free): a table
  * is a DIRECTORY of immutable data files plus a chain of numbered
  * manifests, each listing exactly the files visible at that version.
  * Appends write new files and a new manifest; readers resolve a
  * manifest and scan only its files, so "the table as of version 2"
  * stays reproducible forever — the provenance property kiara's value
  * lineage gives single values (/root/reference/src/kiara/registries/
  * data/data_store/__init__.py — stored values are immutable and
  * re-resolvable), generalized to evolving tables.
  *
  * Scale shape: a commit touches ONLY its own batch (one distributed
  * write + an O(files) manifest append — no rewrite of standing data);
  * a versioned read plans exactly the manifest's file list, so old
  * versions don't pay for newer data; rollback is a metadata-only
  * commit (no data IO at any size). Manifests hold paths RELATIVE to
  * the table root (the directory can move). Single-writer per table by
  * design — real formats add a CAS on the latest-version pointer; the
  * numbered-manifest layout here is what that CAS would protect.
  */
object Snapshots {

  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")

  private def manifestPath(root: String, v: Int): Path =
    manifestDir(root).resolve(f"v$v%05d.manifest")

  /** Committed versions, ascending (empty for a fresh/absent table). */
  def versions(root: String): Seq[Int] = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator.asScala.map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq.sorted
    finally s.close()
  }

  /** Root-relative data files visible at `version` (`#`-prefixed
    * marker lines — e.g. the streaming `#txn:` fence — are metadata,
    * not files). */
  def files(root: String, version: Int): Seq[String] = {
    val p = manifestPath(root, version)
    require(Files.exists(p), s"no snapshot v$version under $root")
    Files.readAllLines(p).asScala.toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  private def commitManifest(root: String, v: Int, rel: Seq[String],
                             txn: Option[Long] = None): Int = {
    Files.createDirectories(manifestDir(root))
    val tmp = Files.createTempFile(manifestDir(root), s"v$v-", ".tmp")
    val marker = txn.map(id => s"#txn:$id\n").getOrElse("")
    Files.writeString(tmp, marker + rel.mkString("", "\n", "\n"))
    // move-into-place keeps a concurrent reader from seeing a half manifest
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  private def commitBatch(df: DataFrame, root: String, carryPrev: Boolean,
                          txn: Option[Long] = None): Int = {
    val prev = versions(root)
    val v = prev.lastOption.getOrElse(0) + 1
    val batchRel = f"data/b$v%05d"
    // r16: size output files to the data estimate (guide-§6 layout),
    // not to spark.sql.shuffle.partitions — AQE no longer coalesces
    // the shuffle feeding this write under the local profile
    graft.operators.Sizing.byEstimate(df).write.mode("errorifexists").parquet(s"$root/$batchRel")
    val s = Files.list(Paths.get(root, "data", f"b$v%05d"))
    val fresh =
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted.map(n => s"$batchRel/$n")
      finally s.close()
    val carried =
      if (carryPrev) prev.lastOption.map(files(root, _)).getOrElse(Seq.empty)
      else Seq.empty
    // carry prior equality-delete vectors forward like deleteWhere/upsert
    // do — without this an append AFTER a delete would silently resurrect
    // the deleted keys (files() filters '#'-prefixed lines, so the new
    // manifest would drop every '#delete:' marker while keeping all data
    // files). The fresh batch dir bVVVVV has v > every delete's dVVVVV,
    // so readMergeOnRead's sequence rule never masks the new rows.
    val carriedDeletes =
      if (carryPrev)
        prev.lastOption.map(deleteFiles(root, _)).getOrElse(Seq.empty)
          .map(r => s"#delete:$r")
      else Seq.empty
    commitManifest(root, v, carriedDeletes ++ carried ++ fresh, txn)
  }

  /** Append `df` as a new version; returns the committed version id. */
  def append(df: DataFrame, root: String): Int =
    commitBatch(df, root, carryPrev = true)

  /** Root-relative EQUALITY-DELETE files visible at `version`
    * (`#delete:`-marked manifest lines — see [[deleteWhere]]). */
  def deleteFiles(root: String, version: Int): Seq[String] = {
    val p = manifestPath(root, version)
    require(Files.exists(p), s"no snapshot v$version under $root")
    Files.readAllLines(p).asScala.toSeq
      .filter(_.startsWith("#delete:")).map(_.stripPrefix("#delete:"))
  }

  /** Iceberg-style EQUALITY-DELETE commit (merge-on-read): record the
    * keys to delete as their own parquet file and commit a version
    * whose manifest carries every prior data file UNCHANGED plus a
    * `#delete:` marker — a delete that rewrites NOTHING, the only
    * delete shape that stays O(deleted keys) on a 100 TB table
    * (contrast [[graft.operators.Maintenance]]'s surgical-erase
    * rewrite, which is O(affected files)). Readers apply deletes at
    * scan time via [[readMergeOnRead]]; a later compaction can fold
    * them in and drop the markers. `keys` must hold exactly one
    * column named `keyCol`. */
  def deleteWhere(keys: DataFrame, root: String, keyCol: String): Int = {
    require(keys.columns.toSeq == Seq(keyCol),
      s"keys must be a single '$keyCol' column, got ${keys.columns.toSeq}")
    val prev = versions(root)
    require(prev.nonEmpty, s"no snapshots under $root")
    val v = prev.last + 1
    val delRel = f"data/d$v%05d"
    graft.operators.Sizing.byEstimate(keys).write.mode("errorifexists").parquet(s"$root/$delRel")
    val s = Files.list(Paths.get(root, "data", f"d$v%05d"))
    val fresh =
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
        .map(n => s"#delete:$delRel/$n")
      finally s.close()
    val carriedDeletes = deleteFiles(root, prev.last).map(r => s"#delete:$r")
    Files.createDirectories(manifestDir(root))
    val tmp = Files.createTempFile(manifestDir(root), s"v$v-", ".tmp")
    Files.writeString(tmp, (carriedDeletes ++ fresh ++ files(root, prev.last))
      .mkString("", "\n", "\n"))
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Merge-on-read UPSERT: ONE atomic commit whose manifest carries the
    * prior data files untouched, a `#delete:` vector for the incoming
    * keys, and the incoming batch as a fresh data file — so
    * [[readMergeOnRead]] sees old rows masked and new rows present, in
    * one version (no window where the delete landed but the insert
    * didn't). The MoR twin of [[graft.operators.Maintenance]]'s
    * copy-on-write CDC merge: O(batch) always, no standing-data
    * rewrite, at the price of scan-time anti-joins until a compaction
    * folds the vectors in. */
  def upsert(df: DataFrame, root: String, keyCol: String): Int = {
    val prev = versions(root)
    require(prev.nonEmpty, s"no snapshots under $root")
    val v = prev.last + 1
    val delRel = f"data/d$v%05d"
    val batchRel = f"data/b$v%05d"
    graft.operators.Sizing.byEstimate(df.select(keyCol).distinct())
      .write.mode("errorifexists").parquet(s"$root/$delRel")
    graft.operators.Sizing.byEstimate(df).write.mode("errorifexists").parquet(s"$root/$batchRel")
    def ls(rel: String, prefix: String): Seq[String] = {
      val s = Files.list(Paths.get(root, rel))
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted.map(n => s"$prefix$rel/$n")
      finally s.close()
    }
    val delLines = ls(delRel, "#delete:")
    val dataLines = ls(batchRel, "")
    val carriedDeletes = deleteFiles(root, prev.last).map(r => s"#delete:$r")
    Files.createDirectories(manifestDir(root))
    val tmp = Files.createTempFile(manifestDir(root), s"v$v-", ".tmp")
    Files.writeString(tmp,
      (carriedDeletes ++ delLines ++ files(root, prev.last) ++ dataLines)
        .mkString("", "\n", "\n"))
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Merge-on-read scan with SEQUENCE semantics (the Iceberg rule): a
    * delete vector masks only data files committed BEFORE it — which
    * is exactly what lets [[upsert]] delete-and-reinsert a key in one
    * version without eating its own insert. Both sides' commit
    * versions ride in the batch directory names (data/bVVVVV vs
    * data/dVVVVV), parsed from `input_file_name` — no extra metadata
    * store; ONE broadcast anti-join (key equality + version bound)
    * against the small delete-key union; data files never touched. */
  def readMergeOnRead(spark: SparkSession, root: String, version: Int,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name, regexp_extract}
    val dels = deleteFiles(root, version)
    val data = spark.read.option("mergeSchema", "true")
      .parquet(files(root, version).map(rel => s"$root/$rel"): _*)
    if (dels.isEmpty) data
    else {
      val withV = data.withColumn("__bv",
        regexp_extract(input_file_name(), "b(\\d{5})/[^/]*$", 1).cast("int"))
      val keys = dels.map { rel =>
        val dv = rel.split("/")(1).stripPrefix("d").toInt
        spark.read.parquet(s"$root/$rel")
          .select(col(keyCol).as("__dk"))
          .withColumn("__dv", org.apache.spark.sql.functions.lit(dv))
      }.reduce(_ unionAll _).distinct()
      withV.join(broadcast(keys),
          withV(keyCol) === keys("__dk") && withV("__bv") < keys("__dv"),
          "left_anti")
        .drop("__bv")
    }
  }

  /** The table exactly as of `version` — scans only that manifest's
    * files. `mergeSchema` makes appends with ADDED columns read as the
    * union schema (older files yield NULL for the new columns) — schema
    * evolution without rewriting standing data. Versions carrying
    * equality deletes REFUSE this plain scan (it would silently
    * resurrect deleted rows): use [[readMergeOnRead]]. */
  def readAs(spark: SparkSession, root: String, version: Int): DataFrame = {
    require(deleteFiles(root, version).isEmpty,
      s"v$version carries equality deletes — use readMergeOnRead")
    spark.read.option("mergeSchema", "true")
      .parquet(files(root, version).map(rel => s"$root/$rel"): _*)
  }

  /** Latest committed version. */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(root)
    require(vs.nonEmpty, s"no snapshots under $root")
    readAs(spark, root, vs.last)
  }

  /** INSERT-OVERWRITE commit: the new version's manifest lists ONLY
    * this batch's files — the whole-table replace twin of [[append]].
    * Old versions still read their old files (immutability is what
    * makes the overwrite safe to time-travel across). */
  def replace(df: DataFrame, root: String): Int =
    commitBatch(df, root, carryPrev = false)

  /** Keyed diff between two versions — "what changed between Monday's
    * snapshot and now": per key, `added` (only in `vb`), `removed`
    * (only in `va`), `changed` (in both, any payload column differs —
    * null-safe compare, no string round-trip). Keys must be unique per
    * version (it is a DIMENSION diff).
    *
    * Scale shape: two anti-joins + one inner join, all on the key —
    * three co-partitioned shuffles of exactly the two versions
    * compared (co-bucketed table roots make them exchange-free); no
    * full-row hashing, no collect. */
  def diff(spark: SparkSession, root: String, va: Int, vb: Int,
           key: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = (key +: payload).map(col)
    val a = readAs(spark, root, va).select(cols: _*)
    val b = readAs(spark, root, vb).select(cols: _*)
    val added = b.join(a, Seq(key), "left_anti")
      .select(lit("added").as("change"), col(key).as("key"))
    val removed = a.join(b, Seq(key), "left_anti")
      .select(lit("removed").as("change"), col(key).as("key"))
    val changed = a.as("a").join(b.as("b"), col(s"a.$key") === col(s"b.$key"))
      .filter(payload.map(p => !(col(s"a.$p") <=> col(s"b.$p"))).reduce(_ || _))
      .select(lit("changed").as("change"), col(s"a.$key").as("key"))
    added.unionByName(removed).unionByName(changed).orderBy("change", "key")
  }

  /** Metadata-only rollback: commit a NEW version whose file list is
    * `toVersion`'s — history stays intact (time travel past the
    * rollback still works), no data files move. */
  def rollback(root: String, toVersion: Int): Int = {
    val v = versions(root).lastOption.getOrElse(0) + 1
    commitManifest(root, v, files(root, toVersion))
  }

  /** Garbage-collect history: keep the newest `keepLast` manifests,
    * delete every data file no kept manifest references, drop the old
    * manifests. Returns (dataFilesDeleted, manifestsDropped). Reads of
    * kept versions are untouched; time travel before the horizon is
    * deliberately gone — this is the storage-reclaim half of the
    * snapshot contract (Iceberg `expire_snapshots`). O(files) metadata
    * work + unlink syscalls; no data is read or rewritten. */
  def vacuum(root: String, keepLast: Int = 1): (Int, Int) = {
    val vs = versions(root)
    require(keepLast >= 1, "keepLast must be >= 1")
    require(vs.nonEmpty, s"no snapshots under $root")
    val kept = vs.takeRight(keepLast)
    // keep everything any BRANCH still references too — a branch head
    // may share batches with expired main versions (createBranch is
    // metadata-only), and WAP staging data must survive a main vacuum
    val referenced = kept.flatMap(files(root, _)).toSet ++
      kept.flatMap(deleteFiles(root, _)).toSet ++ branchReferenced(root)
    val dataDir = Paths.get(root, "data")
    val victims =
      if (!Files.isDirectory(dataDir)) Seq.empty[Path]
      else {
        val s = Files.walk(dataDir)
        // materialize BEFORE deleting — unlinking under a live walk
        // stream is filesystem-dependent behavior
        try s.iterator.asScala.filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet") &&
            !referenced.contains(Paths.get(root).relativize(p).toString)).toList
        finally s.close()
      }
    victims.foreach(Files.delete)
    val dropped = vs.dropRight(keepLast)
    dropped.foreach(v => Files.delete(manifestPath(root, v)))
    (victims.size, dropped.size)
  }

  // --- branches (write-audit-publish) -------------------------------------
  // A branch is its own manifest chain under _manifests/branch-<name>/,
  // with data batches namespaced data/<name>_b%05d — the main chain is
  // never touched by branch commits, which is the whole point: stage
  // writes on a branch, audit them, then PUBLISH by fast-forwarding
  // main to the branch head (a metadata-only commit, Iceberg's WAP
  // recipe). Branch creation is metadata-only too (the first branch
  // manifest lists the fork version's files).

  private def branchDir(root: String, name: String): Path =
    Paths.get(root, "_manifests", s"branch-$name")

  private def branchManifestPath(root: String, name: String, v: Int): Path =
    branchDir(root, name).resolve(f"v$v%05d.manifest")

  /** Committed branch versions, ascending (empty if the branch doesn't
    * exist). */
  def branchVersions(root: String, name: String): Seq[Int] = {
    val d = branchDir(root, name)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator.asScala.map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq.sorted
    finally s.close()
  }

  private def branchFiles(root: String, name: String, v: Int): Seq[String] = {
    val p = branchManifestPath(root, name, v)
    require(Files.exists(p), s"no branch '$name' v$v under $root")
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
  }

  private def commitBranchManifest(root: String, name: String, v: Int,
                                   rel: Seq[String]): Int = {
    Files.createDirectories(branchDir(root, name))
    val tmp = Files.createTempFile(branchDir(root, name), s"v$v-", ".tmp")
    Files.writeString(tmp, rel.mkString("", "\n", "\n"))
    Files.move(tmp, branchManifestPath(root, name, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Fork a branch at main's `fromVersion` — metadata-only (the branch
    * head starts as that version's exact file list). */
  def createBranch(root: String, name: String, fromVersion: Int): Int = {
    require(branchVersions(root, name).isEmpty, s"branch '$name' already exists")
    require(!name.contains("/") && name.nonEmpty, s"bad branch name '$name'")
    commitBranchManifest(root, name, 1, files(root, fromVersion))
  }

  /** Append `df` to the branch head — main's chain is untouched. */
  def appendToBranch(df: DataFrame, root: String, name: String): Int = {
    val prev = branchVersions(root, name)
    require(prev.nonEmpty, s"no branch '$name' under $root")
    val v = prev.last + 1
    val batchRel = f"data/${name}_b$v%05d"
    graft.operators.Sizing.byEstimate(df).write.mode("errorifexists").parquet(s"$root/$batchRel")
    val s = Files.list(Paths.get(root, "data", f"${name}_b$v%05d"))
    val fresh =
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted.map(n => s"$batchRel/$n")
      finally s.close()
    commitBranchManifest(root, name, v, branchFiles(root, name, prev.last) ++ fresh)
  }

  /** Read the branch head. */
  def readBranch(spark: SparkSession, root: String, name: String): DataFrame = {
    val vs = branchVersions(root, name)
    require(vs.nonEmpty, s"no branch '$name' under $root")
    spark.read.option("mergeSchema", "true")
      .parquet(branchFiles(root, name, vs.last).map(rel => s"$root/$rel"): _*)
  }

  /** PUBLISH: fast-forward main to the branch head — a metadata-only
    * main-chain commit listing the branch head's files. Main history
    * stays intact (time travel across the publish works); the branch
    * can keep evolving or be forgotten. */
  def publishBranch(root: String, name: String): Int = {
    val vs = branchVersions(root, name)
    require(vs.nonEmpty, s"no branch '$name' under $root")
    val v = versions(root).lastOption.getOrElse(0) + 1
    commitManifest(root, v, branchFiles(root, name, vs.last))
  }

  /** All committed branch names (directories `_manifests/branch-*`). */
  def listBranches(root: String): Seq[String] = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator.asScala.map(_.getFileName.toString)
      .collect { case n if n.startsWith("branch-") => n.stripPrefix("branch-") }
      .toSeq.sorted
    finally s.close()
  }

  /** Every file any branch version references. */
  private def branchReferenced(root: String): Set[String] =
    listBranches(root).flatMap(b =>
      branchVersions(root, b).flatMap(v => branchFiles(root, b, v))).toSet

  /** ORPHAN-file GC — delete data files referenced by NO manifest (main
    * or branch): the leftovers of failed/aborted writes, Iceberg's
    * `remove_orphan_files`, distinct from [[vacuum]] (which expires OLD
    * VERSIONS — an orphan was never committed at all, so no version
    * expiry can ever reclaim it). Returns the deleted root-relative
    * paths. Metadata + directory listing only; committed data is
    * untouched by construction, so every readable version reads
    * identically afterwards. */
  def orphanGc(root: String): Seq[String] = {
    val referenced = versions(root).flatMap(files(root, _)).toSet ++
      versions(root).flatMap(deleteFiles(root, _)).toSet ++
      branchReferenced(root)
    val dataDir = Paths.get(root, "data")
    if (!Files.isDirectory(dataDir)) return Seq.empty
    val s = Files.walk(dataDir)
    val orphans =
      // materialize BEFORE deleting (the vacuum rule)
      try s.iterator.asScala.filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") &&
          !referenced.contains(Paths.get(root).relativize(p).toString)).toList
      finally s.close()
    orphans.foreach(Files.delete)
    // reap now-empty stray dirs (and their _SUCCESS markers) so the
    // data/ tree doesn't accumulate husks of crashed writers; never the
    // data root itself, and only when nothing but loose marker FILES
    // remain (a dir still holding referenced parquet, or any subdir,
    // is left alone)
    val dirs = orphans.map(_.getParent).distinct.filterNot(_ == dataDir)
    dirs.foreach { d =>
      val s2 = Files.list(d)
      val leftovers = try s2.iterator.asScala.toList finally s2.close()
      if (leftovers.forall(p => Files.isRegularFile(p) &&
          !p.getFileName.toString.endsWith(".parquet"))) {
        leftovers.foreach(Files.delete)
        Files.delete(d)
      }
    }
    orphans.map(p => Paths.get(root).relativize(p).toString).sorted
  }

  /** Delta-style CHECK constraint on commit: the append lands only if
    * EVERY row satisfies `constraintSql`; otherwise nothing commits
    * and the violation count returns (Left) — malformed loads are
    * rejected at the table boundary instead of discovered downstream.
    * One aggregate over the batch (not the table); the check rides the
    * same job that would have written. */
  def appendChecked(df: DataFrame, root: String,
                    constraintSql: String): Either[Long, Int] = {
    val bad = df.filter(s"NOT ($constraintSql)").count()
    if (bad > 0) Left(bad) else Right(append(df, root))
  }

  // --- streaming sink (exactly-once foreachBatch) --------------------------

  /** Epoch ids already committed by [[commitStreamBatch]]: the `#txn:`
    * markers carried INSIDE manifests (metadata-only scan). */
  def committedStreamBatches(root: String): Set[Long] =
    versions(root).flatMap { v =>
      Files.readAllLines(manifestPath(root, v)).asScala
        .filter(_.startsWith("#txn:"))
        .map(_.stripPrefix("#txn:").trim.toLong)
    }.toSet

  /** Exactly-once micro-batch commit — the idempotence contract
    * foreachBatch requires (a restarted query REDELIVERS the same
    * epoch; without a fence the table double-appends). The epoch id
    * rides inside the manifest as a `#txn:` marker, so data list and
    * fence commit in ONE atomic manifest move — there is no crash
    * window where the batch is written but unfenced (the Delta
    * txn-appId recipe, not append-then-log). Returns true if the batch
    * appended, false if fenced as a duplicate. */
  def commitStreamBatch(df: DataFrame, root: String, batchId: Long): Boolean = {
    if (committedStreamBatches(root).contains(batchId)) return false
    commitBatch(df, root, carryPrev = true, txn = Some(batchId))
    true
  }

  /** METADATA-ONLY row count of a snapshot version: sum of parquet
    * FOOTER counts over the manifest's files — `SELECT count(*)`
    * answered without scanning a single data page, the optimization
    * every table format makes possible (Iceberg/Delta answer counts
    * from manifest stats; here the footers are the stats store). At
    * 100 TB this is the difference between a catalog lookup and a
    * full-table job; no SparkSession is even involved. */
  def metaCount(root: String, version: Int): Long =
    files(root, version)
      .map(rel => graft.registries.ParquetMeta.rowCount(s"$root/$rel"))
      .sum
}
