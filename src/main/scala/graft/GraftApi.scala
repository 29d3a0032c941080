package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.plans.{Builtins, OpRegistry, Pipeline}
import graft.registries.{AliasRegistry, DataRegistry, LineageRegistry, WorkflowRegistry}
import graft.sources.{Convert, Export, TypeMap}

/** Top-level facade mirroring kiara's python API
  * (reference interfaces/python_api/kiara_api.py): run_job (:105),
  * list_operation_ids (:679), list_data_type_names (:578),
  * store_value (:1018), get_value (:893), list_alias_names (:965),
  * import_values (:1130), export_values (:1174), get_job_record (:1410).
  *
  * A context roots all registries under one directory, exactly like a
  * kiara context; values are DataFrames, operations are registered
  * DataFrame transforms, jobs leave lineage records.
  */
class GraftApi(val spark: SparkSession, root: String) {
  val data = new DataRegistry(root)
  val aliases = new AliasRegistry(root)
  val lineage = new LineageRegistry(root)
  val workflows = new WorkflowRegistry(root, lineage)
  private val jobSeq = new AtomicLong(0)
  private val jobs = scala.collection.concurrent.TrieMap[String, Pipeline.StepRecord]()

  Builtins.ensureRegistered()

  // --- operations (kiara_api.py:679,709,770) ------------------------------
  def listOperationIds: Seq[String] = OpRegistry.list
  /** Filtered ids (kiara_api.py:679 list_operation_ids(filter=...)). */
  def listOperationIds(filters: String*): Seq[String] = OpRegistry.find(filters: _*)
  /** retrieve_operation_info (kiara_api.py:770): doc + type hints. */
  def operationInfo(name: String): OpRegistry.OpInfo = OpRegistry.info(name)
  def registerOperation(name: String, op: DataFrame => DataFrame,
                        doc: String = ""): Unit =
    OpRegistry.register(name, op, doc)

  /** run_job (kiara_api.py:105): execute a registered operation on a
    * value (by alias or value id), record the job, return the result. */
  def runJob(operation: String, inputValue: String): (String, DataFrame) = {
    val op = OpRegistry.get(operation)
    val in = getValue(inputValue)
    val out = op(in)
    val jobId = s"job-${jobSeq.incrementAndGet()}"
    val rec = Pipeline.StepRecord(operation, Seq(inputValue), out.schema.simpleString)
    jobs.put(jobId, rec)
    lineage.record(jobId, rec)
    (jobId, out)
  }

  def getJobRecord(jobId: String): Option[Pipeline.StepRecord] = jobs.get(jobId)
  def listJobRecordIds: Seq[String] = jobs.keys.toSeq.sorted

  /** Upstream provenance of a value (kiara_api.py:243
    * retrieve_augmented_value_lineage): the step that produced it, the
    * steps that produced its inputs, recursively to the raw leaves. */
  def valueLineage(value: String): Seq[LineageRegistry.StepNode] = lineage.upstream(value)

  // --- data types (kiara_api.py:578) -------------------------------------
  def listDataTypeNames: Seq[String] = TypeMap.toSpark.keys.toSeq.sorted

  // --- values + aliases (kiara_api.py:893,1018,965,831) -------------------
  def storeValue(id: String, df: DataFrame, alias: Option[String] = None): String = {
    data.store(id, df)
    alias.foreach(a => aliases.set(a, id))
    id
  }
  def getValue(ref: String): DataFrame =
    data.load(spark, aliases.resolve(ref).getOrElse(ref))
  def listValueIds: Seq[String] = data.list
  def listAliasNames: Seq[String] = aliases.list.map(_._1)

  // --- value matchers (kiara_api.py:844 list_value_ids(**matchers), :875) --
  /** Matcher-filtered value ids: id glob + schema check, parquet footers
    * only — never a data scan. */
  def findValues(idGlob: String = "*", hasColumn: Option[String] = None): Seq[String] =
    data.find(spark, graft.registries.DataRegistry.Matcher(Some(idGlob), hasColumn))
  /** Matcher-filtered aliases: glob over alias name and/or target id. */
  def findAliases(aliasGlob: String = "*", valueGlob: String = "*"): Seq[(String, String)] =
    aliases.find(aliasGlob, valueGlob)

  // --- import / export (kiara_api.py:1130,1174) ---------------------------
  def importValue(id: String, format: String, path: String,
                  schema: StructType = new StructType()): DataFrame = {
    val df = Convert.convert(format, "table")(spark, path, schema)
    data.store(id, df)
    df
  }
  def exportValue(ref: String, format: String, path: String): Unit = {
    val df = getValue(ref)
    format match {
      case "csv"     => Export.csv(df, path)
      case "json"    => Export.json(df, path)
      case "parquet" => Export.parquet(df, path)
      case other     => throw new IllegalArgumentException(s"unknown export format: $other")
    }
  }

  // --- archives (kiara_api.py:1257 export_archive, :1306 import_archive) --
  /** Bundle values (all by default) + aliases + lineage into a portable
    * archive directory — kiara's primary context-to-context sharing path. */
  def exportArchive(targetDir: String, values: Seq[String] = Seq.empty,
                    noAliases: Boolean = false): Seq[String] =
    graft.registries.Archive.exportArchive(spark, data, aliases, lineage,
      targetDir, values, noAliases)

  /** Import an archive's values (+ aliases, + lineage) into this context. */
  def importArchive(sourceDir: String, noAliases: Boolean = false): Seq[String] =
    graft.registries.Archive.importArchive(spark, data, aliases, lineage,
      sourceDir, noAliases)
}
