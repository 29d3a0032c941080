package graft.registries

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans.Pipeline

/** Parquet-backed value catalog — kiara's data store
  * (registries/data/data_store/): store a DataFrame under a value id,
  * load it back, enumerate. Values live as parquet (columnar, splittable)
  * so a stored value is immediately a first-class distributed table again.
  */
class DataRegistry(root: String) {
  // same id validation on every path that touches the filesystem — a raw
  // alias target like "../x" must not escape the registry root
  private def dir(id: String) = {
    require(id.matches("[A-Za-z0-9_.-]+") && id != "." && id != "..", s"bad value id: $id")
    s"$root/values/$id"
  }
  Files.createDirectories(Paths.get(s"$root/values"))

  def store(id: String, df: DataFrame): String = {
    df.write.mode("overwrite").parquet(dir(id))
    id
  }
  def load(spark: SparkSession, id: String): DataFrame = spark.read.parquet(dir(id))
  def exists(id: String): Boolean = Files.exists(Paths.get(dir(id)))
  def list: Seq[String] = {
    val s = Files.list(Paths.get(s"$root/values"))
    try s.iterator.asScala.map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }
}

/** Alias registry (kiara registries/aliases/): human names → value ids,
  * persisted as a flat properties file. */
class AliasRegistry(root: String) {
  private val file = Paths.get(s"$root/aliases.properties")
  Files.createDirectories(Paths.get(root))

  private def readAll(): Map[String, String] =
    if (!Files.exists(file)) Map.empty
    else Files.readAllLines(file).asScala.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap

  /** Validated + atomic: alias names share the value-id charset (an '='
    * or newline would corrupt the flat file), and the rewrite goes
    * through a temp file + atomic move so concurrent readers never see a
    * torn file. Same-JVM writers serialize on the instance lock. */
  def set(alias: String, valueId: String): Unit = synchronized {
    require(alias.matches("[A-Za-z0-9_.-]+"), s"bad alias name: $alias")
    require(valueId.matches("[A-Za-z0-9_.-]+"), s"bad value id: $valueId")
    val all = readAll() + (alias -> valueId)
    val tmp = Files.createTempFile(Paths.get(root), ".aliases", ".tmp")
    Files.write(tmp, all.toSeq.sorted.map { case (k, v) => s"$k=$v" }.asJava)
    Files.move(tmp, file, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
  def resolve(alias: String): Option[String] = readAll().get(alias)
  def list: Seq[(String, String)] = readAll().toSeq.sorted
}

/** Job/lineage registry (kiara registries/jobs/, models/module/jobs.py):
  * append-only JSONL of executed steps with inputs and output schemas. */
class LineageRegistry(root: String) {
  private val file = Paths.get(s"$root/lineage.jsonl")
  Files.createDirectories(Paths.get(root))

  // full JSON escape incl. control chars — an unrestricted step name with
  // a tab/newline must not corrupt the JSONL log (same hardening as
  // Verify's oracle_sql.json writer)
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def record(runId: String, rec: Pipeline.StepRecord): Unit = {
    val line = s"""{"run":"${esc(runId)}","step":"${esc(rec.step)}","inputs":[${
      rec.inputs.map(i => "\"" + esc(i) + "\"").mkString(",")}],"schema":"${esc(rec.outputSchema)}"}"""
    Files.write(file, (line + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
  def recordRun(runId: String, recs: Seq[Pipeline.StepRecord]): Unit = recs.foreach(record(runId, _))
  def lines: Seq[String] =
    if (!Files.exists(file)) Seq.empty else Files.readAllLines(file).asScala.toSeq
}

/** Workflow registry (kiara registries/workflows/): named pipelines that
  * can be re-run against fresh inputs, with lineage recorded per run. */
class WorkflowRegistry(lineage: LineageRegistry) {
  private val flows = scala.collection.concurrent.TrieMap[String, Seq[Pipeline.Step]]()

  def register(name: String, steps: Seq[Pipeline.Step]): Unit = flows.put(name, steps)
  def list: Seq[String] = flows.keys.toSeq.sorted
  def run(name: String, runId: String, inputs: Map[String, DataFrame]): Pipeline.Result = {
    val steps = flows.getOrElse(name, throw new NoSuchElementException(s"workflow not registered: $name"))
    val res = Pipeline.run(steps, inputs)
    lineage.recordRun(runId, res.lineage)
    res
  }
}
