package graft.registries

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plans.{OpRegistry, Pipeline}

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
  /** Append an already-serialized record line (archive import path). */
  def appendRaw(line: String): Unit =
    Files.write(file, (line + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
}

/** Workflow registry (kiara registries/workflows/sqlite_store.py: named
  * pipelines that survive a restart): workflows registered as DAGs of
  * NAMED OpRegistry operations persist to `workflows.properties` under
  * the registry root and can be re-run by a fresh JVM — the operation
  * CODE is re-resolved by name at run time (kiara's contract too: the
  * module providing an operation must be importable when a stored
  * workflow runs). Arbitrary-closure workflows (`register`) stay
  * in-memory only, since a Scala closure has no portable serialization.
  */
object WorkflowRegistry {
  /** One persistable step: apply registered op `op` to the named value
    * `input`, producing value `name`. */
  final case class OpStep(name: String, op: String, input: String)
}

class WorkflowRegistry(root: String, lineage: LineageRegistry) {
  import WorkflowRegistry.OpStep

  private val flows = scala.collection.concurrent.TrieMap[String, Seq[Pipeline.Step]]()
  private val file = Paths.get(s"$root/workflows.properties")
  Files.createDirectories(Paths.get(root))

  /** In-memory registration for arbitrary-closure steps (not persisted). */
  def register(name: String, steps: Seq[Pipeline.Step]): Unit = flows.put(name, steps)

  // flat `wf=step:op:input,step:op:input` lines — names share the
  // registry charset, which excludes the separators, so the encoding is
  // unambiguous; rewrite is temp-file + atomic move like AliasRegistry
  private def readAll(): Map[String, Seq[OpStep]] =
    if (!Files.exists(file)) Map.empty
    else Files.readAllLines(file).asScala.filter(_.contains("=")).map { l =>
      val i = l.indexOf('=')
      val steps = l.substring(i + 1).split(',').toSeq.filter(_.nonEmpty).map { s =>
        val p = s.split(':')
        OpStep(p(0), p(1), p(2))
      }
      l.substring(0, i) -> steps
    }.toMap

  /** Register a persistable workflow: each part is validated against the
    * registry charset, then the whole table is atomically rewritten. */
  def registerOps(name: String, steps: Seq[OpStep]): Unit = synchronized {
    def ok(s: String): Boolean = s.matches("[A-Za-z0-9_.-]+")
    require(ok(name), s"bad workflow name: $name")
    steps.foreach { st =>
      require(ok(st.name) && ok(st.op) && ok(st.input), s"bad step part in: $st")
    }
    val all = readAll() + (name -> steps)
    val tmp = Files.createTempFile(Paths.get(root), ".workflows", ".tmp")
    Files.write(tmp, all.toSeq.sortBy(_._1).map { case (n, ss) =>
      s"$n=${ss.map(s => s"${s.name}:${s.op}:${s.input}").mkString(",")}"
    }.asJava)
    Files.move(tmp, file, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def list: Seq[String] = (flows.keys.toSeq ++ readAll().keys).distinct.sorted

  def run(name: String, runId: String, inputs: Map[String, DataFrame]): Pipeline.Result = {
    val steps = flows.get(name)
      .orElse(readAll().get(name).map(_.map(st =>
        Pipeline.Step(st.name, Seq(st.input), in => OpRegistry.get(st.op)(in(st.input))))))
      .getOrElse(throw new NoSuchElementException(s"workflow not registered: $name"))
    val res = Pipeline.run(steps, inputs)
    lineage.recordRun(runId, res.lineage)
    res
  }
}
