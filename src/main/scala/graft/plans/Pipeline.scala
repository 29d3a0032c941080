package graft.plans

import org.apache.spark.sql.DataFrame

/** Pipeline DAG execution — the Spark-native analogue of kiara's defining
  * feature (operations/included_core_operations/pipeline.py:65,
  * modules/included_core_modules/pipeline.py:29, models/module/pipeline/).
  *
  * Steps are named DataFrame transforms with named inputs; execution is a
  * topological walk. Because every step RETURNS a lazy DataFrame, the
  * "executed" pipeline is one fused Catalyst plan — Spark optimizes across
  * step boundaries (pushdown through the whole DAG), which is precisely
  * why this re-expression beats step-at-a-time materialization at scale.
  */
object Pipeline {

  /** One step: consumes named values (pipeline inputs or prior step
    * outputs), produces one named value. */
  final case class Step(name: String, inputs: Seq[String], fn: Map[String, DataFrame] => DataFrame)

  final case class StepRecord(step: String, inputs: Seq[String], outputSchema: String)

  final case class Result(values: Map[String, DataFrame], lineage: Seq[StepRecord]) {
    def apply(name: String): DataFrame = values(name)
  }

  /** Topologically execute; fails fast on unknown inputs or cycles. */
  def run(steps: Seq[Step], inputs: Map[String, DataFrame]): Result = {
    val byName = steps.map(s => s.name -> s).toMap
    require(byName.size == steps.size, "duplicate step names")
    require(!steps.exists(s => inputs.contains(s.name)),
      s"step names shadow pipeline inputs: ${steps.map(_.name).filter(inputs.contains).mkString(", ")}")
    var values = inputs
    var lineage = Vector.empty[StepRecord]
    var remaining = steps
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.inputs.forall(values.contains))
      if (ready.isEmpty) {
        val missing = blocked.flatMap(s => s.inputs.filterNot(values.contains)).distinct
        throw new IllegalArgumentException(
          s"pipeline cannot progress; unresolved inputs: ${missing.mkString(", ")} " +
            s"(cycle or unknown name among steps ${blocked.map(_.name).mkString(", ")})")
      }
      ready.foreach { s =>
        val out = s.fn(s.inputs.map(i => i -> values(i)).toMap)
        values += (s.name -> out)
        lineage :+= StepRecord(s.name, s.inputs, out.schema.simpleString)
      }
      remaining = blocked
    }
    Result(values, lineage)
  }
}

/** custom_module operator registration
  * (operations/included_core_operations/__init__.py:63): user code registers
  * named DataFrame transforms; pipelines and callers resolve them by name. */
object OpRegistry {
  type Op = DataFrame => DataFrame
  private val ops = scala.collection.concurrent.TrieMap[String, Op]()

  def register(name: String, op: Op): Unit = ops.put(name, op)
  def get(name: String): Op =
    ops.getOrElse(name, throw new NoSuchElementException(s"operator not registered: $name"))
  def list: Seq[String] = ops.keys.toSeq.sorted
  def contains(name: String): Boolean = ops.contains(name)
}
