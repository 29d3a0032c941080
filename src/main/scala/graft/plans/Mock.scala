package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Mock module — kiara's MockKiaraModule twin (reference
  * modules/included_core_modules/mock.py:75): an operation with
  * CONFIGURED literal outputs so a pipeline DAG can be authored,
  * cycle/topo-checked, rendered and even RUN before the real operators
  * exist. A mock step ignores its input frame entirely and returns the
  * configured rows under the configured schema — deterministic and
  * idempotent like the reference's ModuleCharacteristics
  * (is_idempotent=True, unique_result_values=True).
  *
  * Schema fields use graft's kiara-type vocabulary ([[graft.sources.TypeMap]]:
  * string/integer/float/boolean/...); row cells are given as strings and
  * cast to the declared type, the same path `import_data` takes for csv
  * cells. Scale note: mock frames are authored literals (a handful of
  * rows on the driver) — prototyping scaffolding, never a data path. */
object Mock {

  /** Build the configured literal frame: `schema` is (field, kiaraType),
    * `rows` are the mock cells as strings (null allowed). */
  def frame(spark: SparkSession, schema: Seq[(String, String)],
            rows: Seq[Seq[String]]): DataFrame = {
    require(schema.nonEmpty, "mock: outputs schema must declare >= 1 field")
    schema.foreach { case (f, t) =>
      require(graft.sources.TypeMap.toSpark.contains(t),
        s"mock: unknown type '$t' for field '$f' " +
          s"(available: ${graft.sources.TypeMap.toSpark.keys.toSeq.sorted.mkString(", ")})")
    }
    rows.foreach(r => require(r.size == schema.size,
      s"mock: row arity ${r.size} != schema arity ${schema.size}"))
    import scala.jdk.CollectionConverters._
    val strSchema = org.apache.spark.sql.types.StructType(schema.map { case (f, _) =>
      org.apache.spark.sql.types.StructField(f, org.apache.spark.sql.types.StringType)
    })
    val df = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r: _*)).asJava, strSchema)
    df.select(schema.map { case (f, t) =>
      col(f).cast(graft.sources.TypeMap.toSpark(t)).as(f)
    }: _*)
  }

  /** The mock OPERATION: input-agnostic, returns the configured frame
    * (mock.py:120 process() just sets the configured output values). */
  def operation(spark: SparkSession, schema: Seq[(String, String)],
                rows: Seq[Seq[String]]): DataFrame => DataFrame = {
    val out = frame(spark, schema, rows)
    // materialize NOW: schema/arity were checked in frame(), but the
    // per-cell ANSI casts are lazy — without this collect a malformed
    // literal ('abc' as integer) would throw on the first action of the
    // CONSUMING pipeline step, not at Mock.register. Mock frames are
    // driver-authored literals, so the collect is bounded by design.
    import scala.jdk.CollectionConverters._
    val cells = out.collect().toSeq
    val local = spark.createDataFrame(cells.asJava, out.schema)
    _ => local
  }

  /** Register a configured mock operation under `name` so pipelines and
    * `run`/`runJob` resolve it like any real operation. */
  def register(spark: SparkSession, name: String,
               schema: Seq[(String, String)], rows: Seq[Seq[String]],
               doc: String = ""): Unit =
    OpRegistry.register(name, operation(spark, schema, rows),
      doc = if (doc.nonEmpty) doc
        else s"mock operation: ${rows.size} literal row(s) of " +
          schema.map { case (f, t) => s"$f:$t" }.mkString("(", ", ", ")"),
      module = "mock")
}
