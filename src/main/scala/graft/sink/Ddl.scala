package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.model.{DBool, DDbl, DInt, DNull, DStr, DVal, TaskSpec}

/** Sink-side DDL (L3, reference src/indices.ts:19-57): the reference
  * creates the ES index (with an optional blue/green `indexNameSuffix`)
  * and pins the output schema with a `dynamic:false` mapping before any
  * data flows. Spark equivalent: derive the closed output StructType
  * from the task spec and `CREATE TABLE IF NOT EXISTS` in the catalog —
  * the fixed-schema contract ("dynamic in, fixed out", SURVEY.md §1.2).
  */
object Ddl {

  /** ES-mapping-style field type names -> Spark types (the subset the
    * reference's example mappings use: text/keyword/long/double/boolean/
    * date, examples/config.json:62-79). */
  def esTypeToSpark(t: String): DataType = t match {
    case "text" | "keyword" => StringType
    case "long" | "integer" => LongType
    case "double" | "float" => DoubleType
    case "boolean"          => BooleanType
    case "date"             => TimestampType
    case other              => throw new IllegalArgumentException(s"unsupported sink type: $other")
  }

  /** Infer the output StructType from the task's static seed values and
    * declared field types; mapping destinations without a declared type
    * default to StringType (stringified passthrough). */
  def outputSchema(task: TaskSpec, fieldTypes: Map[String, String] = Map.empty): StructType = {
    def typeOfStatic(v: DVal): DataType = v match {
      case _: DStr  => StringType
      case _: DInt  => LongType
      case _: DDbl  => DoubleType
      case _: DBool => BooleanType
      case DNull    => StringType
      case _        => StringType
    }
    val staticFields = task.static.fields.map { case (k, v) =>
      StructField(k, fieldTypes.get(k).map(esTypeToSpark).getOrElse(typeOfStatic(v)))
    }
    val mappedFields = task.mapping.map { case (_, dst) =>
      StructField(dst, fieldTypes.get(dst).map(esTypeToSpark).getOrElse(StringType))
    }.filterNot(f => task.static.contains(f.name))
    StructType(StructField("_id", StringType, nullable = false) +: (staticFields ++ mappedFields))
  }

  /** CREATE TABLE IF NOT EXISTS with the fixed output schema; `suffix`
    * is the blue/green versioning analog of `indexNameSuffix`
    * (reference src/config.ts:121-132). Returns the full table name. */
  def createSinkTable(
      spark: SparkSession,
      name: String,
      task: TaskSpec,
      fieldTypes: Map[String, String] = Map.empty,
      suffix: String = "",
      location: Option[String] = None,
  ): String = {
    val table = if (suffix.isEmpty) name else s"${name}_$suffix"
    val schema = outputSchema(task, fieldTypes)
    val ddlCols = schema.fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$table` ($ddlCols) USING PARQUET$loc")
    table
  }

  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Field types out of an ES put-mapping body (reference
    * examples/config.json:62-79): either `{properties: {f: {type}}}` or
    * the 6.x-era `{<type>: {properties: ...}}` nesting. */
  def fieldTypesFromMapping(body: DVal): Map[String, String] = {
    def props(o: graft.model.DObj): Map[String, String] =
      o.get("properties") match {
        case Some(p: graft.model.DObj) =>
          p.fields.collect {
            case (f, fo: graft.model.DObj) =>
              fo.get("type").collect { case DStr(t) => f -> t }
          }.flatten.toMap
        case _ => Map.empty
      }
    body match {
      case o: graft.model.DObj if o.contains("properties") => props(o)
      case o: graft.model.DObj =>
        o.fields.collectFirst { case (_, n: graft.model.DObj) if n.contains("properties") => props(n) }
          .getOrElse(Map.empty)
      case _ => Map.empty
    }
  }

  /** The reference's `Indices.init` (src/index.ts:11, src/indices.ts):
    * create every task's sink table with its mapping-declared field
    * types and the blue/green suffix, before any data flows.
    *
    * IF NOT EXISTS semantics, like the reference's index check: an
    * existing table (including its registered LOCATION) is left
    * untouched. Redeploying to a different baseDir therefore requires a
    * new `indexNameSuffix` — which is exactly what the suffix is for
    * (blue/green: new suffix → new table, old one stays queryable). */
  def initFromConfig(
      spark: SparkSession,
      config: graft.model.EngineConfig,
      locationBase: Option[String] = None,
  ): Seq[String] =
    config.tasks.map { td =>
      val fieldTypes = td.load.mappingBody.map(fieldTypesFromMapping).getOrElse(Map.empty)
      createSinkTable(spark, td.load.index, td.transform, fieldTypes,
        suffix = config.controls.indexNameSuffix.stripPrefix("_"),
        location = locationBase.map(b => s"$b/${td.load.index}${config.controls.indexNameSuffix}"))
    }

  /** Materialize the engine-owned state into the typed sink table —
    * what makes `spark.table("users")` answer the queries a mongo-es
    * user asks ES today. State docs are already sink-shaped JSON, so
    * publishing is one `from_json` against the DDL schema (fields the
    * mapping never produced stay NULL, exactly like a sparse ES doc)
    * and an overwrite into the table's location. Returns rows
    * published.
    *
    * Publication is an on-demand snapshot by design: rewriting the
    * table every 5 s trigger would re-create the O(state)-per-batch
    * cost the bucketed store exists to avoid. Serving layers that need
    * per-trigger freshness read the state store itself
    * ([[graft.cdc.StateStore.read]] resolves either backend); a
    * Delta/Iceberg-backed table would instead MERGE the per-batch
    * deltas. */
  def publishState(
      spark: SparkSession,
      table: String,
      stateDir: String,
      task: TaskSpec,
      fieldTypes: Map[String, String] = Map.empty,
  ): Long = {
    import org.apache.spark.sql.functions.{col, from_json}
    val schema = outputSchema(task, fieldTypes)
    val typed = graft.cdc.StateStore.read(spark, stateDir)
      .select(from_json(col("doc"), schema).as("d"))
      .select(col("d.*"))
    typed.write.mode("overwrite").insertInto(table)
    spark.table(table).count()
  }

  /** [[publishState]] for every task of a config (the dir layout
    * `Runner.fromConfig` uses). Returns table -> rows. */
  def publishFromConfig(
      spark: SparkSession,
      config: graft.model.EngineConfig,
      baseDir: String,
  ): Map[String, Long] =
    config.tasks.map { td =>
      val fieldTypes = td.load.mappingBody.map(fieldTypesFromMapping).getOrElse(Map.empty)
      val table = td.load.index +
        (if (config.controls.indexNameSuffix.isEmpty) "" else s"_${config.controls.indexNameSuffix.stripPrefix("_")}")
      val dirName = td.name + config.controls.indexNameSuffix
      table -> publishState(spark, table, s"$baseDir/$dirName/state", td.transform, fieldTypes)
    }.toMap
}
