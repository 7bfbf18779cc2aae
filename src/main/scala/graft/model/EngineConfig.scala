package graft.model

/** Reference-compatible configuration loader (reference src/config.ts,
  * src/main.ts:9-15): parses the SAME config.json a mongo-es deployment
  * uses — connections, controls, and the task list with its
  * extract/transform/load sections — into engine objects, so switching
  * engines means pointing the existing config file at this runtime.
  *
  * Field-for-field mapping:
  *  - `tasks[].transform` -> [[TaskSpec]] (mapping keeps insertion
  *    order — the fold order of the mapping projection is semantic,
  *    reference src/processor.ts:66-78; `static` seeds; `parent` routes)
  *  - `tasks[].extract`   -> namespace + projection pushdown set
  *  - `tasks[].from`      -> checkpoint seed (scan resume id / tail time)
  *  - `controls`          -> engine knobs: `elasticsearchBulkInterval` is
  *    the micro-batch trigger (C3), `elasticsearchBulkSize` the source
  *    admission bound (S4: maxFilesPerTrigger / maxOffsetsPerTrigger
  *    analog), `mongodbReadCapacity` the scan-phase rate cap,
  *    `indexNameSuffix` the blue/green DDL suffix (L3).
  *
  * Parsing uses the engine's own [[Json]] codec; unknown fields are
  * ignored (forward-compatible, like the reference's destructuring).
  */
final case class CheckpointSpec(
    phase: String, // "scan" | "tail"
    id: Option[String], // scan resume ObjectID (hex), reference config.ts:29-34
    time: Option[String], // tail start time (ISO-8601)
) {
  def timeEpochSeconds: Option[Long] =
    time.map(t => java.time.Instant.parse(t).getEpochSecond)
}

final case class ExtractSpec(
    db: String,
    collection: String,
    projection: Vector[(String, Int)],
) {
  def ns: String = s"$db.$collection"
  /** Paths the scan should carry (P1): keys with value 1. */
  def projectedPaths: Vector[String] = projection.collect { case (k, 1) => k }
}

final case class LoadSpec(index: String, esType: String, mappingBody: Option[DObj])

final case class TaskDef(
    from: CheckpointSpec,
    extract: ExtractSpec,
    transform: TaskSpec,
    load: LoadSpec,
) {
  /** Checkpoint name, reference src/config.ts:73-75. */
  def name: String = s"${extract.db}.${extract.collection}___${load.index}.${load.esType}"
}

final case class ControlsSpec(
    mongodbReadCapacity: Option[Long], // None = unbounded (code default)
    elasticsearchBulkSize: Int,
    elasticsearchBulkInterval: Int,
    indexNameSuffix: String,
)

final case class EngineConfig(
    mongodbUrl: String,
    mongodbOptions: DObj, // MongoClientOptions passthrough (auth/TLS/pool, config.ts:5-12)
    elasticsearchHost: String,
    elasticsearchOptions: DObj, // es ConfigOptions passthrough (config.ts:14-22)
    elasticsearchIndices: Vector[DObj], // IndicesCreateParams[] for index init (config.ts:16,21)
    controls: ControlsSpec,
    tasks: Vector[TaskDef],
) {
  /** The connector option surface (reference config.ts:5-22): connection
    * URL plus the client-options object flattened to string options, the
    * way a `spark.read.format(...).options(...)` connector receives
    * them. Nested objects flatten with dotted keys (`ssl.enabled`). */
  def mongoSourceOptions: Map[String, String] =
    Map("url" -> mongodbUrl) ++ flatten("", mongodbOptions)

  def esSinkOptions: Map[String, String] =
    Map("host" -> elasticsearchHost) ++ flatten("", elasticsearchOptions)

  /** Source admission options realizing the S4 controls: the reference's
    * docs/sec read capacity × the micro-batch trigger interval is the
    * per-trigger row budget (`maxRowsPerTrigger` on the DSv2 source). */
  def sourceAdmissionOptions: Map[String, String] =
    controls.mongodbReadCapacity.map { cap =>
      "maxRowsPerTrigger" ->
        math.max(1L, cap * controls.elasticsearchBulkInterval / 1000L).toString
    }.toMap

  private def flatten(prefix: String, o: DObj): Map[String, String] =
    o.fields.flatMap {
      case (k, nested: DObj) => flatten(s"$prefix$k.", nested)
      case (k, DStr(v))      => Map(s"$prefix$k" -> v)
      case (k, DInt(v))      => Map(s"$prefix$k" -> v.toString)
      case (k, DDbl(v))      => Map(s"$prefix$k" -> v.toString)
      case (k, DBool(v))     => Map(s"$prefix$k" -> v.toString)
      // scalar arrays (e.g. an ES hosts list) join comma-separated —
      // the conventional connector-option encoding; anything deeper
      // passes through as JSON for the connector to parse
      case (k, DArr(items)) if items.forall(i => !i.isInstanceOf[DObj] && !i.isInstanceOf[DArr]) =>
        Map(s"$prefix$k" -> items.map {
          case DStr(s) => s
          case other   => other.render
        }.mkString(","))
      case (k, arr: DArr) => Map(s"$prefix$k" -> arr.render)
      case _              => Map.empty[String, String]
    }.toMap
}

object EngineConfig {

  // shared JSON accessors — one definition so both parse paths (root and
  // per-task) keep identical lookup semantics
  private def obj(o: DObj, k: String): DObj = o.get(k) match {
    case Some(d: DObj) => d
    case _             => DObj.empty
  }
  private def str(o: DObj, k: String): Option[String] = o.get(k) match {
    case Some(DStr(v)) => Some(v)
    case _             => None
  }
  private def int(o: DObj, k: String): Option[Long] = o.get(k) match {
    case Some(DInt(v)) => Some(v)
    case Some(DDbl(v)) => Some(v.toLong)
    case _             => None
  }

  def fromJson(s: String): EngineConfig = {
    val root = Json.parseObj(s)

    val controlsO = obj(root, "controls")
    val controls = ControlsSpec(
      mongodbReadCapacity = int(controlsO, "mongodbReadCapacity"),
      elasticsearchBulkSize = int(controlsO, "elasticsearchBulkSize").getOrElse(5000L).toInt,
      elasticsearchBulkInterval = int(controlsO, "elasticsearchBulkInterval").getOrElse(5000L).toInt,
      indexNameSuffix = str(controlsO, "indexNameSuffix").getOrElse(""),
    )

    val tasks = root.get("tasks") match {
      case Some(DArr(items)) => items.collect { case t: DObj => parseTask(t) }
      case _                 => Vector.empty
    }

    val esO = obj(root, "elasticsearch")
    EngineConfig(
      mongodbUrl = str(obj(root, "mongodb"), "url").getOrElse(""),
      mongodbOptions = obj(obj(root, "mongodb"), "options"),
      elasticsearchHost = str(obj(esO, "options"), "host").getOrElse(""),
      elasticsearchOptions = obj(esO, "options"),
      elasticsearchIndices = esO.get("indices") match {
        case Some(DArr(items)) => items.collect { case d: DObj => d }
        case _                 => Vector.empty
      },
      controls = controls,
      tasks = tasks,
    )
  }

  private def parseTask(t: DObj): TaskDef = {
    val fromO = obj(t, "from")
    val from = CheckpointSpec(
      phase = str(fromO, "phase").getOrElse("scan"),
      id = str(fromO, "id"),
      time = str(fromO, "time"),
    )

    val extractO = obj(t, "extract")
    val extract = ExtractSpec(
      db = str(extractO, "db").getOrElse(""),
      collection = str(extractO, "collection").getOrElse(""),
      projection = obj(extractO, "projection").fields.collect {
        case (k, DInt(v)) => k -> v.toInt
      },
    )

    val transformO = obj(t, "transform")
    val transform = TaskSpec(
      mapping = obj(transformO, "mapping").fields.collect { case (src, DStr(dst)) => src -> dst },
      static = obj(transformO, "static"),
      parent = str(transformO, "parent"),
    )

    val loadO = obj(t, "load")
    val load = LoadSpec(
      index = str(loadO, "index").getOrElse(""),
      esType = str(loadO, "type").getOrElse("_doc"),
      mappingBody = loadO.get("body").collect { case d: DObj => d },
    )

    TaskDef(from, extract, transform, load)
  }
}
