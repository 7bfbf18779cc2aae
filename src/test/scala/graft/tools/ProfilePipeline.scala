package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: where does cdc_pipeline_state's time go at sf0.1?
  * Separates source materialization, the fused apply, and the raw
  * JSON parse/render cost of the same doc corpus. */
object ProfilePipeline {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.cdc.{BatchApplier, OplogRow, StateStore}
    import graft.source.EventsOplog
    import graft.ops.Tables
    import OplogRow.encoder

    val events = Tables.events(spark, dir)
    def run(): Long = {
      val oplog = EventsOplog.fromEvents(events).as[OplogRow]
      BatchApplier.applyOplogBatch(
        oplog, StateStore.empty(spark), graft.SparkEntry.flagshipTask,
        source = Some(EventsOplog.sourceSnapshotRaw(events))).count()
    }

    def runNoSource(): Long = {
      val oplog = EventsOplog.fromEvents(events).as[OplogRow]
      BatchApplier.applyOplogBatch(
        oplog, StateStore.empty(spark), graft.SparkEntry.flagshipTask).count()
    }
    def unionOnly(): Long =
      EventsOplog.fromEvents(events)
        .unionByName(EventsOplog.sourceSnapshotRaw(events)
          .select(col("ts"), lit("s").as("op"), lit("x").as("ns"), col("id"),
            col("doc"), lit(false).as("fromMigrate")))
        .count()

    time("events scan")(events.count())
    time("events scan warm")(events.count())
    time("fromEvents render")(EventsOplog.fromEvents(events).count())
    time("fromEvents warm")(EventsOplog.fromEvents(events).count())
    time("snapshotRaw")(EventsOplog.sourceSnapshotRaw(events).count())
    time("snapshotRaw warm")(EventsOplog.sourceSnapshotRaw(events).count())
    time("union only warm")(unionOnly())
    time("full apply (cold)")(run())
    time("full apply (warm1)")(run())
    time("full apply (warm2)")(run())
    time("apply no-source warm")(runNoSource())
    time("apply no-source warm2")(runNoSource())

    // raw SerDe share: parse + render every oplog doc once, driver-side
    val docs = EventsOplog.fromEvents(events).select("doc").collect().map(_.getString(0))
    println(s"[profile] docs: ${docs.length}")
    time("Json.parseObj x all")(docs.foreach(d => graft.model.Json.parseObj(d)))
    val parsed = docs.map(d => graft.model.Json.parseObj(d))
    time("render x all")(parsed.foreach(_.render))
    spark.stop()
  }
}
