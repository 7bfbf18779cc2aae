package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (r19 verdict item 3): decompose cdc_pipeline_state —
  * split the typed-fold cost from the shuffle/lookup/derivation cost
  * with noop-sink stage timings (guide §1.4 / the Q11Probe pattern).
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PIECE $tag%-28s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    import graft.cdc.{BatchApplier, OplogRow, StateStore}
    import graft.source.EventsOplog
    val events = graft.ops.Tables.events(spark, dir)
    import OplogRow.encoder
    val oplog = EventsOplog.fromEvents(events).as[OplogRow]

    // stage 1: the oplog derivation alone (scan + projection)
    time("oplog_derive")(oplog.toDF)
    // stage 2: source snapshot derivation alone
    time("source_snapshot")(EventsOplog.sourceSnapshotRaw(events))
    // stage 2b: the defensive distinct-key count the semi-join guard pays
    locally {
      val t0 = System.nanoTime()
      val n = oplog.select(col("id")).distinct().count()
      println(f"PIECE distinct_key_count_job      one=${(System.nanoTime() - t0) / 1e9}%.3f (n=$n)")
      val ts = (1 to 5).map { _ =>
        val t1 = System.nanoTime()
        oplog.select(col("id")).distinct().count()
        (System.nanoTime() - t1) / 1e9
      }
      println(f"PIECE distinct_key_count_steady   min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    // stage 3: the full fused apply (shuffle + typed fold), no JSON extract
    def applied = BatchApplier.applyOplogBatch(
      oplog, StateStore.empty(spark), graft.SparkEntry.flagshipTask,
      source = Some(EventsOplog.sourceSnapshotRaw(events)))
    time("apply_full")(applied)
    // stage 4: the declared query's tail (JSON field extract + sort)
    time("apply_plus_extract_sort")(applied
      .select(col("id"),
        get_json_object(col("doc"), "$.value").cast("double").as("value"),
        get_json_object(col("doc"), "$.k").cast("long").as("k"),
        get_json_object(col("doc"), "$.last_type").as("last_type"),
        col("ts"))
      .orderBy(col("id")))
    // stage 3-alt: the shuffle+sort WITHOUT the fold (same union, same
    // repartition+sortWithinPartitions, trivial consumer) — isolates
    // exchange cost from per-key fold CPU
    locally {
      val stateRows = StateStore.empty(spark).select(
        col("id"), lit(0).as("kind"), col("ts"), lit("").as("op"), lit("").as("ns"),
        col("doc"), col("parent"), lit(false).as("fromMigrate"))
      val eventRows = oplog.toDF.select(
        col("id"), lit(2).as("kind"), col("ts"), col("op"), col("ns"),
        col("doc"), lit(null: String).as("parent"), col("fromMigrate"))
      val all = stateRows.unionByName(eventRows)
      time("shuffle_sort_only")(all.repartition(32, col("id"))
        .sortWithinPartitions(col("id")))
    }
    spark.stop()
  }
}
