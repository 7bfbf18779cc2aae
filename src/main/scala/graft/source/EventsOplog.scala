package graft.source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adapter interpreting the harness `events` table as a CDC oplog
  * (FIXTURES.md §B role mapping: user_id -> `_id`, event_type ->
  * op-class, ts -> oplog ts, props JSON -> dynamic doc body):
  *
  *   - `signup`                  -> i  (full doc: value, k, last_type)
  *   - `click`/`view`/`purchase` -> u  (`$set` of the same fields)
  *   - `error`                   -> d
  *
  * The packed oplog ts is (epoch_seconds << 32) | (event_id mod 2^31):
  * event_id is globally monotone in the synthetic data, so within one
  * second the ordinal reproduces a total order, exactly like the BSON
  * Timestamp counter (reference src/types.ts:41).
  */
object EventsOplog {

  def fromEvents(events: DataFrame, ns: String = "app.users"): DataFrame = {
    val ts = (unix_timestamp(col("ts")).cast("long") * lit(4294967296L)) +
      pmod(col("event_id"), lit(2147483648L))
    val idStr = col("user_id").cast("string")
    val kVal = get_json_object(col("props"), "$.k").cast("long")

    val insertDoc = to_json(struct(
      idStr.as("_id"),
      col("value").as("value"),
      kVal.as("k"),
      col("event_type").as("last_type")))
    val updateDoc = to_json(struct(struct(
      col("value").as("value"),
      kVal.as("k"),
      col("event_type").as("last_type")).as("$set")))
    val deleteDoc = to_json(struct(idStr.as("_id")))

    events.select(
      ts.as("ts"),
      when(col("event_type") === "signup", lit("i"))
        .when(col("event_type") === "error", lit("d"))
        .otherwise(lit("u")).as("op"),
      lit(ns).as("ns"),
      idStr.as("id"),
      when(col("event_type") === "signup", insertDoc)
        .when(col("event_type") === "error", deleteDoc)
        .otherwise(updateDoc).as("doc"),
      lit(false).as("fromMigrate"),
    )
  }

  /** Source snapshot for the Mongo-fallback join (S5 replacement): one
    * source-shaped doc per user — the earliest signup. */
  def sourceSnapshot(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events.filter(col("event_type") === "signup")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        col("user_id").cast("string").as("id"),
        to_json(struct(
          col("user_id").cast("string").as("_id"),
          col("value").as("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("event_type").as("last_type"))).as("doc"))
  }

  /** Undeduplicated snapshot rows for [[graft.cdc.BatchApplier]], which
    * picks the earliest row per key inside its one co-grouped pass — so
    * the dedup needs no window shuffle of its own. Carries the packed ts
    * for that in-group ordering. */
  def sourceSnapshotRaw(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "signup")
      .select(
        col("user_id").cast("string").as("id"),
        to_json(struct(
          col("user_id").cast("string").as("_id"),
          col("value").as("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("event_type").as("last_type"))).as("doc"),
        ((unix_timestamp(col("ts")).cast("long") * lit(4294967296L)) +
          pmod(col("event_id"), lit(2147483648L))).as("ts"))
}
