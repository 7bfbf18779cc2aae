package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key running profile via `transformWithState` — the arbitrary-
  * state operator that supersedes `flatMapGroupsWithState` (which
  * `StatefulCounts` demonstrates): typed named state cells, native
  * per-cell TTL, timers, and the RocksDB state store underneath.
  *
  * Scale shape: state lives in the per-partition RocksDB instance —
  * keyed access is local, changelog-checkpointed, and TTL eviction is
  * the store's job rather than a hand-rolled timeout fold. State size
  * is O(active keys within TTL), the property that lets a per-user
  * profile stream run forever; with `TTLConfig.NONE` it degrades to
  * O(all keys ever) and is only right for bounded key domains.
  */
final case class ProfileEvent(user_id: Long, value: Double)
final case class UserProfile(user_id: Long, n_events: Long, total: Double)

final class RunningProfileProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, ProfileEvent, UserProfile] {
  @transient private var stat: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stat = getHandle.getValueState[(Long, Double)](
      "stat", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), ttl)

  override def handleInputRows(
      key: Long,
      rows: Iterator[ProfileEvent],
      timerValues: TimerValues): Iterator[UserProfile] = {
    val (n0, t0) = if (stat.exists()) stat.get() else (0L, 0.0)
    var n = n0; var t = t0
    rows.foreach { e => n += 1; t += e.value }
    stat.update((n, t))
    Iterator.single(UserProfile(key, n, t))
  }
}

object RunningProfile {

  /** One updated profile row per key per micro-batch that touches it;
    * counts/totals accumulate across batches in named value state. */
  def profiles(events: Dataset[ProfileEvent],
               ttl: TTLConfig = TTLConfig.NONE): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningProfileProcessor(ttl), TimeMode.None(), OutputMode.Update())
  }

  /** Convenience for a processing-time TTL horizon, e.g. "PT10M". */
  def ttl(d: Duration): TTLConfig = TTLConfig(d)
}
