package graft.streaming

/** Minimal GroupState for unit-folding flatMapGroupsWithState update
  * functions in specs — no streaming query needed. */
final class TestGroupState[S](init: Option[S], watermarkMs: Long = 0L)
    extends org.apache.spark.sql.streaming.GroupState[S] {
  private var cur: Option[S] = init
  /** Last value passed to setTimeoutTimestamp, for asserting deadline
    * arithmetic (e.g. the funnel TTL's monotone-deadline clamp). */
  var lastTimeoutMs: Long = Long.MinValue
  override def exists: Boolean = cur.isDefined
  override def get: S = cur.get
  override def getOption: Option[S] = cur
  override def update(s: S): Unit = cur = Some(s)
  override def remove(): Unit = cur = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = lastTimeoutMs = t
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = watermarkMs
  override def getCurrentProcessingTimeMs(): Long = 0L
}
