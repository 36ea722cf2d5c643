package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the event-time operators
  * (SURVEY.md §2.9 stretch): the same declarative expressions as
  * graft.operators.EventTime, applied to a streaming DataFrame —
  * watermarks bound state, late data beyond the watermark is dropped.
  *
  * These take the streaming DataFrame as input (from `readStream` or a
  * test MemoryStream) and return the transformed streaming frame; the
  * caller picks the sink/outputMode. State stores are per-key and
  * watermark-expired — bounded memory at any scale.
  */
object StreamingOps {

  /** Tumbling 1 h counts per event type with a watermark: late events
    * older than the watermark are dropped, completed windows are
    * emitted (append mode) once the watermark passes window end. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows (30 min gap) per user under a watermark —
    * `session_window` merges events into variable-length sessions;
    * state for a session is dropped once the watermark passes its end. */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup within the watermark horizon — the streaming
    * form of the reference's dedup-before-load precondition
    * (`/root/reference/src/load/pg.rs:19-20`): duplicate event_ids
    * arriving within the watermark are dropped; state is purged as the
    * watermark advances (bounded, unlike naive dropDuplicates). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
