package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming sessionization — the live twin of the q22 batch
  * gaps-and-islands law, built on Spark's NATIVE `session_window`
  * aggregation (the Spark-first choice: watermark-aware session merging
  * inside the engine's own stateful aggregation, RocksDB-compatible
  * state, no hand-rolled `flatMapGroupsWithState` buffer to maintain).
  *
  * Reference relevance: the reference delivers events one at a time to
  * in-process handlers (src/topic.ts:117-143); sessionization is the
  * canonical stateful consumer of that delivery at 100 TB ingest — the
  * session table feeds the trajectory corpus (q163), session timeouts
  * (T8 retention analog), and the behavioral rollups.
  *
  * BOUNDARY LAW (pinned by StreamingSessionizeSpec's planted exact-gap
  * case): Spark's session ranges merge when they TOUCH — an exact-gap
  * pair lands in ONE session, so a new session starts only when
  * `next_ts - prev_ts > gap`. That is EXACTLY q22's batch
  * gaps-and-islands law, so the streaming and batch session tables
  * agree row-for-row including the microsecond boundary, and the q204
  * oracle is q22's SQL verbatim.
  *
  * Output: one row per CLOSED session (append mode — a session emits
  * only once the watermark proves no future event can extend it), with
  * the session's min/max event time and event count. `session_end` is
  * the LAST EVENT's time (max ts), not session_window's `end` (which is
  * last-event + gap — an implementation artifact, not a data fact).
  *
  * Scale shape: state = one merging session range per open (key,
  * session) — O(open sessions), never O(events); the only shuffle is
  * the session_window aggregation's hash exchange on key. At 100 TB
  * ingest this is the same plan Structured Streaming runs for any
  * windowed agg, with session merging handled by the engine.
  */
object StreamingSessionize {

  final case class Session(
      key: String, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** Sessionize `df` (streaming or batch) per `keyCol` with the given
    * inactivity `gap` (e.g. "30 minutes"). `df` must carry a watermark
    * on `tsCol` when streaming (append-mode requirement).
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
      gap: String): Dataset[Session] = {
    val s = df.sparkSession
    import s.implicits._
    df.groupBy(session_window(col(tsCol), gap), col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select($"key", $"session_start", $"session_end", $"n_events")
      .as[Session]
  }
}
