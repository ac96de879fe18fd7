package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST1: the ASR event stream as a stateful streaming computation. The
  * reference accumulates recognition callbacks per session until
  * `session_stopped` fires or a 300-s timeout lapses
  * (fixed_hebrew_aligner.py:252-324); here the session key is
  * (book, chapter), words accumulate in group state, and the timeout maps
  * to `GroupStateTimeout.ProcessingTimeTimeout` — the dropped-late /
  * NoMatch analog emits a partial result flagged `completed=false`.
  *
  * Scale: state is per in-flight chapter (bounded: words of one chapter);
  * completed groups drop their state immediately.
  */
object RecognitionState {

  /** One recognition callback: kind ∈ {"word", "session_stopped"}. */
  case class RecognitionEvent(
      book: String,
      chapter: Int,
      kind: String,
      text: String,
      start: Double,
      end: Double,
      confidence: Double)

  case class SessionBuffer(
      words: Seq[RecognitionEvent],
      stopped: Boolean)

  /** The A1-style rollup emitted per completed (or timed-out) session. */
  case class RecognitionResult(
      book: String,
      chapter: Int,
      wordCount: Int,
      confidence: Double,
      totalDuration: Double,
      completed: Boolean)

  private def rollup(key: (String, Int), buf: SessionBuffer,
      completed: Boolean): RecognitionResult = {
    val ws = buf.words
    RecognitionResult(key._1, key._2, ws.size,
      if (ws.isEmpty) 0.0 else ws.map(_.confidence).sum / ws.size,
      if (ws.isEmpty) 0.0 else ws.map(_.end).max,
      completed)
  }

  /** The stateful operator; `timeout` mirrors the reference's 300-s cap
    * (`Some("300 seconds")` in production). `None` disables the timeout —
    * with ProcessingTimeTimeout the engine schedules timeout-check
    * micro-batches continuously, so tests (and sources that always send
    * `session_stopped`) run quiescent with NoTimeout.
    */
  /** A recognition callback stamped with its EVENT time — the variant
    * the watermarked sessionization consumes.
    */
  case class TimedRecognitionEvent(
      book: String,
      chapter: Int,
      kind: String,
      text: String,
      start: Double,
      end: Double,
      confidence: Double,
      eventTime: java.sql.Timestamp)

  case class TimedSessionBuffer(
      words: Seq[RecognitionEvent],
      stopped: Boolean,
      lastEventMs: Long)

  /** Event-time sessionization: the watermark bounds how late a callback
    * may arrive, and a session times out `gapMs` after its LAST event in
    * EVENT time — deterministic and replayable on historical streams,
    * where the ProcessingTimeTimeout variant depends on the wall clock
    * of the replay (the gap a re-run cannot reproduce). The timed-out
    * emission is the same NoMatch-analog partial result
    * (`completed=false`).
    *
    * Scale: identical bounded per-chapter state; late events beyond
    * `watermarkDelay` are dropped by the engine instead of resurrecting
    * finished sessions.
    */
  def sessionizeEventTime(events: Dataset[TimedRecognitionEvent],
      watermarkDelay: String = "10 seconds",
      gapMs: Long = 300000L): Dataset[RecognitionResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("eventTime", watermarkDelay)
      .groupByKey(e => (e.book, e.chapter))
      .flatMapGroupsWithState[TimedSessionBuffer, RecognitionResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, evts, state: GroupState[TimedSessionBuffer]) =>
          if (state.hasTimedOut) {
            val buf = state.getOption
              .getOrElse(TimedSessionBuffer(Nil, false, 0L))
            state.remove()
            Iterator(rollup(key, SessionBuffer(buf.words, buf.stopped),
              completed = false))
          } else {
            val prev = state.getOption
              .getOrElse(TimedSessionBuffer(Nil, false, 0L))
            val incoming = evts.toSeq
            val words = prev.words ++ incoming.filter(_.kind == "word")
              .sortBy(_.start)
              .map(e => RecognitionEvent(e.book, e.chapter, e.kind,
                e.text, e.start, e.end, e.confidence))
            val stopped = prev.stopped ||
              incoming.exists(_.kind == "session_stopped")
            if (stopped) {
              state.remove()
              Iterator(rollup(key, SessionBuffer(words, true),
                completed = true))
            } else {
              val lastMs = math.max(prev.lastEventMs,
                incoming.map(_.eventTime.getTime).max)
              state.update(TimedSessionBuffer(words, stopped = false, lastMs))
              state.setTimeoutTimestamp(lastMs + gapMs)
              Iterator.empty
            }
          }
      }
  }

  def sessionize(events: Dataset[RecognitionEvent],
      timeout: Option[String] = Some("300 seconds"))
  : Dataset[RecognitionResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (timeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(e => (e.book, e.chapter))
      .flatMapGroupsWithState[SessionBuffer, RecognitionResult](
        OutputMode.Append, timeoutConf) {
        case (key, evts, state: GroupState[SessionBuffer]) =>
          if (state.hasTimedOut) {
            // NoMatch analog: emit partial, drop state
            val buf = state.getOption.getOrElse(SessionBuffer(Nil, false))
            state.remove()
            Iterator(rollup(key, buf, completed = false))
          } else {
            val prev = state.getOption.getOrElse(SessionBuffer(Nil, false))
            val incoming = evts.toSeq
            val words = prev.words ++
              incoming.filter(_.kind == "word").sortBy(_.start)
            val stopped = prev.stopped ||
              incoming.exists(_.kind == "session_stopped")
            if (stopped) {
              state.remove()
              Iterator(rollup(key, SessionBuffer(words, true),
                completed = true))
            } else {
              state.update(SessionBuffer(words, stopped = false))
              timeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            }
          }
      }
  }
}
