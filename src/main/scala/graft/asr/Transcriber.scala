package graft.asr

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{ChapterAudio, TranscribedWord, Verse}

/** X1-X3: the model-inference operator pattern. Providers (Whisper HF
  * pipeline, Azure SDK/batch — reference
  * hebrew_alignment_tool.py:126-135,216-299) are pluggable behind this
  * trait; CI uses the deterministic fake (zero-egress environment,
  * SURVEY.md §7.4 risk 5).
  *
  * Execution shape: `mapPartitions` with a per-executor lazily-initialized
  * model singleton — the model loads once per executor JVM, not per row,
  * and batches flow through it partition-sized. Cluster sizing is plain
  * partition count (`repartition(n)` replaces the reference's asyncio
  * semaphore, SURVEY.md §3.2).
  */
trait Transcriber extends Serializable {
  /** Transcribe one chapter's audio into word rows. */
  def transcribe(audio: ChapterAudio): Seq[TranscribedWord]
}

/** Deterministic fake: emits words from the paired reference text with
  * uniform timing — the CI stand-in for a word-timestamp ASR model.
  * Optionally drops every `dropEvery`-th word (simulating ASR misses) so
  * alignment exercises its estimated paths.
  */
case class FakeTranscriber(
    referenceWords: Map[(String, Int), Seq[String]],
    wordsPerSecond: Double = 2.0,
    dropEvery: Int = 0,
    confidence: Double = 0.9) extends Transcriber {

  override def transcribe(audio: ChapterAudio): Seq[TranscribedWord] = {
    val words = referenceWords.getOrElse((audio.book, audio.chapter),
      Seq.empty)
    val dur = 1.0 / wordsPerSecond
    words.zipWithIndex
      .filter { case (_, i) => dropEvery <= 0 || (i + 1) % dropEvery != 0 }
      .zipWithIndex
      .map { case ((w, origIdx), seq) =>
        TranscribedWord(audio.book, audio.chapter, seq + 1, w,
          origIdx * dur, origIdx * dur + dur * 0.8, confidence)
      }
  }
}

/** X4 + retry policy: adaptive placement with per-chapter fallback.
  * The reference probes free VRAM, falls back to CPU per file on OOM,
  * and retries ×3 with a delay
  * (scripts/hebrew_alignment_tool_gpu.py:46-96,347-423,465-468). Here:
  * try `primary` up to `retries` times (injected sleep between
  * attempts), then `fallback` once — all inside the task, so one bad
  * chapter degrades locally instead of failing the job.
  */
case class AdaptiveTranscriber(
    primary: Transcriber,
    fallback: Transcriber,
    retries: Int = 3,
    retryDelayMs: Long = 2000,
    sleeper: Long => Unit = Thread.sleep) extends Transcriber {

  override def transcribe(audio: graft.model.ChapterAudio)
  : Seq[graft.model.TranscribedWord] = {
    var attempt = 0
    while (attempt < retries) {
      try return primary.transcribe(audio)
      catch {
        case _: Exception =>
          attempt += 1
          if (attempt < retries) sleeper(retryDelayMs)
      }
    }
    fallback.transcribe(audio)
  }
}

object TranscribeOp {

  /** Executor-side singleton holder keyed by provider id: a heavy model
    * is constructed at most once per (executor JVM, key), mirroring the
    * reference's lazy model load
    * (scripts/hebrew_alignment_tool_gpu.py:155-167). Production
    * transcribers call `ModelHolder.get("whisper-small", ...)` inside
    * `transcribe`; the FakeTranscriber needs no heavy state.
    */
  object ModelHolder {
    private val cached =
      new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
    def get[T <: AnyRef](key: String, build: () => T): T =
      cached.computeIfAbsent(key, _ => build()).asInstanceOf[T]
  }

  /** The inference operator: audio partitions → transcribed word rows.
    * The transcriber is closure-serialized (config only — heavy state
    * loads lazily executor-side via ModelHolder / @transient lazy vals).
    */
  def transcribe(audio: Dataset[ChapterAudio], transcriber: Transcriber)
  : Dataset[TranscribedWord] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(rows => rows.flatMap(transcriber.transcribe))
  }

  /** Fake-transcription derived DISTRIBUTIVELY from the reference verses:
    * groups a chapter's words executor-side and runs the FakeTranscriber
    * kernel per group — no driver-side `collect()` of the corpus (at
    * 100× the corpus a collected verse map OOMs the driver). Timing
    * output is byte-identical to `transcribe(audio, FakeTranscriber(m))`.
    */
  def transcribeFromVerses(verses: Dataset[Verse],
      wordsPerSecond: Double = 2.0, dropEvery: Int = 0,
      confidence: Double = 0.9): Dataset[TranscribedWord] = {
    val spark = verses.sparkSession
    import spark.implicits._
    verses.groupByKey(v => (v.book, v.chapter))
      .flatMapGroups { (key: (String, Int), vs: Iterator[Verse]) =>
        val (book, chapter) = key
        val words = vs.toSeq.sortBy(_.verseNum).flatMap(_.words)
        FakeTranscriber(Map((book, chapter) -> words), wordsPerSecond,
          dropEvery, confidence)
          .transcribe(ChapterAudio(book, chapter, s"${book}_$chapter",
            16000, 0.0, Seq.empty))
          .iterator
      }
  }
}
