package graft.asr

import scala.annotation.tailrec

/** X9: batch transcription job orchestration (reference: upload blob →
  * submit job → poll 5 s × 60 → fetch result files,
  * fixed_hebrew_aligner.py:326-407 — a run that failed 0/929 on a poll
  * bug; the engine makes the lifecycle explicit and testable).
  *
  * Driver-side workflow around the cluster: submission/polling are
  * control-plane calls (pluggable `BatchApi`), results re-enter Spark as
  * an ordinary payload scan (TranscriptNormalize.fromAzureBatch).
  * `sleeper` is injected so tests run without wall-clock waits.
  */
object BatchOrchestrator {

  sealed trait JobStatus
  case object Running extends JobStatus
  case class Succeeded(resultPayload: String) extends JobStatus
  case class Failed(reason: String) extends JobStatus

  trait BatchApi {
    def upload(name: String, content: Array[Byte]): String // → blob url
    def submit(blobUrl: String): String                    // → job id
    def status(jobId: String): JobStatus
  }

  sealed trait Outcome
  case class Completed(payload: String, polls: Int) extends Outcome
  case class Errored(reason: String, polls: Int) extends Outcome
  case class TimedOut(polls: Int) extends Outcome

  /** Upload, submit, poll to completion. Defaults mirror the reference:
    * 60 attempts at 5-s intervals.
    */
  def run(api: BatchApi, name: String, content: Array[Byte],
      maxPolls: Int = 60, pollIntervalMs: Long = 5000,
      sleeper: Long => Unit = Thread.sleep): Outcome = {
    val jobId = api.submit(api.upload(name, content))
    @tailrec
    def poll(attempt: Int): Outcome =
      if (attempt >= maxPolls) TimedOut(attempt)
      else api.status(jobId) match {
        case Succeeded(payload) => Completed(payload, attempt + 1)
        case Failed(reason) => Errored(reason, attempt + 1)
        case Running =>
          sleeper(pollIntervalMs)
          poll(attempt + 1)
      }
    poll(0)
  }
}
