package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST2: the job poll-monitor (reference: poll every 5 s, max 60 attempts,
  * fixed_hebrew_aligner.py:369-401) as a stateful streaming operator.
  * Status events for in-flight jobs stream in; state counts attempts per
  * job and emits a terminal row when the job succeeds, fails, or exhausts
  * its attempt budget. `Trigger.ProcessingTime("5 seconds")` supplies the
  * poll cadence at the query level.
  */
object PollMonitor {

  /** One poll observation: status ∈ {"Running","Succeeded","Failed"}. */
  case class PollEvent(jobId: String, status: String)

  case class PollState(attempts: Int)

  /** outcome ∈ {"succeeded", "failed", "exhausted"}. */
  case class PollResult(jobId: String, outcome: String, attempts: Int)

  def monitor(events: Dataset[PollEvent], maxAttempts: Int = 60)
  : Dataset[PollResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.jobId)
      .flatMapGroupsWithState[PollState, PollResult](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (jobId, evts, state: GroupState[PollState]) =>
          var attempts = state.getOption.map(_.attempts).getOrElse(0)
          var outcome: Option[String] = None
          val it = evts
          while (it.hasNext && outcome.isEmpty) {
            val e = it.next()
            attempts += 1
            e.status match {
              case "Succeeded" => outcome = Some("succeeded")
              case "Failed" => outcome = Some("failed")
              case _ if attempts >= maxAttempts => outcome = Some("exhausted")
              case _ =>
            }
          }
          outcome match {
            case Some(o) =>
              state.remove()
              Iterator(PollResult(jobId, o, attempts))
            case None =>
              state.update(PollState(attempts))
              Iterator.empty
          }
      }
  }
}
