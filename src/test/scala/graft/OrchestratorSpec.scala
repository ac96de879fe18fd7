package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.asr.BatchOrchestrator
import graft.asr.BatchOrchestrator._
import graft.ops.TranscriptNormalize
import graft.streaming.ProgressListener
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class OrchestratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Fake control plane: succeeds after N polls with a batch payload. */
  private class FakeApi(pollsToFinish: Int, outcome: JobStatus)
      extends BatchApi {
    var uploads = 0
    var polls = 0
    override def upload(name: String, content: Array[Byte]): String = {
      uploads += 1; s"blob://$name"
    }
    override def submit(blobUrl: String): String = s"job-$blobUrl"
    override def status(jobId: String): JobStatus = {
      polls += 1
      if (polls >= pollsToFinish) outcome else Running
    }
  }

  private val payload =
    """{"recognizedPhrases":[{"nbest":[{"confidence":0.9,"words":[
      |{"word":"שלום","offsetInTicks":0,"durationInTicks":10000000}]}]}]}"""
      .stripMargin

  test("batch orchestration: submit → poll → complete → re-enter Spark") {
    val api = new FakeApi(3, Succeeded(payload))
    val out = BatchOrchestrator.run(api, "Gen_1.mp3", Array[Byte](1),
      maxPolls = 10, sleeper = _ => ())
    assert(out == Completed(payload, 3))
    assert(api.uploads == 1)
    // the completed payload flows through the normal provider scan
    import spark.implicits._
    val words = TranscriptNormalize.fromAzureBatch(
      Seq(("Gen", 1, payload)).toDF("book", "chapter", "payload")).collect()
    assert(words.length == 1 && words.head.getString(3) == "שלום")
    assert(words.head.getDouble(5) == 1.0)
  }

  test("batch orchestration: failure and poll-budget exhaustion") {
    val failed = BatchOrchestrator.run(new FakeApi(2, Failed("bad header")),
      "x", Array.empty, maxPolls = 10, sleeper = _ => ())
    assert(failed == Errored("bad header", 2))
    val timedOut = BatchOrchestrator.run(new FakeApi(100, Succeeded("p")),
      "x", Array.empty, maxPolls = 4, sleeper = _ => ())
    assert(timedOut == TimedOut(4))
  }

  test("ProgressListener accumulates batch rates for ETA") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val listener = new ProgressListener
    spark.streams.addListener(listener)
    try {
      val stream = MemoryStream[Int]
      val q = stream.toDS().writeStream.format("memory")
        .queryName("prog_out").outputMode("append").start()
      stream.addData(1 to 100: _*)
      q.processAllAvailable()
      stream.addData(1 to 50: _*)
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(30000)
      assert(listener.totalRows == 150)
      assert(listener.etaSeconds(0) == 0.0 ||
        listener.etaSeconds(1000) > 0.0)
    } finally spark.streams.removeListener(listener)
  }
}
