package graft.io

/** Overlap INDEPENDENT Spark actions (writes of disjoint outputs) from
  * a small driver thread pool — optimization-guide §2.6: actions are
  * only sequential because the driver calls them sequentially, and a
  * job's tail (last tasks, commit protocol) leaves executors idle that
  * the next job's tasks could back-fill. Use ONLY for actions with no
  * ordering contract between them (disjoint output paths/tables);
  * crash-ordering-sensitive writes (e.g. data-before-sidecar) must
  * stay sequential.
  *
  * Failure: waits for every action, then rethrows the first failure
  * (unwrapped). Letting the siblings finish is deliberate — their
  * outputs are disjoint, so a aborted sibling would only leave MORE
  * partial state for the caller's crash contract to clean up.
  */
object ParallelActions {
  def run(actions: Seq[() => Unit]): Unit = {
    if (actions.sizeIs <= 1) { actions.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      actions.size)
    try {
      val futs = actions.map(a => pool.submit(
        new java.util.concurrent.Callable[Unit] {
          def call(): Unit = a()
        }))
      var firstFailure: Option[Throwable] = None
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty)
              firstFailure = Some(Option(e.getCause).getOrElse(e))
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }
}
