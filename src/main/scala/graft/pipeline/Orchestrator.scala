package graft.pipeline

import java.sql.Timestamp

import scala.collection.immutable.ListMap

/** Airflow-shaped orchestration semantics for the batch ELT DAG —
  * the scheduling layer the reference runs as an Airflow deployment
  * (`/root/reference/src/dags/batch_elt_company.py:9-31`: `default_args`
  * retries + `retry_delay`, `start_date`, `schedule`, `catchup`).
  *
  * [[BatchElt.runDag]] replicates the reference's dependency ORDERING;
  * this object adds the run-state machine around it:
  *
  *   - per-task retries with a delay between attempts (`retry_delay`),
  *     injectable sleep so specs run wall-clock-free
  *   - Airflow's failure propagation: a failed task (after retries)
  *     marks every transitive downstream task `upstream_failed` without
  *     running it, while independent branches still execute
  *   - schedule/catchup: a run is due for interval [T, T+interval) once
  *     T+interval has passed; `catchup=true` backfills every missed
  *     interval since the last completed run, `catchup=false` runs only
  *     the most recent one (the reference ships `schedule=None,
  *     catchup=False` — manual-trigger only — which maps to
  *     `schedule = None` here)
  *
  * Driver-side control flow only — each task body is ordinary Spark
  * batch work (the lakehouse hops in [[BatchElt]]), so nothing here
  * touches the data path or its scale shape.
  */
object Orchestrator {

  /** Execution context handed to each attempt (Airflow's logical date
    * + try number, the bits task bodies actually consume).
    */
  final case class RunContext(dagId: String, logicalDate: Timestamp, attempt: Int)

  /** A schedulable task: dependency names, retry budget, retry delay.
    * Mirrors the reference's `default_args` knobs (retries,
    * retry_delay); `body` runs once per attempt.
    */
  final case class TaskDef(
      name: String,
      deps: Seq[String] = Nil,
      retries: Int = 0,
      retryDelayMs: Long = 0L)(val body: RunContext => Unit)

  sealed trait TaskState
  object TaskState {
    case object Success extends TaskState
    case object Failed extends TaskState
    case object UpstreamFailed extends TaskState
  }

  /** Outcome of one task within a DAG run: terminal state, number of
    * attempts actually made (0 for upstream_failed), last error.
    */
  final case class TaskResult(state: TaskState, attempts: Int, error: Option[String])

  final case class DagRunResult(
      dagId: String,
      logicalDate: Timestamp,
      tasks: ListMap[String, TaskResult]) {
    def succeeded: Boolean = tasks.values.forall(_.state == TaskState.Success)
  }

  /** DAG-level schedule spec. `scheduleMs = None` is Airflow's
    * `schedule=None`: manual triggers only, [[dueLogicalDates]] is
    * always empty.
    */
  final case class DagSpec(
      dagId: String,
      startDate: Timestamp,
      scheduleMs: Option[Long],
      catchup: Boolean = false)

  /** Deterministic topological order: tasks run in declaration order
    * subject to dependencies (depth-first over deps, like
    * [[BatchElt.runDag]]); unknown deps and cycles are authoring errors
    * surfaced eagerly, before anything executes.
    */
  def topoOrder(tasks: Seq[TaskDef]): Seq[TaskDef] = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names")
    tasks.foreach(t =>
      t.deps.foreach(d => require(byName.contains(d), s"task ${t.name}: unknown dep $d")))
    val ordered = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(name: String, visiting: Set[String]): Unit = {
      if (ordered.contains(name)) return
      require(!visiting.contains(name), s"dependency cycle at $name")
      byName(name).deps.foreach(visit(_, visiting + name))
      ordered += name
    }
    tasks.foreach(t => visit(t.name, Set.empty))
    ordered.toSeq.map(byName)
  }

  /** Execute one DAG run at `logicalDate`. Sequential like the
    * reference's executor; `sleep` is the retry-delay effect (inject a
    * no-op in tests).
    */
  def runOnce(
      dagId: String,
      tasks: Seq[TaskDef],
      logicalDate: Timestamp,
      sleep: Long => Unit = Thread.sleep): DagRunResult = {
    val results = scala.collection.mutable.LinkedHashMap.empty[String, TaskResult]
    topoOrder(tasks).foreach { t =>
      val blocked = t.deps.exists(d => results(d).state != TaskState.Success)
      if (blocked) {
        results += t.name -> TaskResult(TaskState.UpstreamFailed, 0, None)
      } else {
        var attempt = 0
        var outcome: Option[TaskResult] = None
        while (outcome.isEmpty) {
          attempt += 1
          try {
            t.body(RunContext(dagId, logicalDate, attempt))
            outcome = Some(TaskResult(TaskState.Success, attempt, None))
          } catch {
            // cancellation is not a transient failure: restore the
            // interrupt flag and fail immediately — never burn the retry
            // budget re-running whole task bodies after a shutdown request
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              outcome = Some(TaskResult(TaskState.Failed, attempt, Some(e.toString)))
            case scala.util.control.NonFatal(_) if attempt <= t.retries =>
              // an interrupt landing during the retry delay must resolve
              // like the in-body interrupt path — restore the flag and
              // record Failed — not escape runOnce and discard the
              // accumulated results
              if (t.retryDelayMs > 0) {
                try sleep(t.retryDelayMs)
                catch {
                  case e: InterruptedException =>
                    Thread.currentThread().interrupt()
                    outcome = Some(TaskResult(TaskState.Failed, attempt, Some(e.toString)))
                }
              }
            case scala.util.control.NonFatal(e) =>
              outcome = Some(TaskResult(TaskState.Failed, attempt, Some(e.toString)))
          }
        }
        results += t.name -> outcome.get
      }
    }
    DagRunResult(dagId, logicalDate, ListMap(results.toSeq: _*))
  }

  /** Logical dates due at `now`: one per schedule interval [T,
    * T+interval) whose end has passed, starting after `lastCompleted`
    * (exclusive) or at `startDate`. `catchup=false` collapses the
    * backlog to the single most recent due interval — Airflow's
    * semantics exactly. Manual-only DAGs (no schedule) are never due.
    */
  def dueLogicalDates(
      spec: DagSpec,
      lastCompleted: Option[Timestamp],
      now: Timestamp): Seq[Timestamp] =
    spec.scheduleMs match {
      case None => Nil
      case Some(interval) =>
        require(interval > 0, "schedule interval must be positive")
        val first = lastCompleted
          .map(_.getTime + interval)
          .getOrElse(spec.startDate.getTime)
        // number of complete intervals [first + j·interval, +interval)
        // whose end has passed; 0 when the first hasn't closed yet
        val complete =
          if (first + interval > now.getTime) 0L
          else (now.getTime - first) / interval
        if (complete == 0L) Nil
        else if (spec.catchup)
          (0L until complete).map(j => new Timestamp(first + j * interval))
        else
          // O(1): a year-old anchor on a minute schedule must not
          // materialize half a million timestamps per poll just to
          // keep the last one
          Seq(new Timestamp(first + (complete - 1) * interval))
    }

  /** Run every due interval in order (oldest first) — the catchup/
    * backfill loop. Returns the executed runs; the caller persists the
    * last successful logical date for the next poll.
    */
  def runPending(
      spec: DagSpec,
      tasks: Seq[TaskDef],
      lastCompleted: Option[Timestamp],
      now: Timestamp,
      sleep: Long => Unit = Thread.sleep): Seq[DagRunResult] =
    dueLogicalDates(spec, lastCompleted, now).map(d =>
      runOnce(spec.dagId, tasks, d, sleep))
}
