package graft.pipeline

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import Orchestrator._

/** Pins the Airflow-shaped run-state machine: ordering, retry budget +
  * delay, failure propagation to downstreams while siblings continue,
  * and schedule/catchup due-date computation. Pure driver-side — no
  * SparkSession needed.
  */
class OrchestratorSpec extends AnyFunSuite {

  private val t0 = Timestamp.valueOf("2025-01-01 00:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  private def diamond(log: collection.mutable.Buffer[String], failIn: Set[String] = Set.empty) =
    Seq(
      TaskDef("a")(_ => { log += "a"; if (failIn("a")) sys.error("boom a") }),
      TaskDef("b", Seq("a"))(_ => { log += "b"; if (failIn("b")) sys.error("boom b") }),
      TaskDef("c", Seq("a"))(_ => { log += "c"; if (failIn("c")) sys.error("boom c") }),
      TaskDef("d", Seq("b", "c"))(_ => { log += "d"; if (failIn("d")) sys.error("boom d") }))

  test("runs in dependency order with fan-in, all success") {
    val log = collection.mutable.Buffer.empty[String]
    val r = runOnce("dag", diamond(log), t0, sleep = _ => ())
    assert(log.toSeq == Seq("a", "b", "c", "d"))
    assert(r.succeeded)
    assert(r.tasks.values.forall(_.attempts == 1))
  }

  test("retries until success, sleeping retry_delay between attempts") {
    var calls = 0
    val slept = collection.mutable.Buffer.empty[Long]
    val tasks = Seq(TaskDef("flaky", retries = 3, retryDelayMs = 5000L) { _ =>
      calls += 1
      if (calls < 3) sys.error("transient")
    })
    val r = runOnce("dag", tasks, t0, sleep = slept += _)
    assert(r.tasks("flaky").state == TaskState.Success)
    assert(r.tasks("flaky").attempts == 3)
    assert(slept.toSeq == Seq(5000L, 5000L))
  }

  test("retry budget exhausted -> Failed with the last error recorded") {
    val tasks = Seq(TaskDef("doomed", retries = 2)(_ => sys.error("always")))
    val r = runOnce("dag", tasks, t0, sleep = _ => ())
    val res = r.tasks("doomed")
    assert(res.state == TaskState.Failed)
    assert(res.attempts == 3) // 1 try + 2 retries
    assert(res.error.exists(_.contains("always")))
    assert(!r.succeeded)
  }

  test("failure marks transitive downstream upstream_failed, sibling branch still runs") {
    val log = collection.mutable.Buffer.empty[String]
    val r = runOnce("dag", diamond(log, failIn = Set("b")), t0, sleep = _ => ())
    assert(r.tasks("a").state == TaskState.Success)
    assert(r.tasks("b").state == TaskState.Failed)
    assert(r.tasks("c").state == TaskState.Success) // independent branch
    assert(r.tasks("d").state == TaskState.UpstreamFailed)
    assert(r.tasks("d").attempts == 0)
    assert(log.toSeq == Seq("a", "b", "c")) // d never executed
  }

  test("attempt number is exposed in the run context") {
    val seen = collection.mutable.Buffer.empty[Int]
    val tasks = Seq(TaskDef("t", retries = 2) { ctx =>
      seen += ctx.attempt
      if (ctx.attempt < 2) sys.error("again")
    })
    runOnce("dag", tasks, t0, sleep = _ => ())
    assert(seen.toSeq == Seq(1, 2))
  }

  test("InterruptedException fails immediately — never burns the retry budget") {
    var calls = 0
    val tasks = Seq(
      TaskDef("cancelled", retries = 5, retryDelayMs = 1000L) { _ =>
        calls += 1
        throw new InterruptedException("shutdown requested")
      },
      TaskDef("downstream", Seq("cancelled"))(_ => ()))
    val slept = collection.mutable.Buffer.empty[Long]
    val r = runOnce("dag", tasks, t0, sleep = slept += _)
    assert(calls == 1) // no re-execution after cancellation
    assert(slept.isEmpty)
    assert(r.tasks("cancelled").state == TaskState.Failed)
    assert(r.tasks("cancelled").attempts == 1)
    assert(r.tasks("downstream").state == TaskState.UpstreamFailed)
    // the interrupt flag must be restored for the caller (and cleared
    // here so it can't poison later tests on this thread)
    assert(Thread.interrupted())
  }

  test("unknown dep and cycles rejected before any task runs") {
    val log = collection.mutable.Buffer.empty[String]
    intercept[IllegalArgumentException] {
      runOnce("dag", Seq(TaskDef("x", Seq("ghost"))(_ => log += "x")), t0, sleep = _ => ())
    }
    intercept[IllegalArgumentException] {
      runOnce(
        "dag",
        Seq(
          TaskDef("p", Seq("q"))(_ => log += "p"),
          TaskDef("q", Seq("p"))(_ => log += "q")),
        t0,
        sleep = _ => ())
    }
    assert(log.isEmpty)
  }

  test("catchup=true backfills every missed interval since start_date") {
    val spec = DagSpec("dag", t0, scheduleMs = Some(86400000L), catchup = true)
    val due = dueLogicalDates(spec, None, ts("2025-01-04 12:00:00"))
    assert(due == Seq(t0, ts("2025-01-02 00:00:00"), ts("2025-01-03 00:00:00")))
  }

  test("catchup=false collapses the backlog to the latest due interval") {
    val spec = DagSpec("dag", t0, scheduleMs = Some(86400000L), catchup = false)
    val due = dueLogicalDates(spec, None, ts("2025-01-04 12:00:00"))
    assert(due == Seq(ts("2025-01-03 00:00:00")))
  }

  test("an interval is due only once its end has passed") {
    val spec = DagSpec("dag", t0, scheduleMs = Some(86400000L), catchup = true)
    assert(dueLogicalDates(spec, None, ts("2025-01-01 23:59:59")).isEmpty)
    assert(dueLogicalDates(spec, None, ts("2025-01-02 00:00:00")) == Seq(t0))
  }

  test("resumes after the last completed logical date, exclusive") {
    val spec = DagSpec("dag", t0, scheduleMs = Some(86400000L), catchup = true)
    val due = dueLogicalDates(spec, Some(ts("2025-01-02 00:00:00")), ts("2025-01-05 00:00:00"))
    assert(due == Seq(ts("2025-01-03 00:00:00"), ts("2025-01-04 00:00:00")))
  }

  test("schedule=None is manual-only: never due (the reference's shipped config)") {
    val spec = DagSpec("dag", t0, scheduleMs = None, catchup = true)
    assert(dueLogicalDates(spec, None, ts("2030-01-01 00:00:00")).isEmpty)
  }

  test("runPending executes the backlog oldest-first with per-run results") {
    val spec = DagSpec("dag", t0, scheduleMs = Some(86400000L), catchup = true)
    val dates = collection.mutable.Buffer.empty[Timestamp]
    val tasks = Seq(TaskDef("only")(ctx => dates += ctx.logicalDate))
    val runs = runPending(spec, tasks, None, ts("2025-01-03 06:00:00"), sleep = _ => ())
    assert(runs.map(_.logicalDate) == Seq(t0, ts("2025-01-02 00:00:00")))
    assert(dates.toSeq == Seq(t0, ts("2025-01-02 00:00:00")))
    assert(runs.forall(_.succeeded))
  }
}
