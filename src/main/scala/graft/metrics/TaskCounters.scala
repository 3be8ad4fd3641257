package graft.metrics

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Cumulative Spark task counters (attribution discipline): a wall
  * time that moves between runs is explained by the window's own
  * counters — task run/CPU time, shuffle and scan volume — not by
  * guessing at host variance. Volumes flat + CPU up = the host was
  * slow; volumes up = the code did more. Shared by the pipeline's
  * per-stage marks and the bench's per-query rows so the SAME
  * instrument backs both artifacts.
  */
final class TaskCounters extends SparkListener {
  val runMs = new AtomicLong; val cpuNs = new AtomicLong
  val shufWrite = new AtomicLong; val shufRead = new AtomicLong
  val input = new AtomicLong; val records = new AtomicLong
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      runMs.addAndGet(m.executorRunTime)
      cpuNs.addAndGet(m.executorCpuTime)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      input.addAndGet(m.inputMetrics.bytesRead)
      records.addAndGet(m.inputMetrics.recordsRead)
    }
  }
  /** (runMs, cpuNs, shufWriteB, shufReadB, inputB, records) */
  def snapshot: Seq[Long] = Seq(runMs.get, cpuNs.get, shufWrite.get,
    shufRead.get, input.get, records.get)
}

object TaskCounters {
  /** Block until every posted listener event has been delivered, so a
    * snapshot taken after an action covers all of that action's
    * stages. Queries run serially in the bench, so drain + delta =
    * exact per-query attribution.
    *
    * NEVER fatal: Spark's `waitUntilEmpty()` throws TimeoutException
    * after 10 s if the async queues are still lagging (possible right
    * after a mult=64/128 edges stage posting millions of task events).
    * A metrics call must not kill a pipeline run nor be misreported as
    * a query failure — on timeout, warn and proceed; the snapshot then
    * under-attributes the tail of the window by at most the lag, which
    * the warning makes visible. */
  def drain(sc: SparkContext): Unit =
    try org.apache.spark.graftshim.busflush.waitUntilEmpty(sc)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          "[metrics] listener bus still draining after 10s; counter " +
            "snapshot may under-attribute this window's tail")
    }

  /** Fixed single-threaded calibration probe (~1 s nominal on an idle
    * host): a deterministic xorshift integer mix whose wall time is a
    * pure function of how much CPU the host actually gives ONE thread.
    * Recorded at bench start and end, it lets any reader of the JSON
    * separate host contention (probe slow) from code regression (probe
    * nominal, query counters up) without access to the machine. */
  def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < 500000000L) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x += i
      i += 1
    }
    // data dependency defeats dead-code elimination; never taken
    if (x == 42L) System.err.print("")
    (System.nanoTime() - t0) / 1e6
  }
}
