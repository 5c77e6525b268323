package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Temporary diagnostic: per-stage wall/CPU/shuffle-byte attribution for
  * the BenchFrontier timed round. Not part of the driver contract.
  * Runs BenchFrontier's main with a stage listener attached via the
  * existing session-builder path (getOrCreate reuses the session only
  * within one JVM, so this wraps the whole run). */
object DiagFrontier {
  def main(args: Array[String]): Unit = {
    val rows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, String, Int, Double, Double, Long, Long, Long)]())
    val hook = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows.add((si.stageId, si.name.replaceAll(" at .*", ""), si.numTasks,
          m.executorRunTime / 1e3, m.executorCpuTime / 1e9,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead))
      }
    }
    // piggyback: BenchFrontier builds the session; attach the listener to
    // whatever session exists right after it is created by running the
    // bench body in this JVM and registering the hook on the active context
    val reg = new Thread { override def run(): Unit = {
      var attached = false
      while (!attached) {
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession) match {
          case Some(s) => s.sparkContext.addSparkListener(hook); attached = true
          case None => Thread.sleep(50)
        }
      }
    } }
    reg.start()
    BenchFrontier.main(args)
    reg.join(1000)
    val sorted = new java.util.ArrayList(rows)
    sorted.sort((a, b) => java.lang.Double.compare(b._4, a._4))
    sorted.forEach { case (id, name, n, runS, cpuS, sr, sw, in) =>
      if (runS > 0.5)
        System.err.println(f"[stage] $id%4d $name%-28s tasks=$n%-4d run=$runS%8.1fs " +
          f"cpu=$cpuS%8.1fs shufR=${sr / 1e6}%9.1fMB shufW=${sw / 1e6}%9.1fMB in=${in / 1e6}%9.1fMB")
    }
  }
}
