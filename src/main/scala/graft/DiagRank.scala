package graft

import graft.corpus.CorpusGen
import graft.queries.GraphOps
import org.apache.spark.sql.SparkSession

/** Diagnostic: wall time of q45's hostRank loop on a tier — the harness
  * that attributed the iterative-loop compounding costs (plan growth,
  * AQE re-planning over the cached chain; SURVEY §8c.24). Run with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS; DIAG_AQE=false A/Bs the
  * adaptive-execution cost. */
object DiagRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("DIAG_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = CorpusGen.ensureFor(spark, sfDir)
    val tE = System.nanoTime()
    val edges = GraphOps.docEdges(spark, d).select("src_host", "dst_host")
      .groupBy("src_host", "dst_host")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("double")
        .as("w_pre")).drop("w_pre").persist()
    val nEdges = edges.count()
    println(f"[diagrank] edges $nEdges%d pairs ${(System.nanoTime() - tE) / 1e9}%.2f s")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val perStage = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = s.stageInfo
        val run = if (si.taskMetrics != null) si.taskMetrics.executorRunTime else -1L
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        perStage.add((si.name.takeWhile(_ != '\n').take(60), si.numTasks, run, wall))
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskNanos.addAndGet(t.taskInfo.duration * 1000000L)
      }
    })
    val iters = sys.env.getOrElse("DIAG_ITERS", "10").toInt
    val t0 = System.nanoTime()
    val out = GraphOps.hostRank(edges, iters)
    println(f"[diagrank] rank loop ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"jobs ${jobs.get}%d stages ${stages.get}%d tasks ${tasks.get}%d " +
      f"taskTime ${taskNanos.get / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    perStage.asScala.toSeq.sortBy(-_._4).take(12).foreach { case (nm, nt, run, wall) =>
      println(f"[diagrank] stage wall ${wall}%5d ms run ${run}%5d ms tasks $nt%3d  $nm%s")
    }
    out.unpersist(false)
    edges.unpersist(false)
    spark.stop()
  }
}
