package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Diagnostic: phase attribution for q47 (near-dup clusters) — q25 pair
  * generation vs the hostComponents label-propagation loop. Run with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS; GRAFT_TRACE=1 adds the
  * per-iteration lines from hostComponents. */
object DiagComponents {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val pairs = SparkEntry.queries("q25_lsh_pairs")(spark, sfDir)
    val nPairs = pairs.count()
    println(f"[diagcomp] q25 pairs $nPairs%d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    val tick = new java.util.concurrent.atomic.AtomicBoolean(true)
    val mainThread = Thread.currentThread()
    val ticker = new Thread(() => {
      var lastJobs = -1
      var static = 0
      while (tick.get()) {
        val j = jobs.get
        static = if (j == lastJobs) static + 1 else 0
        lastJobs = j
        System.err.println(s"[diagcomp-tick] jobs=$j tasks=${tasks.get}")
        if (static >= 3) {
          System.err.println("[diagcomp-stall] main thread stack:")
          mainThread.getStackTrace.take(25).foreach(f =>
            System.err.println(s"[diagcomp-stall]   $f"))
        }
        Thread.sleep(2000)
      }
    })
    ticker.setDaemon(true) // must not pin the JVM if the loop throws
    ticker.start()
    val t1 = System.nanoTime()
    val comps = graft.queries.GraphOps.hostComponents(
      pairs.select(col("doc_a").as("src_host"), col("doc_b").as("dst_host")))
    tick.set(false)
    val nComp = comps.count()
    println(f"[diagcomp] components $nComp%d labeled ${(System.nanoTime() - t1) / 1e9}%.2f s")
    comps.unpersist(false)
    pairs.unpersist(false)
    spark.stop()
  }
}
