package graft

import graft.corpus.CorpusGen
import graft.crawl.CrawlEngine
import graft.queries.CrawlOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Temporary diagnostic: per-job wall times + codegen compile totals for
  * the crawl. Not part of the driver contract. */
object DiagCrawl {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = java.util.Collections.synchronizedList(new java.util.ArrayList[(Int, Double, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        val chain = js.stageInfos.map(si => si.name.replaceAll(" at .*", "") + ":" + si.numTasks)
          .mkString("[", ",", "]")
        jobs.put(js.jobId, (js.time, s"stages=${js.stageInfos.size} tasks=$nTasks $site $chain"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        done.add((je.jobId, (je.time - t0) / 1e3, desc))
      }
    })
    // attribute jobs to SQL executions (a broadcast-build job runs under
    // its parent query's execution id), and keep each execution's plan
    // header so "who spawns the broadcast builds" is answerable
    val execPlans = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val jobExec = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          val bcasts = "BroadcastExchange".r.findAllIn(s.physicalPlanDescription).size
          val header = s.physicalPlanDescription.linesIterator
            .filter(_.nonEmpty).take(40)
            .filter(l => l.contains("Scan") || l.contains("Exchange"))
            .map(_.replaceAll("\\[.*", "").replaceAll("\\(\\d+\\)", "").trim)
            .mkString("; ").take(220)
          execPlans.put(s.executionId, s"bcast=$bcasts $header")
          if (sys.env.contains("GRAFT_DIAG_PLANS")) {
            val dir = java.nio.file.Paths.get("target/diag-plans")
            java.nio.file.Files.createDirectories(dir)
            java.nio.file.Files.write(
              dir.resolve(s"exec-${s.executionId}.txt"),
              s.physicalPlanDescription.getBytes)
          }
        case _ =>
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        Option(js.properties).flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .foreach(id => jobExec.put(js.jobId, id.toLong))
      }
    })
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong()
    val taskN = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = if (te.taskMetrics != null) {
        taskMs.addAndGet(te.taskMetrics.executorRunTime)
        taskCpuNs.addAndGet(te.taskMetrics.executorCpuTime)
        taskN.incrementAndGet()
      }
    })

    val tier = CorpusGen.tierFor(sfDir)
    val fx = CorpusGen.ensureFor(spark, sfDir)
    val cfg = CrawlOps.crawlConfigFor(cpus.toInt, tier)
    val engine = new CrawlEngine(spark, fx, s"target/crawl-diag/${tier.name}-c$cpus", cfg)
    val t0 = System.nanoTime()
    engine.runFresh()
    val wallSec = (System.nanoTime() - t0) / 1e9

    import org.apache.spark.metrics.source.CodegenMetrics
    System.err.println(f"[diag] crawl wall: $wallSec%.1f s")
    System.err.println(f"[diag] tasks: n=${taskN.get} runSec=${taskMs.get / 1e3}%.1f " +
      f"cpuSec=${taskCpuNs.get / 1e9}%.1f (runSec/32=${taskMs.get / 1e3 / 32}%.1f)")
    System.err.println(s"[diag] codegen compiles: ${CodegenMetrics.METRIC_COMPILATION_TIME.getCount} " +
      f"totalMs=${CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum}%d " +
      s"generatedClasses=${CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount}")
    import scala.jdk.CollectionConverters._
    val ds = done.asScala.toVector.sortBy(-_._2)
    System.err.println(s"[diag] jobs: ${ds.size} totalJobSec=${ds.map(_._2).sum}")
    // aggregate by call site: who is spawning all these jobs?
    ds.groupBy(_._3.replaceAll("stages=\\d+ tasks=\\d+ ", ""))
      .map { case (site, js) => (js.map(_._2).sum, js.size, site) }
      .toVector.sortBy(-_._1).take(20).foreach { case (sec, n, site) =>
        System.err.println(f"[diag] site $sec%7.2f s  n=$n%-4d $site")
      }
    ds.take(15).foreach { case (id, sec, desc) =>
      System.err.println(f"[diag] job $id%4d $sec%7.2f s  ${desc.take(120)}")
    }
    // per-execution rollup: job seconds grouped by the query's plan shape
    ds.groupBy(j => Option(jobExec.get(j._1)).flatMap(e => Option(execPlans.get(e)))
        .getOrElse("no-exec"))
      .map { case (plan, js) => (js.map(_._2).sum, js.size, plan) }
      .toVector.sortBy(-_._1).take(18).foreach { case (sec, n, plan) =>
        System.err.println(f"[diag] exec $sec%7.2f s  jobs=$n%-4d $plan")
      }
    spark.stop()
  }
}
