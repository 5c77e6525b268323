package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.TimeUnit

/** Runs [[ClusterCheck]] as a SEPARATE driver process under
  * `local-cluster[2,4,2048]` — Spark's standalone scheduler with two real
  * forked executor JVMs — and asserts the crawl (and a retire +
  * re-discovery resume) is byte-identical to the sequential oracle there.
  * This is the multi-process evidence `local[n]` cannot give: closure/task
  * serialization, broadcast transport, netty shuffle between processes,
  * and executors reading bloom-shard files a different JVM wrote.
  *
  * The `kill` test goes further: SIGKILL one executor JVM mid-crawl
  * (round 2 committed — cached blocks, live shards, in-flight work on the
  * victim) and require the crawl to finish byte-identical anyway, with at
  * least 3 more rounds committed after the kill so the lost state was
  * genuinely needed again (lineage recompute off the previous round's
  * frontier file, cross-JVM re-reads of the dead executor's shard files).
  *
  * Subprocesses (not session swaps in this JVM) because a JVM allows one
  * SparkContext at a time and every other suite shares SparkTestBase's
  * local[8] session. */
class ClusterCrawlSpec extends AnyFunSuite {

  test("crawl + retire/resume equality vs the oracle under " +
      "local-cluster[2,4] (two executor JVMs)") {
    runClusterCheck("check", "CLUSTER-CHECK OK")
  }

  test("crawl equality vs the oracle with one executor JVM SIGKILLed " +
      "mid-crawl (executor loss, cache/shard recovery)") {
    runClusterCheck("kill", "CLUSTER-KILL OK")
  }

  test("crawl equality vs the oracle with every shard task's first " +
      "attempt failing AFTER its rename, in forked executor JVMs " +
      "(multi-JVM task retries via graft.fault.arm)") {
    runClusterCheck("retry", "CLUSTER-RETRY OK")
  }

  private def runClusterCheck(mode: String, okMarker: String): Unit = {
    val log = new java.io.File(s"target/cluster-check/$mode.log")
    // SPARK_SCALA_VERSION: the standalone worker launches executor JVMs
    // through the launcher, which resolves SPARK_HOME/jars and needs the
    // scala version when not started via Spark's shell scripts
    val p = GraftSubprocess.start("graft.ClusterCheck",
      Seq("2", "4", "2048", mode), log,
      env = Map("SPARK_SCALA_VERSION" -> "2.13"))
    val finished = p.waitFor(10, TimeUnit.MINUTES)
    if (!finished) {
      p.destroyForcibly()
      fail(s"ClusterCheck $mode timed out; log tail:\n${GraftSubprocess.tail(log)}")
    }
    assert(p.exitValue() == 0,
      s"ClusterCheck $mode exited ${p.exitValue()}; log tail:\n${GraftSubprocess.tail(log)}")
    assert(GraftSubprocess.tail(log).contains(okMarker),
      s"log tail:\n${GraftSubprocess.tail(log)}")
  }
}
