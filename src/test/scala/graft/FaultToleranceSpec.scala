package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.TimeUnit

/** Runs [[FaultCheck]] as a SEPARATE driver process under `local[8,4]`
  * (maxFailures=4, so task retries are live) with
  * [[graft.crawl.FaultInjection]] failing every side-effecting shard task's
  * first attempt — before AND after its rename side effect — and asserts
  * the crawl, and a retire + re-discovery resume, stay byte-identical to
  * the sequential oracle, plus that snapshot expiry sweeps the failed
  * attempts' orphaned shard files.
  *
  * A subprocess because every other suite shares SparkTestBase's plain
  * local[8] session, where the FIRST task failure kills the job — retries
  * only exist under a maxFailures>1 master, and a JVM allows one
  * SparkContext at a time. */
class FaultToleranceSpec extends AnyFunSuite {

  test("crawl/retire equality vs the oracle under injected task retries " +
      "(local[8,4]); expiry sweeps failed attempts' orphan shards") {
    val log = new java.io.File("target/fault-check/check.log")
    val p = GraftSubprocess.start("graft.FaultCheck", Seq.empty, log)
    val finished = p.waitFor(10, TimeUnit.MINUTES)
    if (!finished) {
      p.destroyForcibly()
      fail(s"FaultCheck timed out; log tail:\n${GraftSubprocess.tail(log)}")
    }
    assert(p.exitValue() == 0,
      s"FaultCheck exited ${p.exitValue()}; log tail:\n${GraftSubprocess.tail(log)}")
    assert(GraftSubprocess.tail(log).contains("FAULT-CHECK OK all sites"),
      s"log tail:\n${GraftSubprocess.tail(log)}")
  }
}
