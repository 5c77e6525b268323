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
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.FaultCheck")
    val log = new java.io.File("target/fault-check/check.log")
    log.getParentFile.mkdirs()
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start()
    val finished = p.waitFor(10, TimeUnit.MINUTES)
    if (!finished) {
      p.destroyForcibly()
      fail(s"FaultCheck timed out; log tail:\n${tail(log)}")
    }
    assert(p.exitValue() == 0,
      s"FaultCheck exited ${p.exitValue()}; log tail:\n${tail(log)}")
    assert(tail(log).contains("FAULT-CHECK OK all sites"), s"log tail:\n${tail(log)}")
  }

  private def tail(f: java.io.File): String = {
    val s = java.nio.file.Files.readString(f.toPath)
    s.substring(math.max(0, s.length - 4000))
  }
}
