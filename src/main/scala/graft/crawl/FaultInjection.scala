package graft.crawl

import org.apache.spark.TaskContext

/** Deterministic task-failure injection for fault-tolerance tests.
  *
  * At cluster scale task retries are routine (executor loss, preemption,
  * speculation), and Spark's retry contract is "re-run the task from its
  * input" — safe only if the task's side effects are idempotent. The
  * engine's one side-effecting task family is the executor-side seen-shard
  * build/retire ([[SeenSet.buildShards]] / [[SeenSet.retireFromShards]]),
  * which claims retry safety by construction (immutable uuid-named files,
  * write-temp-then-rename, the driver keeps only the successful attempt's
  * path). This hook lets a test PROVE that claim against Spark's real
  * retry machinery instead of asserting it in prose: arm a site, and every
  * task's FIRST attempt through that site throws; the retry (attempt 1)
  * runs clean. `*.pre` sites fail before the side effect, `*.post` sites
  * fail AFTER it — the nasty case, where the failed attempt's completed
  * side effect (a renamed shard file) must be invisible to the committed
  * result.
  *
  * Requires a `local[N, maxFailures>1]` master (plain `local[N]` fails the
  * job on the first task failure) — see [[graft.FaultCheck]], which
  * FaultToleranceSpec runs as a subprocess. The armed flag is a plain
  * static, so injection reaches executors only when tasks share the
  * driver's JVM (local mode); on a real cluster the hook is a no-op.
  * Disarmed cost in production: one volatile read per TASK (not per row).
  */
object FaultInjection {
  @volatile private var armedSite: String = _
  private val fires = new java.util.concurrent.atomic.AtomicLong(0)

  /** Arm `site`: every task attempt 0 through that site throws. */
  def arm(site: String): Unit = { fires.set(0); armedSite = site }
  def disarm(): Unit = armedSite = null

  /** Injected failures so far (tests assert > 0: the site was exercised). */
  def fireCount: Long = fires.get()

  /** The multi-JVM form of [[arm]]: a site armed via the
    * `graft.fault.arm` system property at JVM start. arm()'s static is
    * invisible to forked executor JVMs, so cluster tests ship this
    * property in spark.executor.extraJavaOptions instead; the driver
    * observes the injections through task-failure reasons (the thrown
    * message carries the `[FaultInjection]` marker), not fireCount. */
  private val propArmed: String = System.getProperty("graft.fault.arm")

  def maybeFail(site: String): Unit = {
    val armed = {
      val a = armedSite
      if (a != null) a else propArmed
    }
    if (armed != null && armed == site) {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        fires.incrementAndGet()
        throw new RuntimeException(
          s"[FaultInjection] injected failure at '$site' " +
            s"(partition ${tc.partitionId()}, attempt 0)")
      }
    }
  }
}
