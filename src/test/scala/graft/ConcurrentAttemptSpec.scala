package graft

import graft.crawl.{BloomShardReader, HadoopConfSer, SeenSet}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions.col
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Speculative-execution (duplicate concurrent attempt) side-effect
  * contract, tested directly. At 1000 executors Spark routinely runs TWO
  * live attempts of the same shard-build task at once (speculation,
  * or a zombie attempt surviving its stage's re-run) — both complete the
  * rename side effect, and the engine's claim is that this is safe by
  * construction: every attempt writes its own uuid-named immutable file
  * via temp+rename, so attempts never collide, the driver keeps exactly
  * one attempt's paths, and the loser's files are unreferenced orphans
  * the expiry sweep removes.
  *
  * Spark's own speculation machinery CANNOT be used to exercise this in
  * the sandbox: a speculative clone never launches on the same HOST as
  * the original attempt (TaskSetManager.dequeueSpeculativeTask's
  * hasAttemptOnHost guard), and every executor here is on localhost —
  * measured directly: under local-cluster[2,4] with
  * spark.speculation=true and an injected 6 s straggler, tasks are
  * "Marking ... as speculatable" but no clone ever starts. So this spec
  * races two full buildShards attempts over the SAME input into the SAME
  * round directory — a strictly harsher overlap than speculation produces
  * (every task duplicated, all concurrent) — and asserts the contract.
  */
class ConcurrentAttemptSpec extends SparkTestBase {

  for (kind <- Seq("bloom", "cuckoo")) {
    test(s"two fully-overlapping $kind shard-build attempts in one round " +
        "dir: no collision, identical results, loser's orphans sweepable") {
      val P = 8
      val dir = s"target/concurrent-attempt/$kind"
      val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new HPath(dir), true)

      val hashes = spark.range(0, 20000)
        .select((col("id") * 2654435761L).as("url_hash")) // spread across shards

      def attempt() = SeenSet.buildShards(spark, hashes, None, dir, P,
        capacityPerShard = 50000L, fpp = 0.01, kind = kind)
      val f1 = Future(attempt())
      val f2 = Future(attempt())
      val (paths1, counts1) = Await.result(f1, 3.minutes)
      val (paths2, counts2) = Await.result(f2, 3.minutes)

      // uuid-per-attempt file names: the attempts never touched each
      // other's output, even racing in one directory
      assert(paths1.toSet.intersect(paths2.toSet).isEmpty,
        "attempts shared a shard file path — renames can collide under speculation")
      assert(paths1.length == P && paths2.length == P)
      assert(counts1 == counts2, "attempts disagree on per-shard counts")

      // either attempt's result is complete and correct: every inserted
      // hash probes true through whichever paths the driver kept
      val conf = new HadoopConfSer(spark.sparkContext.hadoopConfiguration)
      val sample = hashes.limit(2000).collect().map(_.getLong(0))
      val winner = new BloomShardReader(paths1, conf)
      val loser = new BloomShardReader(paths2, conf)
      assert(sample.forall(winner.mightContain),
        "winner attempt's shards have a false negative")
      assert(sample.forall(loser.mightContain),
        "loser attempt's shards have a false negative")

      // the loser's files are pure orphans: deleting them (what
      // SnapshotStore.expireRounds does once the round leaves the keep
      // window) cannot disturb the winner
      paths2.foreach(p => assert(fs.delete(new HPath(p), false), s"delete $p"))
      val fresh = new BloomShardReader(paths1, conf)
      assert(sample.forall(fresh.mightContain),
        "winner unreadable after sweeping the loser's orphans")
    }
  }
}
