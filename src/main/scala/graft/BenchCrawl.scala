package graft

import graft.corpus.CorpusGen
import graft.crawl.CrawlEngine
import graft.queries.CrawlOps
import org.apache.spark.sql.SparkSession

/** Scaling-evidence bench (BASELINE.md protocol): runs ONLY the crawl at
  * local[SPARK_GRAFT_CPUS] on SPARK_GRAFT_SF_DIR and prints one JSON line
  * with whole-crawl and steady-state throughput. Run at CPUS=8 and =32 on
  * identical input to evidence N→4N executor scaling (BASELINE.json:2,14):
  * efficiency = T_32 / (4 × T_8).
  *
  * Steady-state throughput excludes the frontier ramp-up/drain rounds
  * (scheduled < 2% of total fetches): at the nominal 10^10-URL scale every
  * round is a bulk round, so steady-state is the number that predicts
  * cluster behavior; whole-crawl is reported alongside for transparency.
  */
object BenchCrawl {
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

    val tier = CorpusGen.tierFor(sfDir)
    val fx = CorpusGen.ensureFor(spark, sfDir) // untimed input preparation
    val cfg = CrawlOps.crawlConfigFor(cpus.toInt, tier)
    val engine = new CrawlEngine(spark, fx, s"target/crawl-scaling/${tier.name}-c$cpus", cfg)

    val t0 = System.nanoTime()
    engine.runFresh()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val manifest = engine.store.readManifest()
    def m(e: Map[String, Any], k: String): Double = engine.store.metricOf(e, k)
    val (fetched, candidates) = engine.store.crawlTotals(manifest)
    val bulk = manifest.filter(e => m(e, "scheduled") >= fetched * 0.02)
    val bulkWork = bulk.map(e => m(e, "scheduled") + m(e, "candidates")).sum
    val bulkSec = bulk.map(m(_, "round_sec")).sum
    println(
      s"""{"cpus":$cpus,"sf":"$sfDir","crawl_sec":$wallSec,""" +
        s""""fetched":$fetched,"dedup_candidates":$candidates,""" +
        s""""urls_per_sec":${(fetched + candidates) / wallSec},""" +
        s""""steady_rounds":${bulk.size},"steady_sec":$bulkSec,""" +
        s""""steady_urls_per_sec":${bulkWork / bulkSec}}""")
    spark.stop()
  }
}
