package graft

import graft.corpus.CorpusGen
import graft.crawl.Scheduler
import graft.functions.{canonicalize_url, host_of}
import graft.queries.CrawlOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The north-metric bench (BASELINE.json:2): "URLs fetched+deduped/sec on
  * a synthetic frontier" — one bulk frontier-expansion pass at cluster
  * saturation, the steady-state regime every round of a 10^10-URL crawl
  * lives in (where a round is billions of URLs, not the ramp-up tail the
  * iterative loop bench at sandbox scale is dominated by).
  *
  * The frontier is the bench corpus variant-multiplied ×V (each page URL
  * becomes V distinct `?v=k` URLs resolving to the same document), giving
  * a 20M-URL frontier from the 500k-page corpus with zero extra fixture
  * cost. The timed pipeline is exactly one crawl round: robots filter →
  * salted politeness schedule → fetch join → span explode → link
  * extraction → RFC 3986 canonicalization → xxhash64 → intra-batch dedup
  * → anti-join against a preloaded seen set.
  *
  * Run at SPARK_GRAFT_CPUS=8 and =32 on identical input for the N→4N
  * scaling evidence: efficiency = T_32 / (4 × T_8).
  */
object BenchFrontier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val variants = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_X", "40").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 4) // tasks ≫ cores
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // measure the shuffle path
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val fx = CorpusGen.ensureFor(spark, sfDir)
    val tier = CorpusGen.tierFor(sfDir)

    // ---- untimed input preparation ("the web" + the frontier + seen) ----
    val hostingX = CorpusGen.hosting(spark, fx)
      .select(col("url_canon"), col("host"), col("doc_id"), col("status"),
        explode(sequence(lit(0), lit(variants - 1))).as("v"))
      .withColumn("url_canon", concat(col("url_canon"), lit("?v="), col("v")))
      .withColumn("page_hash", xxhash64(col("url_canon")))
      .drop("v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val frontierSize = hostingX.count()

    val docs = CorpusGen.interleaved(spark, fx).persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()

    // seen set: every 10th base-page URL is already seen (candidate links
    // resolve to base URLs, so the anti-join genuinely dedupes ~10%)
    val seen = CorpusGen.hosting(spark, fx)
      .select(col("page_hash").as("url_hash"))
      .filter(pmod(col("url_hash"), lit(10)) === 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    seen.count()

    val delays = CorpusGen.robots(spark, fx).groupBy("host")
      .agg(max("crawl_delay_ms").as("delay_ms")).withColumn("ready_ts", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    delays.count()
    val disallow = CorpusGen.robots(spark, fx).filter(!col("allow"))
      .select(col("host").as("r_host"), col("path_prefix"))
      .collect()
    val disallowB = spark.sparkContext.broadcast(
      disallow.groupBy(_.getString(0)).map { case (h, rs) => h -> rs.map(_.getString(1)) })

    val frontier = hostingX
      .select(col("url_canon"), col("page_hash").as("url_hash"), col("host"), lit(0).as("depth"))

    // ---- the timed round -------------------------------------------------
    val t0 = System.nanoTime()

    val allowedUdf = udf { (host: String, url: String) =>
      val prefixes = disallowB.value.getOrElse(host, Array.empty[String])
      val path = graft.urls.UrlCanon.pathOf(url)
      !prefixes.exists(path.startsWith)
    }
    val allowed = frontier.filter(allowedUdf(col("host"), col("url_canon")))
    val sched = Scheduler.salted(allowed, delays, 0L)

    val fetched = sched.join(hostingX.select("page_hash", "doc_id", "status"),
        sched("url_hash") === col("page_hash"), "left")
      .drop("page_hash")

    val links = fetched.filter(col("status") === "ok")
      .join(docs, Seq("doc_id"))
      .select(col("url_canon").as("base_url"), posexplode(col("spans")).as(Seq("span_idx", "span")))
      .filter(col("span.kind") === "text")
      .select(col("base_url"), explode(graft.functions.extract_urls(col("span.text"))).as("raw"))
      .withColumn("link_canon", canonicalize_url(col("raw"), col("base_url")))
      .filter(col("link_canon").isNotNull)
      .withColumn("url_hash", xxhash64(col("link_canon")))

    val cand = links.groupBy("url_hash")
      .agg(min(col("link_canon")).as("url_canon"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val newUrls = cand.join(seen, Seq("url_hash"), "left_anti")
    val newCount = newUrls.count()

    val wallSec = (System.nanoTime() - t0) / 1e9
    // candidates processed = extracted links pre-dedup is the honest
    // denominator driver of work, but counting it would add a second job;
    // report fetched + distinct candidates (both already materialized)
    val candCount = cand.count()
    val urlsPerSec = (frontierSize + candCount) / wallSec
    println(
      s"""{"cpus":$cpus,"sf":"$sfDir","variants":$variants,""" +
        s""""frontier_urls":$frontierSize,"candidates":$candCount,"new_urls":$newCount,""" +
        s""""round_sec":$wallSec,"urls_fetched_plus_deduped_per_sec":$urlsPerSec}""")
    spark.stop()
  }
}
