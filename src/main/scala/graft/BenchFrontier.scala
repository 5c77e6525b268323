package graft

import java.nio.file.{Files, Paths}
import java.util.Comparator

import graft.corpus.CorpusGen
import graft.crawl.{RobotsAllows, RobotsIndex, Scheduler}
import graft.functions.canonicalize_url
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftinternal.Shim
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
  * cost. The timed pipeline is exactly one crawl round: robots filter
  * (the engine's codegen [[RobotsAllows]] expression — round 3 replaced
  * the bench-local Scala UDF, which was both slower and unrepresentative
  * of the engine's actual filter) → salted politeness schedule → fetch
  * join → span explode → link extraction → RFC 3986 canonicalization →
  * xxhash64 → intra-batch dedup → anti-join against a preloaded seen set.
  *
  * The static inputs ("the web" hosting map and the interleaved corpus)
  * live as one-time bucketed+sorted parquet tables — the same production
  * layout the iterative crawl loop adopted in round 3 (CrawlEngine
  * .bucketedInput): the fetch join and the docs join scan bucket-aligned
  * with no exchange and no sort on the static side, so the timed round
  * shuffles only the frontier-derived sides. The bucket count is PINNED
  * (default 128) independently of the core count, so the N-core and
  * 4N-core scaling runs read byte-identical inputs through an identical
  * exchange topology.
  *
  * Run at SPARK_GRAFT_CPUS=8 and =32 on identical input for the N→4N
  * scaling evidence: efficiency = T_32 / (4 × T_8).
  */
object BenchFrontier {
  /** One-time bucketed+sorted parquet table next to the fixtures (bench
    * storage prep, local-FS by design — the engine's own snapshot/shard
    * I/O goes through the Hadoop FileSystem API instead). Re-registered
    * from explicit DDL in fresh sessions (in-memory catalog). */
  private def bucketedTable(spark: SparkSession, loc: String, name: String,
                            key: String, buckets: Int, ddl: String)
                           (src: => DataFrame): DataFrame = {
    val tbl = s"bench_${name}_${java.lang.Integer.toHexString(loc.hashCode)}"
    val marker = Paths.get(loc, "_BUCKETED_DONE")
    if (!Files.exists(marker)) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = Paths.get(loc)
      if (Files.exists(dir)) {
        val walk = Files.walk(dir)
        try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.delete(p))
        finally walk.close()
      }
      src.repartition(buckets, col(key))
        .write.format("parquet").bucketBy(buckets, key).sortBy(key)
        .option("path", loc).saveAsTable(tbl)
      Files.createFile(marker)
    } else if (!spark.catalog.tableExists(tbl)) {
      spark.sql(s"CREATE TABLE $tbl ($ddl) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
        s"LOCATION '$loc'")
    }
    spark.table(tbl)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val variants = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_X", "40").toInt
    // sequence(0, variants-1) with variants<=0 silently yields a
    // DESCENDING [0, -1, ...] (Spark picks step -1), doubling the
    // frontier with bogus ?v=-1 URLs instead of erroring
    require(variants >= 1, s"SPARK_GRAFT_FRONTIER_X must be >= 1, got $variants")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_BUCKETS", "128").toInt
    // SPARK_GRAFT_EXECUTORS=E runs the SAME round under local-cluster
    // [E, cpus, mem] — E real executor JVMs (netty shuffle, serialized
    // closures/broadcasts, per-JVM codegen) instead of local threads.
    // Run at E and 4E on identical input for the N→4N EXECUTOR scaling
    // line (BASELINE.json: efficiency = thpt_4E / (4 × thpt_E)).
    val executors = sys.env.get("SPARK_GRAFT_EXECUTORS").map(_.toInt)
    val execMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MB", "8192").toInt
    val totalCores = cpus * executors.getOrElse(1)
    val builder = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", totalCores * 4) // tasks ≫ cores
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // measure the shuffle path
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A/B knob: shuffle/spill block codec (default lz4). zstd trades
      // CPU for bytes — the right trade iff the run is bus/IO-bound, so
      // measure per regime rather than assume.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "lz4"))
    executors match {
      case Some(e) =>
        builder.master(s"local-cluster[$e,$cpus,$execMb]")
        ClusterCheck.clusterConfigs.foreach { case (k, v) => builder.config(k, v) }
      case None => builder.master(s"local[$cpus]")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fx = CorpusGen.ensureFor(spark, sfDir)

    // ---- untimed input preparation ("the web" + the frontier + seen) ----
    // CorpusGen.GenVersion in the path — same staleness rule as the
    // engine's bucketedInput: a generator bump regenerates only the base
    // parquet, so derived tables must version their own location
    val prepRoot = s"$fx/frontierx-${CorpusGen.GenVersion}-v$variants-b$buckets"
    val hostingX = bucketedTable(spark, s"$prepRoot/hosting", "hostingx",
      "page_hash", buckets,
      "url_canon STRING, host STRING, doc_id STRING, status STRING, page_hash BIGINT") {
      CorpusGen.hosting(spark, fx)
        .select(col("url_canon"), col("host"), col("doc_id"), col("status"),
          explode(sequence(lit(0), lit(variants - 1))).as("v"))
        .withColumn("url_canon", concat(col("url_canon"), lit("?v="), col("v")))
        .withColumn("page_hash", xxhash64(col("url_canon")))
        .drop("v")
    }
    val frontierSize = hostingX.count()

    val docs = bucketedTable(spark, s"$prepRoot/docs", "docs", "doc_id", buckets,
      "doc_id STRING, spans ARRAY<STRUCT<kind: STRING, text: STRING, " +
        "media_ref: STRING, offset: INT>>") {
      CorpusGen.interleaved(spark, fx)
    }

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
    val robotsIndex = new RobotsIndex(
      CorpusGen.robots(spark, fx).select("host", "allow", "path_prefix").collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
        .groupBy(_._1).map { case (h, rs) => h -> rs.map(r => (r._2, r._3)) })

    val frontier = hostingX
      .select(col("url_canon"), col("page_hash").as("url_hash"), col("host"), lit(0).as("depth"))
    // north-metric numerator: URLs that actually get FETCHED — i.e. the
    // robots-allowed frontier, not the raw frontier (robots-denied rows
    // never reach the scheduler or fetch join and counting them inflated
    // the metric a few percent — review finding). Counted untimed here;
    // the timed round runs the same codegen filter as part of the work.
    val allowedSize = frontier.filter(Shim.col(RobotsAllows(
      Shim.expr(col("host")), Shim.expr(col("url_canon")), robotsIndex))).count()

    // ---- the timed round -------------------------------------------------
    val t0 = System.nanoTime()

    // Skinny scheduling (late round 3, OPT-IN — measured worse here):
    // url_canon (the row's widest column, ~60-80 B vs ~30 B for the
    // rest) does NOT transit the scheduler exchange, the global-order
    // range exchange, or the fetch-join exchange — it is recovered from
    // the bucketed hosting table by the fetch join the pipeline already
    // does (exchange-free on the bucketed side). Same-binary interleaved
    // A/B (BENCH/BASELINE.md §5): wash at c8, consistently ~25% slower
    // at c32 (the recovered column widens the hosting-side parquet read,
    // and this box's shuffle is memory-bus-bound, so saved bytes don't
    // pay). Wide is default; GRAFT_FRONTIER_SKINNY selects skinny for
    // network-shuffle-bound deployments.
    val wide = !sys.env.contains("GRAFT_FRONTIER_SKINNY")
    val allowed0 = frontier.filter(Shim.col(RobotsAllows(
      Shim.expr(col("host")), Shim.expr(col("url_canon")), robotsIndex)))
    val allowed = if (wide) allowed0 else allowed0.select("url_hash", "host", "depth")
    val sched = Scheduler.salted(allowed, delays, 0L)

    val hostingCols = if (wide) Seq("page_hash", "doc_id", "status")
                      else Seq("page_hash", "url_canon", "doc_id", "status")
    val fetched = sched.join(hostingX.select(hostingCols.map(col): _*),
        sched("url_hash") === col("page_hash"), "left")
      .drop("page_hash")

    val links = fetched.filter(col("status") === "ok")
      .join(docs, Seq("doc_id"))
      .select(col("url_canon").as("base_url"), explode(col("spans")).as("span"))
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
    val urlsPerSec = (allowedSize + candCount) / wallSec
    println(
      s"""{"cpus":$cpus,"executors":${executors.getOrElse(0)},""" +
        s""""sf":"$sfDir","variants":$variants,"buckets":$buckets,""" +
        s""""frontier_urls":$frontierSize,"fetched_urls":$allowedSize,""" +
        s""""candidates":$candCount,"new_urls":$newCount,""" +
        s""""round_sec":$wallSec,"urls_fetched_plus_deduped_per_sec":$urlsPerSec}""")
    spark.stop()
  }
}
