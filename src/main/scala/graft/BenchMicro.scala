package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-free CPU microbench: canonicalize+hash N synthetic URLs.
  * Separates raw compute scaling from shuffle/GC effects — used in
  * BENCH/BASELINE.md to attribute the local-mode scaling ceiling. */
object BenchMicro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_MICRO_N", "50000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = spark.range(0, n, 1, cpus * 4)
      .select(xxhash64(graft.functions.canonicalize_url(
        concat(lit("HTTPS://Host7.example:443/x/../p"), $"id", lit("%2f?q=1#f")))).as("h"))
      .agg(sum(pmod(col("h"), lit(1000000L)))).as[Long].head()
    val sec = (System.nanoTime() - t0) / 1e9
    // second kernel: ALREADY-canonical input → exercises the
    // zero-allocation byte-scan fast path (the common case for ~half of
    // extracted crawl links)
    val t1 = System.nanoTime()
    val outFast = spark.range(0, n, 1, cpus * 4)
      .select(xxhash64(graft.functions.canonicalize_url(
        concat(lit("https://host7.example/x/p"), $"id", lit("?q=1")))).as("h"))
      .agg(sum(pmod(col("h"), lit(1000000L)))).as[Long].head()
    val secFast = (System.nanoTime() - t1) / 1e9
    println(s"""{"cpus":$cpus,"n":$n,"sec":$sec,"urls_per_sec":${n / sec},"checksum":$out,""" +
      s""""fastpath_sec":$secFast,"fastpath_urls_per_sec":${n / secFast},"checksum_fast":$outFast}""")
    spark.stop()
  }
}
