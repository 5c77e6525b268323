package graft

import graft.streaming.FrontierStream
import graft.streaming.FrontierStream.{Discovery, NewUrl}
import graft.urls.UrlHash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class FrontierStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def disc(u: String, ts: Long): Discovery =
    Discovery(u, UrlHash.hash64(u), "h.example", 0, new java.sql.Timestamp(ts))

  test("streaming seen-set dedup emits each URL exactly once across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Discovery]
    val deduped = FrontierStream.dedupStream(spark, input.toDS(), shards = 4)
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(disc("https://a.example/p1", 1000), disc("https://a.example/p2", 2000),
        disc("https://a.example/p1", 3000))
      query.processAllAvailable()
      input.addData(disc("https://a.example/p2", 4000), disc("https://a.example/p3", 5000))
      query.processAllAvailable()
      val got = spark.table("dedup_out").as[NewUrl].collect().map(_.url_canon).sorted
      assert(got.toSeq == Seq("https://a.example/p1", "https://a.example/p2", "https://a.example/p3"))
    } finally query.stop()
  }

  test("watermarked per-host rate aggregation runs") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Discovery]
    val rates = FrontierStream.hostRates(input.toDS())
    val query = rates.writeStream
      .format("memory").queryName("rates_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(disc("https://a.example/p1", 1000), disc("https://a.example/p2", 2000))
      query.processAllAvailable()
      // advance watermark far enough to close the first window
      input.addData(disc("https://a.example/p9", 120000))
      query.processAllAvailable()
      val rows = spark.table("rates_out").collect()
      assert(rows.exists(_.getAs[Long]("n_discovered") == 2L), rows.mkString(","))
    } finally query.stop()
  }

  for ((provider, tag) <- Seq(
    (null, "hdfs-backed"), // session default
    ("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "rocksdb"))) // the 10^7+-key provider the scaladoc points production at
  test(s"dedup state survives a query restart from the checkpoint ($tag " +
      "store): URLs seen before the stop are still suppressed after") {
    // The streaming side of the fault matrix: a streaming crawl's driver
    // dies and a new query restarts from checkpointLocation. A replayable
    // FILE source (MemoryStream can't recover across queries), a real
    // parquet sink (its own commit log gives exactly-once output), and
    // flatMapGroupsWithState state in the configured state store.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    if (provider != null) spark.conf.set(providerKey, provider)
    try restartRoundTrip(s"target/stream-restart-$tag")
    finally prevProvider match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def restartRoundTrip(baseDir: String): Unit = {
    val base = new java.io.File(baseDir)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckDir = new java.io.File(base, "ck").getAbsolutePath

    def writeFile(name: String, rows: Seq[Discovery]): Unit =
      spark.createDataset(rows).coalesce(1)
        .write.mode("overwrite").parquet(s"${srcDir.getAbsolutePath}/$name")

    def startQuery() = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Discovery]].schema)
        .option("maxFilesPerTrigger", "1") // several micro-batches per phase
        .parquet(s"${srcDir.getAbsolutePath}/*")
        .as[Discovery]
      FrontierStream.dedupStream(spark, src, shards = 4)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append())
        .start()
    }
    def emitted(): Seq[String] =
      spark.read.parquet(outDir).as[NewUrl].collect().map(_.url_canon).toSeq.sorted

    val a = Seq(disc("https://a.example/p1", 1000), disc("https://a.example/p2", 2000))
    val b = Seq(disc("https://a.example/p2", 3000), disc("https://a.example/p3", 4000))
    writeFile("a", a)
    writeFile("b", b)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(emitted() == Seq("https://a.example/p1", "https://a.example/p2",
      "https://a.example/p3"))

    // "new driver": duplicates of URLs from BEFORE the stop plus one new —
    // only the new one may come out, i.e. the seen state was recovered
    // from the checkpoint, not rebuilt empty
    writeFile("c", Seq(disc("https://a.example/p1", 5000),
      disc("https://a.example/p3", 6000), disc("https://a.example/p4", 7000)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(emitted() == Seq("https://a.example/p1", "https://a.example/p2",
      "https://a.example/p3", "https://a.example/p4"),
      "restart re-emitted an already-seen URL: state was not recovered")
  }
}
