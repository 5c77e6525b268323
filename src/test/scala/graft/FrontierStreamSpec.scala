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
}
