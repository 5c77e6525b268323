package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming form of the frontier pipeline (SURVEY.md §2.10):
  * the batch-iterative crawl is the reference semantics, but when link
  * discoveries arrive as an unbounded stream the same operators map to:
  *
  *  - seen-set dedup → `flatMapGroupsWithState` keyed by
  *    `pmod(url_hash, P)` shard, each shard holding its exact hash set
  *    (the streaming twin of SeenSet's bloom+exact tiers);
  *  - fetch-rate metrics → watermarked sliding-window counts per host.
  *
  * Used with MemoryStream in tests and file streams in production; at
  * cluster scale state lives in the state store (RocksDB provider),
  * partitioned by the same shard key as the batch engine.
  */
object FrontierStream {

  final case class Discovery(url_canon: String, url_hash: Long, host: String,
    depth: Int, event_ts: java.sql.Timestamp)
  final case class ShardState(hashes: Set[Long])
  final case class NewUrl(url_canon: String, url_hash: Long, host: String, depth: Int)

  /** Streaming seen-set dedup: emits each url_hash exactly once across
    * the whole stream (first occurrence wins, per-shard state). */
  def dedupStream(spark: SparkSession, discoveries: Dataset[Discovery], shards: Int): Dataset[NewUrl] = {
    import spark.implicits._
    discoveries
      .groupByKey(d => (((d.url_hash % shards) + shards) % shards).toInt)
      .flatMapGroupsWithState[ShardState, NewUrl](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[Discovery], state: GroupState[ShardState]) =>
          var seen = state.getOption.map(_.hashes).getOrElse(Set.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer.empty[NewUrl]
          rows.foreach { d =>
            if (!seen.contains(d.url_hash)) {
              seen += d.url_hash
              out += NewUrl(d.url_canon, d.url_hash, d.host, d.depth)
            }
          }
          state.update(ShardState(seen))
          out.iterator
      }
  }

  /** Watermarked per-host discovery rate over 10-second windows —
    * the streaming metrics sink (S5). */
  def hostRates(discoveries: Dataset[Discovery]): DataFrame =
    discoveries.toDF()
      .withWatermark("event_ts", "30 seconds")
      .groupBy(window(col("event_ts"), "10 seconds"), col("host"))
      .agg(count(lit(1)).as("n_discovered"),
        approx_count_distinct(col("url_hash")).as("approx_unique"))
}
