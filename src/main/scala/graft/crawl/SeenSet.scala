package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

/** The URL-seen set (BASELINE.json:6): "partitioned bloom/cuckoo URL-seen
  * set as broadcast + per-partition shards", with the exact Dataset of
  * url_hash as the authoritative tier (final equality to the oracle must
  * be exact — BASELINE.json:14; the bloom is only a prefilter).
  *
  * Shard i holds the hashes with `pmod(url_hash, P) == i`. A candidate
  * whose shard says "not contained" is DEFINITELY new (blooms have no
  * false negatives) and skips the anti-join entirely; only the ~1%
  * maybe-seen remainder joins the exact set. At 10^10-URL scale that
  * turns an 80 GB shuffle join into a broadcast probe + a 1%-sized join
  * (SURVEY.md §4 sizing).
  */
final class BloomShards(val P: Int, val filters: Array[BloomFilter]) extends Serializable {
  def shardOf(h: Long): Int = (((h % P) + P) % P).toInt
  def mightContain(h: Long): Boolean = filters(shardOf(h)).mightContainLong(h)

  def put(h: Long): Unit = filters(shardOf(h)).putLong(h)

  /** In-place merge of partial shard blobs built by executors. */
  def mergeBlob(pid: Int, blob: Array[Byte]): Unit = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(blob))
    filters(pid).mergeInPlace(bf)
  }

  def writeTo(path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.writeInt(P)
      filters.foreach { f =>
        val bos = new ByteArrayOutputStream()
        f.writeTo(bos)
        val bytes = bos.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    } finally out.close()
  }
}

object BloomShards {
  def empty(P: Int, capacityPerShard: Long, fpp: Double): BloomShards =
    new BloomShards(P, Array.fill(P)(BloomFilter.create(capacityPerShard, fpp)))

  def readFrom(path: String): BloomShards = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    try {
      val p = in.readInt()
      val filters = Array.fill(p) {
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      }
      new BloomShards(p, filters)
    } finally in.close()
  }
}

object SeenSet {

  /** Build partial per-shard blooms for `hashes` (a single-column
    * DataFrame of url_hash) on the executors, merge into `target` on the
    * driver. One shuffle keyed by shard id; bloom build streams the
    * iterator (O(shard bytes) memory). Returns per-shard row counts —
    * exactly the per-partition lineage the snapshot manifest records, so
    * the engine needs no separate counting job. */
  def addToShards(spark: SparkSession, hashes: DataFrame, target: BloomShards,
                  capacityPerShard: Long, fpp: Double): Seq[Long] = {
    import spark.implicits._
    val p = target.P
    val partials = hashes.select(col("url_hash"))
      .as[Long]
      .groupByKey(h => (((h % p) + p) % p).toInt)
      .mapGroups { (pid, it) =>
        val bf = BloomFilter.create(capacityPerShard, fpp)
        var n = 0L
        it.foreach { h => bf.putLong(h); n += 1 }
        val bos = new ByteArrayOutputStream()
        bf.writeTo(bos)
        (pid, bos.toByteArray, n)
      }
      .collect()
    partials.foreach { case (pid, blob, _) => target.mergeBlob(pid, blob) }
    val byPid = partials.map(t => t._1 -> t._3).toMap
    (0 until p).map(i => byPid.getOrElse(i, 0L))
  }

  /** J1 two-phase dedup: rows of `cand` whose url_hash is NOT in the seen
    * set. Bloom-negative rows bypass the join (no false negatives);
    * bloom-positive rows are exactly anti-joined against `seen`. */
  def newUrls(spark: SparkSession, cand: DataFrame, seen: DataFrame,
              blooms: Option[BloomShards]): DataFrame = {
    blooms match {
      case Some(b) =>
        val bc = spark.sparkContext.broadcast(b)
        val might = udf((h: Long) => bc.value.mightContain(h))
        val tagged = cand.withColumn("__maybe", might(col("url_hash"))).persist()
        val definitelyNew = tagged.filter(!col("__maybe")).drop("__maybe")
        val maybeSeen = tagged.filter(col("__maybe")).drop("__maybe")
          .join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
        definitelyNew.unionByName(maybeSeen)
      case None =>
        cand.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
    }
  }
}
