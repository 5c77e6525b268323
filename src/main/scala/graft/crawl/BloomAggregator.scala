package graft.crawl

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** A2's UDAF form (SURVEY.md §2.11): fold url hashes into a BloomFilter
  * as a typed `Aggregator[Long, BloomFilter, Array[Byte]]` — usable as
  * `df.groupBy(shard).agg(udaf(new BloomAggregator(...))(col))` or via
  * `.toColumn` on a typed Dataset. SeenSet.addToShards uses the
  * mapGroups form for the engine loop; this form composes with arbitrary
  * DataFrame aggregations (e.g. one bloom per host, per round). */
final class BloomAggregator(expectedItems: Long, fpp: Double)
  extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, h: Long): BloomFilter = { b.putLong(h); b }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization(classOf[BloomFilter])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAggregator {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
