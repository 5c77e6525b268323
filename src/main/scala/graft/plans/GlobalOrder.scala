package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable deterministic global sequence numbers.
  *
  * `orderBy + row_number over ()` collapses to ONE partition — fine at test
  * scale, a non-starter on a 1000-executor cluster. This helper assigns the
  * identical total-order ranks with no single-partition pass over the data:
  * range-repartition on the sort key, sort within partitions, decompose
  * `monotonically_increasing_id` into (partition, local index), and add
  * per-partition offsets computed IN THE SAME PLAN from a tiny P-row
  * aggregate (broadcast back).
  *
  * The sort key list MUST end in a unique column (the engine always ends
  * in `url_hash` — SURVEY.md §2.6 [PINNED]) so the total order, and hence
  * every seq value, is independent of partition boundaries.
  *
  * Determinism: RangePartitioner boundaries come from a sample whose seed
  * varies per execution, so ANY design that runs the counts pass and the
  * rank pass as separate executions can pair offsets from one boundary
  * set with ranks from another (round-1 bug; a cache-pinning fix survived
  * only under AQE). Here both passes live in ONE plan sharing ONE range
  * exchange (Spark's ReuseExchange dedupes the identical subtree), so the
  * offsets and local indices always describe the same layout — and since
  * the tail key is unique, the seq VALUES are the same under any layout,
  * making separate executions (e.g. Verify's write vs Bench's count)
  * agree too. The single-partition window runs over P rows (partition
  * counts), not data.
  */
object GlobalOrder {

  private val MidBits = 33 // monotonically_increasing_id = pid << 33 | local index

  def withSeq(df: DataFrame, sortCols: Seq[Column], seqCol: String, offset: Long = 0L): DataFrame = {
    val P = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(P, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), MidBits))
      .withColumn("__idx", col("__mid").bitwiseAND(lit((1L << MidBits) - 1)))
    // partitions produced by range partitioning are ordered by key range;
    // cumulative counts over ≤P rows → per-partition start offsets
    val w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid").count()
      .withColumn("__offset", coalesce(sum("count").over(w), lit(0L)))
      .select(col("__pid"), col("__offset"))
    ranged.join(broadcast(offsets), Seq("__pid"))
      // ref_long, not lit: `offset` changes every crawl round and a plain
      // literal would defeat the whole-stage codegen cache (see RefLiteral)
      .withColumn(seqCol, col("__idx") + col("__offset") + graft.functions.ref_long(offset) + 1L)
      .drop("__pid", "__mid", "__idx", "__offset")
  }
}
