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
  * only under AQE). Round 2 put both passes in one PLAN and relied on
  * ReuseExchange deduping the shared range exchange. Round-3 review
  * showed that was doubly wrong:
  *  - even when ReuseExchange DOES fire, a CollectMetrics below withSeq
  *    still fires once per consuming branch (probe: an Observation
  *    counted 120 000 on 60 000 rows with ReusedExchange present in the
  *    plan) — the engine's committed diag manifests show the derived
  *    carried counts negative every round from exactly this;
  *  - ReuseExchange is a best-effort physical rule with no contract:
  *    per-branch column pruning can leave two physically different
  *    subtrees and TWO independent RangePartitioners (the documented
  *    Scheduler.salted case), whose samplers draw with different seeds
  *    once input partitions exceed the ~300-row reservoir — the two
  *    layouts can then disagree and the offsets no longer describe the
  *    rank branch's partitions: silently wrong (and possibly colliding)
  *    seq. Test scale never exercises this: below the reservoir the
  *    "sample" is the whole partition and boundaries are data-determined.
  *
  * The fix both branches now share is PHYSICAL, not best-effort: the
  * post-exchange data is persisted, so one exchange instance (one
  * RangePartitioner, one boundary set, one upstream execution) feeds the
  * rank branch, the offsets branch, and — bonus — everything upstream of
  * the exchange (robots filter, politeness window) runs once instead of
  * twice. Callers MUST invoke the returned cleanup once the seq output
  * has been consumed. The single-partition window runs over P rows
  * (partition counts), not data.
  */
object GlobalOrder {

  private val MidBits = 33 // monotonically_increasing_id = pid << 33 | local index

  /** Seq assignment with the shared-layout cache; returns (result,
    * cleanup). The cleanup unpersists the pinned exchange output — call
    * it after the consuming action (the engine folds it into its
    * round-end unpersists; one-shot queries materialize, clean up, and
    * return the materialized frame). */
  def withSeqCached(df: DataFrame, sortCols: Seq[Column], seqCol: String,
                    offset: Long = 0L): (DataFrame, () => Unit) = {
    val P = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(P, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), MidBits))
      .withColumn("__idx", col("__mid").bitwiseAND(lit((1L << MidBits) - 1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // partitions produced by range partitioning are ordered by key range;
    // cumulative counts over ≤P rows → per-partition start offsets
    val w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid").count()
      .withColumn("__offset", coalesce(sum("count").over(w), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val out = ranged.join(broadcast(offsets), Seq("__pid"))
      // ref_long, not lit: `offset` changes every crawl round and a plain
      // literal would defeat the whole-stage codegen cache (see RefLiteral)
      .withColumn(seqCol, col("__idx") + col("__offset") + graft.functions.ref_long(offset) + 1L)
      .drop("__pid", "__mid", "__idx", "__offset")
    (out, () => { ranged.unpersist(); () })
  }

  /** One-shot form: materializes the seq output, releases the layout
    * cache, and returns the (persisted) result — for callers without a
    * round lifecycle. The seq values must be pinned: recomputing after
    * the layout cache is gone could draw different range boundaries
    * (why a localCheckpoint won't do: its ExistingRDD scan violates the
    * input_hint's no-RDD-in-plans contract, PlanShapeSpec). OWNERSHIP
    * TRANSFERS to the caller: release the RETURNED frame itself with
    * `unpersist()` once consumed. If you need transforms on top of the
    * result, use [[withSeqCached]] and persist your own final frame
    * instead (unpersist only releases an exact plan match — a wrapper
    * frame's unpersist would miss this one; see CrawlOps q06). */
  def withSeq(df: DataFrame, sortCols: Seq[Column], seqCol: String, offset: Long = 0L): DataFrame = {
    val (out, cleanup) = withSeqCached(df, sortCols, seqCol, offset)
    val mat = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mat.count()
    cleanup()
    mat
  }
}
