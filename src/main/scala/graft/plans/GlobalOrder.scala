package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Scalable deterministic global sequence numbers.
  *
  * `orderBy + row_number over ()` collapses to ONE partition — fine at test
  * scale, a non-starter on a 1000-executor cluster. This helper assigns the
  * identical total-order ranks with no single-partition stage:
  * range-repartition on the sort key, rank within each partition in
  * parallel (narrow sort + mapPartitions), then add per-partition offsets
  * (a tiny collected count map).
  *
  * The sort key list MUST end in a unique column (the engine always ends
  * in `url_hash` — SURVEY.md §2.6 [PINNED]) so the total order, and hence
  * every seq value, is independent of partition boundaries.
  *
  * Determinism: RangePartitioner boundaries come from a sample whose seed
  * varies per execution, so running the counts job and the final job
  * against the same LAZY plan could use DIFFERENT boundaries once
  * partitions exceed the sample size — offsets from job 1 would then
  * mismatch ranks in job 2 (duplicate/skipped seq values). The ranged
  * layout is therefore persisted and eagerly materialized by the counts
  * job; every later job reads the pinned blocks (MEMORY_AND_DISK spills
  * rather than evicts, so the layout survives memory pressure; block loss
  * from executor death re-reads the retained shuffle output, which keeps
  * the boundaries). The final rank pass is `sortWithinPartitions +
  * mapPartitions` — a window over the partition id would re-shuffle the
  * full dataset a second time.
  */
object GlobalOrder {

  /** `rows` is the exact input row count (free — the counts job already
    * ran); `cleanup` unpersists the pinned ranged layout — call it once
    * the result has been materialized (written or persisted) to bound
    * cache growth in iterative callers. */
  final case class SeqResult(df: DataFrame, rows: Long, cleanup: () => Unit)

  /** As [[withSeq]], returning the row count and a cleanup thunk. */
  def withSeqHandle(df: DataFrame, sortCols: Seq[Column], seqCol: String,
                    offset: Long = 0L): SeqResult = {
    val spark = df.sparkSession
    val P = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(P, sortCols: _*).persist(StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // partitions produced by range partitioning are ordered by key range
    val pids = counts.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(offset) { case (acc, pid) => acc + counts(pid) }).toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = ranged.schema.add(seqCol, LongType, nullable = false)
    val out = ranged.sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        var seq = bc.value.getOrElse(TaskContext.getPartitionId(), 0L)
        it.map { r => seq += 1L; Row.fromSeq(r.toSeq :+ seq) }
      }(Encoders.row(outSchema))
    SeqResult(out, counts.values.sum, () => { ranged.unpersist(false); () })
  }

  /** One-shot form for single-use queries; the pinned layout stays cached
    * for the session (use [[withSeqHandle]] in iterative callers). */
  def withSeq(df: DataFrame, sortCols: Seq[Column], seqCol: String, offset: Long = 0L): DataFrame =
    withSeqHandle(df, sortCols, seqCol, offset).df
}
