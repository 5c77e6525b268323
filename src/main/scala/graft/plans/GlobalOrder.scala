package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable deterministic global sequence numbers.
  *
  * `orderBy + row_number over ()` collapses to ONE partition — fine at test
  * scale, a non-starter on a 1000-executor cluster. This helper assigns the
  * identical total-order ranks with no single-partition stage:
  * range-repartition on the sort key, rank within each partition in
  * parallel, then add per-partition offsets (a tiny collected count map).
  *
  * The sort key list MUST end in a unique column (the engine always ends
  * in `url_hash` — SURVEY.md §2.6 [PINNED]) so the total order, and hence
  * every seq value, is independent of partition boundaries.
  */
object GlobalOrder {

  def withSeq(df: DataFrame, sortCols: Seq[Column], seqCol: String, offset: Long = 0L): DataFrame = {
    val P = df.sparkSession.sessionState.conf.numShufflePartitions
    // Deterministic on recompute: RangePartitioner samples with a seed
    // derived from the partition index, and the final seq values depend
    // only on the total order (unique tail key), not on boundaries.
    val ranged2 = df.repartitionByRange(P, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val counts = ranged2.groupBy($(ranged2, "__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // partitions produced by range partitioning are ordered by key range
    val pids = counts.keys.toSeq.sorted
    val offsets = pids.scanLeft(offset) { case (acc, pid) => acc + counts(pid) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = pids.zip(offsets).toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    ranged2
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(seqCol, col("__rn") + col("__offset"))
      .drop("__pid", "__rn", "__offset")
  }

  private def $(df: DataFrame, name: String): Column = df.col(name)
}
