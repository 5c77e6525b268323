package graft

import graft.corpus.LangCorpus
import graft.streaming.CurationStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming curation accounting ≡ the batch kernels on the same rows:
  * token stats stream in Append mode, the per-language ledger holds a
  * running aggregate in Complete mode, and both match a batch
  * computation over everything fed so far. */
class CurationStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val docs: Seq[(Long, String)] =
    LangCorpus.docs.take(40).map(d => (d._1, d._3)) ++
      Seq((9001L, "zz9 extra tail words"), (9002L, "the quick brown fox"))

  test("streaming token stats equal the batch kernels row-for-row " +
      "across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = CurationStream.tokenStats(input.toDF().toDF("doc_id", "text"))
    val query = out.writeStream
      .format("memory").queryName("curation_stats")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val (b1, b2) = docs.splitAt(17)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("curation_stats")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
      val want = CurationStream.tokenStats(docs.toDF("doc_id", "text"))
        .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
      assert(got == want)
      assert(got.nonEmpty && got.forall(r => r._3 >= r._2), // BPE >= words
        "subword count must be at least the word count")
    } finally query.stop()
  }

  test("running per-language ledger equals the batch aggregate after " +
      "every batch boundary") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ledger = CurationStream.langLedger(input.toDF().toDF("doc_id", "text"))
    val query = ledger.writeStream
      .format("memory").queryName("curation_ledger")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      val (b1, b2) = docs.splitAt(25)
      def batchLedger(rows: Seq[(Long, String)]) =
        CurationStream.langLedger(rows.toDF("doc_id", "text"))
          .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      input.addData(b1: _*)
      query.processAllAvailable()
      assert(spark.table("curation_ledger").as[(String, Long, Long)]
        .collect().sortBy(_._1).toSeq == batchLedger(b1))
      input.addData(b2: _*)
      query.processAllAvailable()
      assert(spark.table("curation_ledger").as[(String, Long, Long)]
        .collect().sortBy(_._1).toSeq == batchLedger(docs))
    } finally query.stop()
  }
}
