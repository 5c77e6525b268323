package graft.streaming

import graft.functions.{bpe_encode_words, nb_lang_scores}
import graft.queries.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming form of the curation accounting ops (the §2.14
  * kernels applied to an unbounded document stream): per micro-batch,
  * the SAME map-only codegen kernels the batch queries use — the repo
  * word grammar, BPE subword counting over the pinned merges fixture,
  * and the NB language model — feed a running per-language token
  * ledger. Because every kernel is a pure per-row function and the
  * ledger is an ordinary streaming aggregation, the streaming results
  * equal the batch queries on the same rows exactly (pinned by
  * CurationStreamSpec), and at cluster scale the only state is the
  * per-language ledger in the state store.
  */
object CurationStream {

  /** Per-document token accounting + predicted language — the
    * streaming twin of q20/q58's columns. Map-only: safe on a
    * streaming frame with no watermark needed. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val scored = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        size(bpe_encode_words(col("ws"))).as("n_bpe"),
        nb_lang_scores(col("ws")).as("sc"))
    scored.select(col("doc_id"), col("n_words"), col("n_bpe"),
      TextOps.nbArgmax(element_at(col("sc"), 1), element_at(col("sc"), 2),
        element_at(col("sc"), 3), element_at(col("sc"), 4)).as("lang"))
  }

  /** Running per-language ledger (docs + BPE tokens) — what a
    * training-data intake pipeline watches while a crawl streams in. */
  def langLedger(docs: DataFrame): DataFrame =
    tokenStats(docs)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("n_bpe_tokens"))
}
