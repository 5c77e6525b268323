package graft.oracle

import graft.crawl.CrawlEngine

/** Shared engine-vs-sequential-oracle equality assertions for the
  * fault/cluster evidence harnesses ([[graft.FaultCheck]] and every
  * [[graft.ClusterCheck]] mode). Each harness used to carry its own
  * verbatim copy of the fetch-log tuple mapping + diff-reporting block;
  * the fetch-log schema changed in round 4 (dedup key, seq assignment)
  * and a missed copy would silently weaken one mode's equivalence check
  * (review finding) — so the comparison lives HERE, once. */
object OracleAssert {

  /** One fetch-log row, all 10 columns, in schema order. */
  type LogRow =
    (Long, String, Long, String, Int, Int, Int, Long, String, String)

  /** The engine's full fetch log as comparable tuples in seq order. */
  def fetchLogRows(engine: CrawlEngine): Vector[LogRow] =
    engine.fetchLog()
      .select("seq", "url_canon", "url_hash", "host", "depth", "round", "rn",
        "fetch_ts", "status", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7), r.getString(8), r.getString(9)))
      .sortBy(_._1).toVector

  /** The engine's seen set as url_hash -> (url_canon, first_round). */
  def collectSeen(engine: CrawlEngine): Map[Long, (String, Int)] =
    engine.seen().collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap

  /** Assert the engine's fetch log and seen set are byte-identical to
    * the sequential oracle's; `tag` prefixes the failure message (e.g.
    * "after executor kill"). Returns (fetched, seen) counts for the
    * caller's OK line. */
  def assertMatches(engine: CrawlEngine, want: OracleResult,
                    tag: String): (Int, Int) = {
    val got = fetchLogRows(engine)
    val wantLog = want.log.map(f => (f.seq, f.urlCanon, f.urlHash, f.host, f.depth,
      f.round, f.rn, f.fetchTs, f.status, f.docId))
    require(got == wantLog,
      s"$tag: fetch log mismatch: got=${got.size} want=${wantLog.size} rows; " +
        "first diff: " +
        got.zip(wantLog).find { case (g, w) => g != w }.map(_.toString).getOrElse("size"))
    val gotSeen = collectSeen(engine)
    require(gotSeen == want.seen,
      s"$tag: seen-set mismatch: got=${gotSeen.size} want=${want.seen.size}")
    (got.size, gotSeen.size)
  }
}
