package graft

import org.apache.spark.sql.functions._

/** Smoke-tier execution of every SparkEntry query (guards graft.Verify:
  * a query that throws or returns garbage fails here first). */
class QueriesSpec extends SparkTestBase {

  val dir = "/root/testdata/sf0.001"

  // queries that may legitimately return few/zero rows at smoke tier
  val mayBeSmall: Set[String] = Set("q14_antijoin_customers", "q25_lsh_pairs", "q29_ann_lsh")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      spark.catalog.clearCache() // isolate: attribute any leak to THIS query
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeSmall(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
      // no-leaked-cache contract, as a RED TEST rather than the bench
      // gate's warn-and-clear (the round-3 q25 leak shipped because the
      // gate only warned — review finding). Convention: a query MAY
      // return a persisted frame (results whose recompute would be
      // nondeterministic or pathological are materialized; ownership
      // transfers to the caller) — but every INTERNAL cache must be
      // released before returning.
      df.unpersist(false)
      assert(org.apache.spark.sql.graftinternal.Shim.cacheIsEmpty(spark),
        s"$name leaked cached data (internal persist without unpersist)")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, missing.toString)
  }

  test("crawl partitions are data-sized: tiny tiers shrink, bench tier keeps session parallelism") {
    import graft.corpus.CorpusGen
    import graft.queries.CrawlOps.crawlConfigFor
    // smoke/correctness rounds are ~50-500 URLs — 32 tasks per stage is
    // pure dispatch overhead (measured: smoke q09 35.2 -> 19.6 s at c32)
    assert(crawlConfigFor(32, CorpusGen.Smoke).partitions == 8)
    assert(crawlConfigFor(32, CorpusGen.Correctness).partitions == 8)
    // the bench tier (500k docs) must NOT shrink below the session's
    // parallelism — the driver's q09 scoreboard runs on this config
    assert(crawlConfigFor(32, CorpusGen.Bench).partitions == 32)
    assert(crawlConfigFor(8, CorpusGen.Bench).partitions == 8)
    // never above the session's parallelism either
    assert(crawlConfigFor(2, CorpusGen.Smoke).partitions == 2)
  }

  test("q55 packing output is invariant to the prefix-sum bucket width (the scale knob)") {
    import graft.queries.TextOps
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_tok"))
    val a = TextOps.seqPacking(d, 64L).collect().toSeq
    val b = TextOps.seqPacking(d, 7L).collect().toSeq
    val c = TextOps.seqPacking(d, 100000L).collect().toSeq // one bucket: plain cumsum
    assert(a == b && a == c, "seq packing changed with the bucket width")
    assert(a.nonEmpty)
  }

  test("exact-dup pairs all surface in q25 LSH output") {
    import spark.implicits._
    val pairs = SparkEntry.queries("q25_lsh_pairs")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect()
    val expected = docs.filter(_ % 10 == 0).map(d => (d, d + 1000000L)).toSet
    val missing = expected -- pairs
    assert(missing.isEmpty, s"exact dups missed by LSH: ${missing.take(5)}")
  }

  test("minhash: identical texts get identical signatures") {
    import spark.implicits._
    val sigs = SparkEntry.queries("q24_minhash")(spark, dir)
      .as[(Long, String)].collect().toMap
    sigs.keys.filter(k => k >= 1000000L && k < 2000000L).foreach { dup =>
      assert(sigs(dup) == sigs(dup - 1000000L), s"dup $dup signature differs")
    }
  }
}
