package graft

import graft.corpus.CorpusGen
import graft.oracle.RankOracle
import graft.queries.GraphOps
import org.apache.spark.sql.functions.col

/** GraphOps.hostRank vs the independent sequential PageRank model
  * (graft.oracle.RankOracle). Distributed double summation has no pinned
  * fold order, so equality is to 1e-9 tolerance, not bit-exact — q45
  * additionally gates the 6-decimal rounding against an independent
  * DuckDB PageRank. */
class HostRankSpec extends SparkTestBase {
  import spark.implicits._

  private def engineRank(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val df = edges.toDF("src_host", "dst_host")
    val out = GraphOps.hostRank(df, iters)
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.unpersist(false)
    m
  }

  test("hostRank refuses an empty edge set (1/n would be Infinity)") {
    spark.catalog.clearCache() // session-shared suite; assert only OUR hygiene
    val empty = Seq.empty[(String, String)].toDF("src_host", "dst_host")
    intercept[IllegalArgumentException] { GraphOps.hostRank(empty, 3) }
    assert(org.apache.spark.sql.graftinternal.Shim.cacheIsEmpty(spark),
      "the refusal path must release its cache")
  }

  test("hostRank matches the sequential model on a hand graph with " +
      "dangling node, weighted duplicate edge and self-loop") {
    val edges = Seq(
      "a" -> "b", "a" -> "b", // weighted duplicate
      "a" -> "c",
      "b" -> "c",
      "c" -> "a",
      "c" -> "c",             // self-loop
      "b" -> "d")             // d is dangling (no out-edges)
    val eng = engineRank(edges, 12)
    RankOracle.assertClose(eng, RankOracle.rank(edges, 12, 0.85), "hand graph")
    assert(math.abs(eng.values.sum - 1.0) < 1e-9, s"ranks must sum to 1: $eng")
  }

  test("hostRank over the smoke corpus host graph matches the model; " +
      "the Zipf-hot host ranks first") {
    // cacheIsEmpty is session-global and the suite shares one session —
    // start from a clean slate so the final assert sees only hostRank's
    // own hygiene, not an earlier suite's long-lived cache
    spark.catalog.clearCache()
    val d = CorpusGen.ensure(spark, CorpusGen.Smoke)
    val edgesDf = GraphOps.docEdges(spark, d).select("src_host", "dst_host")
    val edges = edgesDf.collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    val eng = engineRank(edges, 10)
    val model = RankOracle.rank(edges, 10, 0.85)
    RankOracle.assertClose(eng, model, "smoke host graph")
    assert(eng.maxBy(_._2)._1 == model.maxBy(_._2)._1)
    assert(org.apache.spark.sql.graftinternal.Shim.cacheIsEmpty(spark), "hostRank leaked internal caches")
  }
}
