package graft

import graft.corpus.CorpusGen
import graft.queries.GraphOps
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** GraphOps.hostRank vs an independent sequential PageRank model.
  * Distributed double summation has no pinned fold order, so equality is
  * to 1e-9 tolerance, not bit-exact (the reason hostRank is a library
  * API + spec rather than a DuckDB-hash-gated driver query). */
class HostRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference model: textbook damped PageRank with uniform dangling
    * redistribution, duplicate edges weighted. */
  private def seqRank(edges: Seq[(String, String)], iters: Int,
                      d: Double): Map[String, Double] = {
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = hosts.size.toDouble
    val outDeg = edges.groupBy(_._1).map { case (h, es) => h -> es.size.toDouble }
    var rank = hosts.map(h => h -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = hosts.filterNot(outDeg.contains).map(rank).sum
      val in = mutable.Map[String, Double]().withDefaultValue(0.0)
      for ((s, t) <- edges) in(t) += rank(s) / outDeg(s)
      rank = hosts.map(h => h -> ((1 - d) / n + d * (in(h) + dangling / n))).toMap
    }
    rank
  }

  private def engineRank(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val df = edges.toDF("src_host", "dst_host")
    val out = GraphOps.hostRank(df, iters)
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.unpersist(false)
    m
  }

  private def assertClose(a: Map[String, Double], b: Map[String, Double]): Unit = {
    assert(a.keySet == b.keySet, s"host sets differ: ${a.keySet} vs ${b.keySet}")
    for ((h, v) <- b)
      assert(math.abs(a(h) - v) < 1e-9, s"rank($h): engine=${a(h)} model=$v")
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
    assertClose(eng, seqRank(edges, 12, 0.85))
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
    val model = seqRank(edges, 10, 0.85)
    assertClose(eng, model)
    val top = eng.maxBy(_._2)._1
    assert(top == model.maxBy(_._2)._1)
    assert(org.apache.spark.sql.graftinternal.Shim.cacheIsEmpty(spark), "hostRank leaked internal caches")
  }
}
