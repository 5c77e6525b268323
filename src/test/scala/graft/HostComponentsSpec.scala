package graft

import graft.corpus.CorpusGen
import graft.queries.GraphOps

/** GraphOps.hostComponents vs an independent union-find model. String
  * min-label propagation is exact (no float folds), so equality here is
  * exact too — and q46 sits on the ordinary DuckDB hash gate. */
class HostComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference model: plain union-find with path compression; component
    * id = lexicographic min host of each set (the pinned id rule). */
  private def ufComponents(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) parent(find(a)) = find(b)
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val byRoot = hosts.groupBy(find)
    byRoot.values.flatMap { members =>
      val id = members.min
      members.map(_ -> id)
    }.toMap
  }

  private def engineComponents(edges: Seq[(String, String)]): Map[String, String] = {
    val df = edges.toDF("src_host", "dst_host")
    val out = GraphOps.hostComponents(df)
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out.unpersist(false)
    m
  }

  test("hostComponents refuses an empty edge set") {
    spark.catalog.clearCache()
    val empty = Seq.empty[(String, String)].toDF("src_host", "dst_host")
    intercept[IllegalArgumentException] { GraphOps.hostComponents(empty) }
    assert(org.apache.spark.sql.graftinternal.Shim.cacheIsEmpty(spark),
      "the refusal path must release its cache")
  }

  test("hostComponents on a 3-component hand graph: chain, isolated " +
      "self-loop island, directed-only pair (undirected semantics)") {
    val edges = Seq(
      // component 1: a chain only connected tip-to-tip, direction mixed
      "c1" -> "b1", "b1" -> "a1", "c1" -> "d1",
      // component 2: a self-loop island
      "z2" -> "z2",
      // component 3: one directed edge — undirected semantics join both
      "m3" -> "k3")
    val got = engineComponents(edges)
    val want = ufComponents(edges)
    assert(got == want, s"got=$got want=$want")
    assert(got.values.toSet.size == 3)
    assert(got("z2") == "z2" && got("m3") == "k3" && got("d1") == "a1")
  }

  test("hostComponents over the smoke corpus host graph matches " +
      "union-find exactly") {
    spark.catalog.clearCache()
    val d = CorpusGen.ensure(spark, CorpusGen.Smoke)
    val edgesDf = GraphOps.docEdges(spark, d).select("src_host", "dst_host")
    val edges = edgesDf.collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    val got = engineComponents(edges)
    assert(got == ufComponents(edges))
    assert(org.apache.spark.sql.graftinternal.Shim.cacheIsEmpty(spark),
      "hostComponents leaked internal caches")
  }
}
