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
    val rows = out.collect().map(r => r.getString(0) -> r.getString(1))
    out.unpersist(false)
    val m = rows.toMap
    // one row per host, always — duplicate rows are the signature of a
    // premature star-forest stop and must not be collapsed by toMap
    assert(rows.length == m.size,
      s"duplicate host rows: ${rows.length} rows, ${m.size} hosts")
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

  test("zigzag-ordered path: two-center satellites must not stop the " +
      "loop early (round-4 counterexample)") {
    // Path a-e-g-i-b with alphabetic order a<b<e<g<i. One
    // large-star/small-star round yields {(e,a),(g,a),(e,b),(i,b)}:
    // zero centers appear as satellites, yet e points at two centers
    // and the single component is split across labels a and b. The
    // strengthened stop condition must run another round and merge.
    val edges = Seq("a" -> "e", "e" -> "g", "g" -> "i", "b" -> "i")
    val got = engineComponents(edges)
    assert(got.values.toSet == Set("a"),
      s"one component labeled 'a' expected, got $got")
    assert(got == ufComponents(edges))
  }

  test("randomized zigzag paths and caterpillars match union-find") {
    val rnd = new scala.util.Random(20260820L)
    for (trial <- 0 until 6) {
      val n = 12 + rnd.nextInt(30)
      // random labels force arbitrary order along the path; extra leaf
      // hairs create multi-satellite centers
      val labels = rnd.shuffle((0 until n).map(i => f"h${rnd.nextInt(100000)}%05d-$i").toList)
      val path = labels.sliding(2).map { case List(x, y) => x -> y }.toSeq
      val hairs = (0 until n / 3).map { k =>
        labels(rnd.nextInt(n)) -> f"leaf$trial%d-$k%02d"
      }
      val edges = path ++ hairs
      val got = engineComponents(edges)
      val want = ufComponents(edges)
      assert(got == want, s"trial $trial: got=$got want=$want")
    }
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
