package graft

import graft.queries.GraphOps

/** GraphOps.bfsDistances (q42's loop) vs a sequential BFS model —
  * pinning exhaustion semantics on graphs DEEPER than the former
  * MaxHops=10 cap, which silently truncated distances past it. */
class BfsSpec extends SparkTestBase {
  import spark.implicits._

  private def model(edges: Seq[(String, String)], seeds: Seq[String]): Map[String, Int] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0): _*)
    var frontier = seeds.toSet
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(h => adj.getOrElse(h, Nil))
        .filterNot(dist.contains)
      frontier.foreach(h => dist(h) = d)
    }
    dist.toMap
  }

  private def engine(edges: Seq[(String, String)], seeds: Seq[String]): Map[String, Int] = {
    val e = edges.toDF("src_host", "dst_host").persist()
    val out = GraphOps.bfsDistances(e, seeds.toDF("host"))
    val m = out.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    out.unpersist(false)
    e.unpersist(false)
    m
  }

  test("a 15-hop path is traversed to exhaustion (old 10-hop cap would " +
      "have truncated it)") {
    val hosts = (0 to 15).map(i => f"h$i%02d")
    val edges = hosts.sliding(2).map { case Seq(a, b) => a -> b }.toSeq
    val got = engine(edges, Seq(hosts.head))
    assert(got.size == 16)
    assert(got(hosts.last) == 15, s"tail distance: ${got(hosts.last)}")
    assert(got == model(edges, Seq(hosts.head)))
  }

  test("directed semantics, cycles, unreachable hosts, multiple seeds") {
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "a", // 3-cycle from seed a
      "c" -> "d",                         // branch off the cycle
      "x" -> "y",                         // reachable only from seed x
      "z" -> "a",                         // z reaches a, a does NOT reach z
      "u" -> "v")                         // fully unreachable island
    val seeds = Seq("a", "x")
    val got = engine(edges, seeds)
    val want = model(edges, seeds)
    assert(got == want, s"got=$got want=$want")
    assert(!got.contains("z") && !got.contains("u") && !got.contains("v"))
    assert(got("d") == 3 && got("y") == 1)
  }

  test("randomized DAGs and sparse graphs match the sequential model") {
    val rnd = new scala.util.Random(20260821L)
    for (trial <- 0 until 5) {
      val n = 20 + rnd.nextInt(40)
      val edges = (0 until n * 2).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        f"n$a%03d" -> f"n$b%03d"
      }.distinct
      val seeds = Seq(f"n${rnd.nextInt(n)}%03d")
      val got = engine(edges, seeds)
      val want = model(edges, seeds)
      assert(got == want, s"trial $trial: got=$got want=$want")
    }
  }
}
