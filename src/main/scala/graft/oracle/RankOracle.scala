package graft.oracle

import scala.collection.mutable

/** Sequential reference model for [[graft.queries.GraphOps.hostRank]]:
  * textbook damped PageRank with uniform dangling redistribution and
  * duplicate edges weighted. Deliberately naive (per-edge loop over
  * in-memory maps, no Spark) so it shares nothing with the engine's
  * distributed fold — comparisons are tolerance-based (1e-9), the same
  * contract HostRankSpec and the cluster check use. */
object RankOracle {

  def rank(edges: Seq[(String, String)], iters: Int,
           d: Double): Map[String, Double] = {
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = hosts.size.toDouble
    val outDeg = edges.groupBy(_._1).map { case (h, es) => h -> es.size.toDouble }
    var r = hosts.map(h => h -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = hosts.filterNot(outDeg.contains).map(r).sum
      val in = mutable.Map[String, Double]().withDefaultValue(0.0)
      for ((s, t) <- edges) in(t) += r(s) / outDeg(s)
      r = hosts.map(h => h -> ((1 - d) / n + d * (in(h) + dangling / n))).toMap
    }
    r
  }

  /** keyset equality + per-host 1e-9 closeness; throws with the first
    * offending host on mismatch. */
  def assertClose(got: Map[String, Double], want: Map[String, Double],
                  what: String): Unit = {
    require(got.keySet == want.keySet,
      s"$what: host sets differ (got ${got.size}, want ${want.size})")
    for ((h, v) <- want)
      require(math.abs(got(h) - v) < 1e-9,
        s"$what: rank($h) engine=${got(h)} model=$v")
  }
}
