package graft.urls

/** robots.txt allow/deny decision — Google-style longest-matching-prefix,
  * allow wins ties [PINNED — SURVEY.md §2.8 X6]. Rules are (allow,
  * path_prefix) pairs for one (host, agent); absence of any matching rule
  * means allowed. Shared by the Spark engine (broadcast rule table) and
  * the sequential oracle.
  */
object RobotsMatch {
  /** rules: (allow, pathPrefix). */
  def allows(rules: Iterable[(Boolean, String)], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, prefix) =>
      if (path.startsWith(prefix)) {
        val len = prefix.length
        // longest prefix wins; allow wins length ties [PINNED]
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len
          bestAllow = allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }
}
