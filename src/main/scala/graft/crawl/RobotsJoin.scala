package graft.crawl

import graft.functions.path_of
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P4/J2's web-scale alternative: the robots filter as a pure Dataset
  * join, for corpora whose rule table does not fit the task-serialized
  * [[RobotsIndex]] (10^7–10^8 hosts ⇒ rules are executor-memory-scale,
  * not broadcast-scale).
  *
  * Semantics are the same [PINNED] Google-style longest-prefix match as
  * graft.urls.RobotsMatch (allow wins prefix-length ties; hosts with no
  * rules are allowed) — a crawl-equality test asserts the two paths
  * produce identical crawls. Cost relative to the broadcast expression:
  * one shuffle of the frontier per round (the rules join + per-URL
  * argmax), which is why the broadcast path stays the default below the
  * memory threshold.
  */
object RobotsJoin {

  /** `frontier`: (url_canon, url_hash, host, depth, ...);
    * `rules`: (host, allow, path_prefix). Returns the allowed subset of
    * `frontier` with its original columns AND original row multiplicity:
    * the verdict is aggregated per url_hash (the frontier's unique key,
    * so the agg is correct regardless of duplicates) and semi-joined
    * back — round 2 grouped by all frontier columns, which silently
    * deduplicated identical rows, diverging from the broadcast
    * RobotsAllows path if a duplicate ever reached the frontier
    * (review finding). */
  def filterAllowed(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val r = rules.select(col("host"), col("allow").as("__r_allow"),
      col("path_prefix").as("__r_prefix"))
    // best matching rule per URL: max (prefix length, allow) — longest
    // prefix wins, allow beats disallow on equal length (true > false)
    val allowedKeys = frontier
      .select(col("url_hash"), col("host"), path_of(col("url_canon")).as("__path"))
      .dropDuplicates("url_hash")
      .join(r, Seq("host"), "left")
      .withColumn("__m",
        col("__r_prefix").isNotNull && col("__path").startsWith(col("__r_prefix")))
      .groupBy(col("url_hash"))
      .agg(max(when(col("__m"),
        struct(length(col("__r_prefix")).as("len"), col("__r_allow").as("allow")))).as("__best"))
      .filter(col("__best").isNull || col("__best.allow"))
      .select("url_hash")
    frontier.join(allowedKeys, Seq("url_hash"), "left_semi")
  }
}
