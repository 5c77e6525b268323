package graft.queries

import graft.corpus.CorpusGen
import graft.functions.{extract_urls, host_of, ref_int}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Host-graph analytics over the corpus link structure — the crawl
  * planner's view of the web: which hosts link to which (the weighted
  * adjacency q41), and how far every host sits from the seed set (the
  * BFS hop distance q42 — the static analogue of the crawl's own
  * frontier expansion, and the standard input to crawl prioritization
  * and seed-coverage auditing).
  *
  * Link grammar for BOTH queries [PINNED, mirrored in the DuckDB
  * oracles]: every link the engine's own extraction kernel finds in a
  * TEXT span (`extract_urls` — absolute `https?://` matches plus href
  * attribute values, document order, trailing `[.,;)]` stripped). An
  * absolute link's target host comes from `host_of`; a RELATIVE href
  * resolves against its own page, so it contributes a self-edge
  * (dst = src host). The oracle reconstructs both classes with two
  * regexes (absolute matches; href captures filtered to non-absolute);
  * host extraction mirrors `host_of` with the same corpus-shape caveat
  * as q38 (plain hosts — no port/userinfo).
  *
  * Scale shape: the doc→host attach is an equi-join on doc_id; edges
  * aggregate by (src_host, dst_host) with map-side partials — at web
  * scale a host graph is ~10^7 rows from 10^10 pages, so everything
  * downstream of the first groupBy is small-data. The BFS loop is
  * per-level equi-joins + anti-joins (no driver-side adjacency, no
  * collect); each level persists only until the result materializes.
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  private val FX = CorpusGen.dirFor(CorpusGen.Correctness)
  private def fx(s: SparkSession, dir: String): String = CorpusGen.ensureFor(s, dir)

  /** Max BFS depth [PINNED — matches the crawl's maxDepth tier]. */
  private val MaxHops = 10

  /** (doc_id, src_host, dst_host) for every link in a text span —
    * relative refs (host_of = "") become self-edges on the page's own
    * host. */
  private def docEdges(s: SparkSession, d: String): DataFrame = {
    val docHost = CorpusGen.hosting(s, d).select(col("doc_id"), col("host").as("src_host"))
    CorpusGen.interleaved(s, d)
      .select(col("doc_id"), explode(col("spans")).as("sp"))
      .filter(col("sp.kind") === "text")
      .select(col("doc_id"), explode(extract_urls(col("sp.text"))).as("u"))
      .join(docHost, Seq("doc_id"))
      .select(col("doc_id"), col("src_host"),
        when(host_of(col("u")) === "", col("src_host"))
          .otherwise(host_of(col("u"))).as("dst_host"))
  }

  val queries: Map[String, Q] = Map(

    // weighted host adjacency: how many links host A's pages carry to
    // host B (self-loops included — intra-host nav is real crawl load)
    "q41_host_graph" -> ((s, dir) => {
      docEdges(s, fx(s, dir))
        .groupBy("src_host", "dst_host")
        .agg(count(lit(1)).as("n_links"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("src_host", "dst_host")
    }),

    // BFS hop distance from the seed hosts over the (deduped) host
    // edge set: per-level distributed expansion — join the frontier to
    // the edges, anti-join out already-reached hosts, stop when a level
    // comes back empty or MaxHops is hit. Unreachable hosts are absent
    // (mirroring the recursive oracle). Each level is cached only until
    // the final result materializes; the returned frame stays persisted
    // (ownership transfers to the caller, the q25 contract).
    "q42_host_distance" -> ((s, dir) => {
      val d = fx(s, dir)
      val edges = docEdges(s, d)
        .select("src_host", "dst_host").distinct()
        .persist()
      val seedHosts = CorpusGen.seeds(s, d)
        .select(host_of(col("url_canon")).as("host")).distinct()

      var dist = seedHosts.withColumn("dist", lit(0))
      var frontier = dist.select("host")
      val cached = scala.collection.mutable.ArrayBuffer[DataFrame](edges)
      var hop = 0
      var done = false
      while (hop < MaxHops && !done) {
        hop += 1
        val next = frontier
          .join(edges, frontier("host") === edges("src_host"))
          .select(col("dst_host").as("host")).distinct()
          .join(dist, Seq("host"), "left_anti")
          .withColumn("dist", ref_int(hop))
          .persist()
        if (next.count() == 0) { next.unpersist(false); done = true }
        else {
          cached += next
          dist = dist.unionByName(next)
          frontier = next.select("host")
        }
      }
      val out = dist.select("host", "dist").orderBy("host").persist()
      out.count() // materialize before releasing the per-level caches
      cached.foreach(_.unpersist(false))
      out
    }),
  )

  /** CTE chain ending in ed(doc_id, src_host, dst_host) — the oracle's
    * reconstruction of docEdges: absolute matches (the kernel's Abs
    * grammar incl. the trailing-punct strip) plus href captures that are
    * NOT absolute (the kernel's relative refs, which the engine maps to
    * self-edges via the empty-host rule, mirrored by the COALESCE). */
  private val edgesSqlCte: String =
    s"""sp AS (SELECT doc_id, unnest(spans, recursive := true)
       |  FROM read_parquet('$FX/interleaved.parquet/*.parquet')),
       |labs AS (SELECT doc_id,
       |    regexp_extract(regexp_replace(u, '[.,;)]+$$', ''), '^(?i)https?://([^/:?]+)', 1) AS dst_host
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?i)\\bhttps?://[^\\s"''<>]+')) AS u
       |        FROM sp WHERE kind = 'text')),
       |lrel AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS dst_host
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?i)href="([^"]*)"', 1)) AS u
       |        FROM sp WHERE kind = 'text')
       |  WHERE NOT regexp_matches(u, '(?i)^https?://')
       |    AND regexp_replace(u, '[.,;)]+$$', '') <> ''),
       |srch AS (SELECT doc_id, host AS src_host
       |  FROM read_parquet('$FX/hosting.parquet/*.parquet')),
       |ed AS (SELECT l.doc_id, s.src_host,
       |    COALESCE(NULLIF(l.dst_host, ''), s.src_host) AS dst_host
       |  FROM (SELECT * FROM labs UNION ALL SELECT * FROM lrel) l
       |  JOIN srch s USING (doc_id))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q41_host_graph" ->
      s"""WITH $edgesSqlCte
         |SELECT src_host, dst_host,
         |  CAST(COUNT(*) AS BIGINT) AS n_links,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM ed
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q42_host_distance" ->
      s"""WITH RECURSIVE $edgesSqlCte,
         |edges AS (SELECT DISTINCT src_host, dst_host FROM ed),
         |seedh AS (SELECT DISTINCT regexp_extract(url_canon, '^https?://([^/:?]+)', 1) AS host
         |  FROM read_parquet('$FX/seeds.parquet/*.parquet')),
         |r(host, d) AS (
         |  SELECT host, 0 FROM seedh
         |  UNION
         |  SELECT e.dst_host, r.d + 1 FROM r JOIN edges e ON e.src_host = r.host
         |  WHERE r.d < $MaxHops)
         |SELECT host, CAST(MIN(d) AS INT) AS dist FROM r GROUP BY host ORDER BY host""".stripMargin,
  )
}
