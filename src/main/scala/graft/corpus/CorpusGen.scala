package graft.corpus

import graft.urls.UrlHash
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** Deterministic synthetic crawl corpus (FIXTURES.md §B) — the simulated
  * web the engine crawls, since egress is disabled and the crawl must be
  * reproducible bit-for-bit (SURVEY.md §0).
  *
  * Pure function of the tier (seed 42): interleaved docs table (the
  * binding input shape, BASELINE.json:15), hosting index (canonical URL →
  * doc), robots rules, and the seed list. Host popularity is Zipf(1.2) so
  * a few hosts are hot (drives the salting path). The link graph is a
  * B-ary tree from the seeds (reachability ≤ 6 hops) plus ~20% duplicate
  * cross-links and parent back-edges (2-cycles), with link renderings that
  * stress RFC 3986 canonicalization (case, default port, dot-segments,
  * percent-escapes, fragments, trailing punctuation).
  */
object CorpusGen {

  final case class Tier(name: String, docs: Int, hosts: Int, seeds: Int)

  val Smoke = Tier("sf0.001", 500, 50, 10)
  val Correctness = Tier("sf0.01", 5000, 200, 20)
  val Bench = Tier("sf0.1", 50000, 500, 50)

  def tierFor(sfDir: String): Tier = {
    val base = Paths.get(sfDir).getFileName.toString
    base match {
      case "sf0.01" => Correctness
      case "sf0.1" => Bench
      case _ => Smoke
    }
  }

  val FixtureRoot = "/root/repo/target/fixtures"

  def dirFor(tier: Tier): String = s"$FixtureRoot/${tier.name}"

  // ---- in-memory corpus model ----------------------------------------

  final case class Span(kind: String, text: String, media_ref: String, offset: Int)
  final case class Doc(doc_id: String, spans: Seq[Span])
  final case class Page(url_canon: String, host: String, doc_id: String, status: String)
  final case class Rule(host: String, agent: String, allow: Boolean, path_prefix: String, crawl_delay_ms: Long)

  final case class Corpus(
    tier: Tier,
    docs: Seq[Doc],
    pages: Seq[Page],
    rules: Seq[Rule],
    seeds: Seq[String])

  /** Zipf(s) sampler over [0, n) with a fixed CDF — deterministic given rng. */
  private final class Zipf(n: Int, s: Double, rng: java.util.Random) {
    private val cdf = new Array[Double](n)
    locally {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += 1.0 / math.pow(i + 1, s); cdf(i) = acc; i += 1 }
      i = 0
      while (i < n) { cdf(i) /= acc; i += 1 }
    }
    def next(): Int = {
      val u = rng.nextDouble()
      val idx = java.util.Arrays.binarySearch(cdf, u)
      if (idx >= 0) idx else math.min(-idx - 1, n - 1)
    }
  }

  /** Build the whole corpus in memory. Single rng, single pass ⇒ identical
    * output on every run (seed fixed at 42; FIXTURES.md §B). */
  def build(tier: Tier): Corpus = {
    val rng = new java.util.Random(42L)
    val n = tier.docs
    val nHosts = tier.hosts
    val nSeeds = tier.seeds
    val zipf = new Zipf(nHosts, 1.2, rng)

    def hostName(h: Int): String = s"host$h.example"
    // B-ary tree: children(i) = [nSeeds + i*B, nSeeds + i*B + B)
    val perSeed = math.max(1, math.ceil(n.toDouble / nSeeds).toInt)
    var b = 2
    while (math.pow(b, 6) < perSeed) b += 1
    val B = b

    def children(i: Int): Range = {
      val lo = nSeeds + i * B
      val hi = math.min(lo + B, n)
      if (lo >= n) Range(0, 0) else Range(lo, hi)
    }

    // robots: every third host disallows /blocked; delay cycles over hosts
    val disallowHost = Array.tabulate(nHosts)(h => h % 3 == 0)
    val delayOf = Array.tabulate(nHosts)(h => Array(0L, 100L, 500L, 1000L)(h % 4))

    // pass 1: host, blocked flag, status per page (draw order: i asc)
    val hostIdx = new Array[Int](n)
    val blocked = new Array[Boolean](n)
    val status = new Array[String](n)
    var i = 0
    while (i < n) {
      hostIdx(i) = zipf.next()
      val isLeaf = children(i).isEmpty
      blocked(i) = i >= nSeeds && isLeaf && disallowHost(hostIdx(i)) && rng.nextDouble() < 0.15
      status(i) = if (i >= nSeeds && rng.nextDouble() < 0.05) "404" else "ok"
      i += 1
    }
    val pathOf = Array.tabulate(n)(j => if (blocked(j)) s"/blocked/p$j" else s"/p$j")
    val urlOf = Array.tabulate(n)(j => s"https://${hostName(hostIdx(j))}${pathOf(j)}")
    val pagesByHost = mutable.Map.empty[Int, mutable.ArrayBuffer[Int]]
    i = 0
    while (i < n) { pagesByHost.getOrElseUpdate(hostIdx(i), mutable.ArrayBuffer.empty) += i; i += 1 }

    // pass 2: render docs (only ok pages carry a document)
    val FILLER = Array("lorem", "ipsum", "dolor", "sit", "amet", "vulpes", "corvus", "aqua", "terra", "ignis")
    def fill(k: Int): String = FILLER(k % FILLER.length)

    /** Render a link to target t from page p in one of several syntaxes.
      * All renderings canonicalize back to urlOf(t). */
    def renderLink(p: Int, t: Int, variant: Int): String = {
      val tgt = urlOf(t)
      val sameHost = hostIdx(p) == hostIdx(t)
      variant match {
        case 0 => s"see $tgt for more"
        case 1 => s"""<a href="$tgt">x</a>"""
        case 2 if sameHost => s"""<a href="${pathOf(t)}">rel</a>"""
        case 3 if sameHost => s"""<a href="..${pathOf(t)}">up</a>""" // /../pN → /pN
        case 4 =>
          // stress: uppercase scheme+host, default port, dot-segments, fragment
          val h = hostName(hostIdx(t)).toUpperCase
          s"link HTTPS://$h:443/x/..${pathOf(t)}#frag here"
        case 5 =>
          // stress: percent-encode an unreserved char of the path ('p' = %70)
          val enc = pathOf(t).replaceFirst("p", "%70")
          s"""<a href="https://${hostName(hostIdx(t))}$enc">enc</a>"""
        case 6 => s"trailing $tgt." // trailing punctuation stripped
        case _ => s"also $tgt, and text"
      }
    }

    val docs = mutable.ArrayBuffer.empty[Doc]
    val pages = mutable.ArrayBuffer.empty[Page]
    i = 0
    while (i < n) {
      val docId = f"d$i%06d"
      pages += Page(urlOf(i), hostName(hostIdx(i)), if (status(i) == "ok") docId else "", status(i))
      if (status(i) == "ok") {
        // link targets: tree children (reachability) + extras
        val targets = mutable.ArrayBuffer.empty[Int]
        targets ++= children(i)
        val nExtra = rng.nextInt(4) // 0..3 duplicate/cross links
        var e = 0
        while (e < nExtra) { targets += rng.nextInt(n); e += 1 }
        if (i >= nSeeds && rng.nextDouble() < 0.2) targets += (i - nSeeds) / B // back-edge (cycle)
        // spans: 3..12, alternating text/media; links spread over text spans
        val nSpans = 3 + rng.nextInt(10)
        val spans = mutable.ArrayBuffer.empty[Span]
        var offset = 0
        var ti = 0 // next target to embed
        var k = 0
        while (k < nSpans) {
          if (k % 2 == 0) {
            val sb = new StringBuilder
            sb.append(fill(rng.nextInt(100))).append(' ').append(fill(rng.nextInt(100)))
            // embed up to 3 of the remaining targets in this text span
            var embedded = 0
            while (ti < targets.length && embedded < 3) {
              val t = targets(ti)
              var v = rng.nextInt(8)
              if ((v == 2 || v == 3) && hostIdx(t) != hostIdx(i)) v = 0
              sb.append(' ').append(renderLink(i, t, v))
              ti += 1; embedded += 1
            }
            sb.append(' ').append(fill(rng.nextInt(100)))
            val text = sb.toString
            spans += Span("text", text, "", offset)
            offset += text.length
          } else {
            val kind = if (rng.nextBoolean()) "image" else "video"
            val ref = s"media://${hostName(hostIdx(i))}/m$i-$k"
            spans += Span(kind, "", ref, offset)
            offset += 1
          }
          k += 1
        }
        // any targets not yet embedded go in one final text span
        if (ti < targets.length) {
          val sb = new StringBuilder(fill(i))
          while (ti < targets.length) {
            val t = targets(ti)
            var v = rng.nextInt(8)
            if ((v == 2 || v == 3) && hostIdx(t) != hostIdx(i)) v = 0
            sb.append(' ').append(renderLink(i, t, v))
            ti += 1
          }
          spans += Span("text", sb.toString, "", offset)
        }
        docs += Doc(docId, spans.toSeq)
      }
      i += 1
    }

    val rules = mutable.ArrayBuffer.empty[Rule]
    var h = 0
    while (h < nHosts) {
      if (disallowHost(h)) rules += Rule(hostName(h), "*", allow = false, "/blocked", delayOf(h))
      rules += Rule(hostName(h), "*", allow = true, "/", delayOf(h))
      h += 1
    }

    val seeds = (0 until nSeeds).map(urlOf(_))
    Corpus(tier, docs.toSeq, pages.toSeq, rules.toSeq, seeds)
  }

  // ---- parquet materialization ----------------------------------------

  /** Write the corpus tables under dirFor(tier) if not already present.
    * Concurrent-safe via write-to-tmp + marker file. Returns the dir. */
  def ensure(spark: SparkSession, tier: Tier): String = {
    val dir = dirFor(tier)
    val marker = Paths.get(dir, "_DONE")
    if (Files.exists(marker)) return dir
    synchronized {
      if (Files.exists(marker)) return dir
      write(spark, tier, dir)
      Files.createDirectories(Paths.get(dir))
      Files.writeString(marker, "ok")
    }
    dir
  }

  def ensureFor(spark: SparkSession, sfDir: String): String = ensure(spark, tierFor(sfDir))

  private def write(spark: SparkSession, tier: Tier, dir: String): Unit = {
    import spark.implicits._
    val c = build(tier)
    val pq = SaveMode.Overwrite
    c.docs.toDF().repartition(8).write.mode(pq).parquet(s"$dir/interleaved.parquet")
    c.pages.map(p => (UrlHash.hash64(p.url_canon), p.url_canon, p.host, p.doc_id, p.status))
      .toDF("page_hash", "url_canon", "host", "doc_id", "status")
      .repartition(8).write.mode(pq).parquet(s"$dir/hosting.parquet")
    c.rules.toDF().coalesce(1).write.mode(pq).parquet(s"$dir/robots.parquet")
    c.seeds.toDF("url_canon").coalesce(1).write.mode(pq).parquet(s"$dir/seeds.parquet")
  }

  // ---- typed readers ---------------------------------------------------

  def interleaved(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/interleaved.parquet")
  def hosting(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/hosting.parquet")
  def robots(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/robots.parquet")
  def seeds(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/seeds.parquet")
}
