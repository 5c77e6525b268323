package graft.corpus

import graft.urls.UrlHash
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Deterministic synthetic crawl corpus (FIXTURES.md §B) — the simulated
  * web the engine crawls, since egress is disabled and the crawl must be
  * reproducible bit-for-bit (SURVEY.md §0).
  *
  * Every page is a PURE FUNCTION of (tier, page index): per-page splitmix
  * PRNGs, no shared draw sequence. That makes generation embarrassingly
  * parallel — the parquet fixtures are written by a distributed
  * `spark.range(n)` job (the only design that would also produce a
  * 10^10-URL corpus), while the sequential oracle calls the same per-index
  * functions in a driver loop and gets identical bytes.
  *
  * Host popularity is Zipf(1.2) so a few hosts are hot (drives the
  * salting path); the link graph is a B-ary tree from the seeds
  * (reachability ≤ ~7 hops) plus duplicate cross-links and parent
  * back-edges (2-cycles); link renderings stress RFC 3986
  * canonicalization (case, default port, dot-segments, percent-escapes,
  * fragments, trailing punctuation).
  */
object CorpusGen {

  final case class Tier(name: String, docs: Int, hosts: Int, seeds: Int)

  val Smoke = Tier("sf0.001", 500, 50, 10)
  val Correctness = Tier("sf0.01", 5000, 200, 20)
  val Bench = Tier("sf0.1", 500000, 2000, 100)

  /** Bump when generation logic changes — stale fixtures regenerate.
    * PUBLIC because every DERIVED layout built from these tables (the
    * engine's bucketed hosting/docs copies, BenchFrontier's ×variants
    * tables) must embed it in its path: ensure() regenerates only the
    * base parquet on a version bump, so an unversioned derived path
    * would silently keep serving bucketed copies of the OLD corpus
    * (review finding). */
  val GenVersion = "v3-strictmath-zipf"

  def tierFor(sfDir: String): Tier =
    Paths.get(sfDir).getFileName.toString match {
      case "sf0.01" => Correctness
      case "sf0.1" => Bench
      case _ => Smoke
    }

  val FixtureRoot = "/root/repo/target/fixtures"
  def dirFor(tier: Tier): String = s"$FixtureRoot/${tier.name}"

  // ---- corpus model ----------------------------------------------------

  final case class Span(kind: String, text: String, media_ref: String, offset: Int)
  final case class Doc(doc_id: String, spans: Seq[Span])
  final case class Page(url_canon: String, host: String, doc_id: String, status: String)
  final case class Rule(host: String, agent: String, allow: Boolean, path_prefix: String, crawl_delay_ms: Long)
  final case class HostingRow(page_hash: Long, url_canon: String, host: String, doc_id: String, status: String)

  final case class Corpus(
    tier: Tier,
    docs: Seq[Doc],
    pages: Seq[Page],
    rules: Seq[Rule],
    seeds: Seq[String])

  // ---- per-index pure PRNG --------------------------------------------

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Tiny deterministic PRNG: stream of splitmix64 outputs from a seed. */
  private final class PRng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s += 0x9E3779B97F4A7C15L; splitmix64(s) }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def nextBoolean(): Boolean = (nextLong() & 1L) == 1L
  }

  // ---- tier-level derived structure (cheap, cached per JVM) -----------

  /** Zipf(1.2) CDF over hosts — built once per (JVM, tier). */
  private val zipfCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def zipfCdf(nHosts: Int): Array[Double] =
    zipfCache.computeIfAbsent(nHosts, { n =>
      val cdf = new Array[Double](n)
      var acc = 0.0
      var i = 0
      // StrictMath, not Math: Math.pow is JVM-intrinsic with 1-ulp
      // latitude, and this table decides every page's host — executors
      // on a different JVM build than the driver (or fixtures reused
      // across machines) must compute the identical corpus (review)
      while (i < n) { acc += 1.0 / StrictMath.pow(i + 1.0, 1.2); cdf(i) = acc; i += 1 }
      i = 0
      while (i < n) { cdf(i) /= acc; i += 1 }
      cdf
    })

  private def zipfHost(nHosts: Int, u: Double): Int = {
    val idx = java.util.Arrays.binarySearch(zipfCdf(nHosts), u)
    if (idx >= 0) idx else math.min(-idx - 1, nHosts - 1)
  }

  /** Tree fanout B: smallest b with b^6 ≥ docs/seeds (depth ≤ ~7). */
  def fanout(tier: Tier): Int = {
    val perSeed = math.max(1, math.ceil(tier.docs.toDouble / tier.seeds).toInt)
    var b = 2
    while (math.pow(b, 6) < perSeed) b += 1
    b
  }

  def children(tier: Tier, i: Int): Range = {
    val b = fanout(tier)
    val lo = tier.seeds + i.toLong * b
    if (lo >= tier.docs) Range(0, 0)
    else Range(lo.toInt, math.min(lo + b, tier.docs.toLong).toInt)
  }

  def parent(tier: Tier, i: Int): Int = (i - tier.seeds) / fanout(tier)

  def hostName(h: Int): String = s"host$h.example"
  def disallowHost(h: Int): Boolean = h % 3 == 0
  def delayOfHost(h: Int): Long = Array(0L, 100L, 500L, 1000L)(h % 4)

  // ---- per-page pure functions ----------------------------------------

  final case class PageMeta(hostIdx: Int, blocked: Boolean, status: String) {
    def host: String = hostName(hostIdx)
  }

  /** All page-level draws, in a fixed order from the page's own PRNG. */
  def pageMeta(tier: Tier, i: Int): PageMeta = {
    val rng = new PRng(splitmix64(42L ^ (i.toLong * 0x5851F42D4C957F2DL)))
    val hostIdx = zipfHost(tier.hosts, rng.nextDouble())
    val isLeaf = children(tier, i).isEmpty
    val blocked = i >= tier.seeds && isLeaf && disallowHost(hostIdx) &&
      rng.nextDouble() < 0.15
    val status = if (i >= tier.seeds && rng.nextDouble() < 0.05) "404" else "ok"
    PageMeta(hostIdx, blocked, status)
  }

  def pathOf(tier: Tier, i: Int): String =
    if (pageMeta(tier, i).blocked) s"/blocked/p$i" else s"/p$i"

  def urlOf(tier: Tier, i: Int): String =
    s"https://${pageMeta(tier, i).host}${pathOf(tier, i)}"

  def docIdOf(i: Int): String = f"d$i%07d"

  private val FILLER = Array("lorem", "ipsum", "dolor", "sit", "amet",
    "vulpes", "corvus", "aqua", "terra", "ignis")

  /** Render a link to target t from page i; every rendering canonicalizes
    * back to urlOf(t). `v` selects the syntax variant. */
  private def renderLink(tier: Tier, i: Int, t: Int, v0: Int): String = {
    val mi = pageMeta(tier, i)
    val mt = pageMeta(tier, t)
    val sameHost = mi.hostIdx == mt.hostIdx
    val v = if ((v0 == 2 || v0 == 3) && !sameHost) 0 else v0
    val tgt = urlOf(tier, t)
    val path = pathOf(tier, t)
    v match {
      case 0 => s"see $tgt for more"
      case 1 => s"""<a href="$tgt">x</a>"""
      case 2 => s"""<a href="$path">rel</a>"""
      case 3 => s"""<a href="..$path">up</a>""" // /../pN → /pN
      case 4 => s"link HTTPS://${mt.host.toUpperCase}:443/x/..$path#frag here"
      case 5 =>
        val enc = path.replaceFirst("p", "%70")
        s"""<a href="https://${mt.host}$enc">enc</a>"""
      case 6 => s"trailing $tgt."
      case _ => s"also $tgt, and text"
    }
  }

  /** The document body of page i (only valid when status == "ok"):
    * 3–12 alternating text/media spans with the page's outlinks embedded
    * across text spans. Pure in (tier, i). */
  def docSpans(tier: Tier, i: Int): Seq[Span] = {
    val rng = new PRng(splitmix64(777L ^ (i.toLong * 0x2545F4914F6CDD1DL)))
    val mi = pageMeta(tier, i)
    val targets = mutable.ArrayBuffer.empty[Int]
    targets ++= children(tier, i)
    val nExtra = rng.nextInt(4)
    var e = 0
    while (e < nExtra) { targets += rng.nextInt(tier.docs); e += 1 }
    if (i >= tier.seeds && rng.nextDouble() < 0.2) targets += parent(tier, i)

    def fill(): String = FILLER(rng.nextInt(FILLER.length))
    val nSpans = 3 + rng.nextInt(10)
    val spans = mutable.ArrayBuffer.empty[Span]
    var offset = 0
    var ti = 0
    var k = 0
    while (k < nSpans) {
      if (k % 2 == 0) {
        val sb = new StringBuilder
        sb.append(fill()).append(' ').append(fill())
        var embedded = 0
        while (ti < targets.length && embedded < 3) {
          sb.append(' ').append(renderLink(tier, i, targets(ti), rng.nextInt(8)))
          ti += 1; embedded += 1
        }
        sb.append(' ').append(fill())
        val text = sb.toString
        spans += Span("text", text, "", offset)
        offset += text.length
      } else {
        val kind = if (rng.nextBoolean()) "image" else "video"
        spans += Span(kind, "", s"media://${mi.host}/m$i-$k", offset)
        offset += 1
      }
      k += 1
    }
    if (ti < targets.length) {
      val sb = new StringBuilder(fill())
      while (ti < targets.length) {
        sb.append(' ').append(renderLink(tier, i, targets(ti), rng.nextInt(8)))
        ti += 1
      }
      spans += Span("text", sb.toString, "", offset)
    }
    spans.toSeq
  }

  def hostingRow(tier: Tier, i: Int): HostingRow = {
    val m = pageMeta(tier, i)
    val url = urlOf(tier, i)
    HostingRow(UrlHash.hash64(url), url, m.host,
      if (m.status == "ok") docIdOf(i) else "", m.status)
  }

  def rulesFor(tier: Tier): Seq[Rule] =
    (0 until tier.hosts).flatMap { h =>
      val base = Seq(Rule(hostName(h), "*", allow = true, "/", delayOfHost(h)))
      if (disallowHost(h))
        Rule(hostName(h), "*", allow = false, "/blocked", delayOfHost(h)) +: base
      else base
    }

  def seedUrls(tier: Tier): Seq[String] = (0 until tier.seeds).map(urlOf(tier, _))

  // ---- driver-side build (oracle input; small tiers) -------------------

  def build(tier: Tier): Corpus = {
    val docs = (0 until tier.docs).flatMap { i =>
      if (pageMeta(tier, i).status == "ok") Some(Doc(docIdOf(i), docSpans(tier, i))) else None
    }
    val pages = (0 until tier.docs).map { i =>
      val h = hostingRow(tier, i)
      Page(h.url_canon, h.host, h.doc_id, h.status)
    }
    Corpus(tier, docs, pages, rulesFor(tier), seedUrls(tier))
  }

  // ---- distributed parquet materialization -----------------------------

  /** Write the corpus tables under dirFor(tier) if absent/stale (marker
    * records the generator version). Generation runs as a distributed
    * `spark.range` job — the same code path a 10^10-URL corpus would use. */
  def ensure(spark: SparkSession, tier: Tier): String = {
    val dir = dirFor(tier)
    val marker = Paths.get(dir, "_DONE")
    def fresh = Files.exists(marker) && Files.readString(marker) == GenVersion
    if (fresh) return dir
    synchronized {
      if (fresh) return dir
      write(spark, tier, dir)
      Files.createDirectories(Paths.get(dir))
      Files.writeString(marker, GenVersion)
    }
    dir
  }

  def ensureFor(spark: SparkSession, sfDir: String): String = ensure(spark, tierFor(sfDir))

  // ---- media-byte sidecar (q61) ---------------------------------------

  /** Version marker for the binary sidecar fixtures. The path embeds
    * BOTH the corpus GenVersion and this one (the derived-path rule at
    * [[GenVersion]]): a corpus bump regenerates the media refs, so an
    * unversioned media dir would silently keep serving files for the
    * OLD corpus's refs — both engines read the same stale dir and the
    * gate would stay green on a wrong, shrunken inventory. */
  val MediaGenVersion = "v2"

  def mediaDirFor(tier: Tier): String =
    s"${dirFor(tier)}/media-$GenVersion-$MediaGenVersion"

  private def md5hexStr(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** The [PINNED] file bytes for one media asset — a pure function of
    * its media_ref, printable ASCII by construction so the DuckDB
    * oracle can derive the same features via decode(content):
    * `GFTMv1 WWWW HHHH\n` + 128 hex chars of md5-chained payload +
    * `\n`. Width/height live in the BYTES (cols 8-11 / 13-16); the
    * q61 features are read from the file, not from the ref string. */
  def mediaBytes(ref: String): Array[Byte] = {
    val h = md5hexStr(ref)
    val width = 64 + Integer.parseInt(h.substring(0, 2), 16) % 16
    val height = 64 + Integer.parseInt(h.substring(2, 4), 16) % 16
    val p1 = md5hexStr(h); val p2 = md5hexStr(p1); val p3 = md5hexStr(p2)
    (f"GFTMv1 $width%04d $height%04d\n" + h + p1 + p2 + p3 + "\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Generate one binary file per distinct media asset of the tier
    * (filename = md5(media_ref).gft — both engines join the bytes back
    * to the spans through that digest). Pure function of the tier: the
    * refs are enumerated with the same per-index docSpans the corpus
    * itself is built from; no Spark needed. */
  def ensureMedia(tier: Tier): String = {
    val dir = mediaDirFor(tier)
    val marker = Paths.get(dir, "_DONE")
    def fresh = Files.exists(marker) && Files.readString(marker) == MediaGenVersion
    if (fresh) return dir
    synchronized {
      if (fresh) return dir
      val d = Paths.get(dir)
      Files.createDirectories(d)
      val seen = mutable.HashSet.empty[String]
      var i = 0
      while (i < tier.docs) {
        // docSpans is only valid for status == "ok" pages (the same
        // filter build() applies) — non-ok pages have no document, so
        // writing their would-be refs would leave orphan files the
        // corpus inventory disagrees with
        if (pageMeta(tier, i).status == "ok") {
          docSpans(tier, i).foreach { sp =>
            if (sp.kind != "text" && sp.media_ref.nonEmpty && seen.add(sp.media_ref))
              Files.write(d.resolve(md5hexStr(sp.media_ref) + ".gft"), mediaBytes(sp.media_ref))
          }
        }
        i += 1
      }
      Files.writeString(marker, MediaGenVersion)
    }
    dir
  }

  private def write(spark: SparkSession, tier: Tier, dir: String): Unit = {
    import spark.implicits._
    val pq = SaveMode.Overwrite
    val n = tier.docs
    val parts = math.max(8, spark.sparkContext.defaultParallelism)
    val idx = spark.range(0, n, 1, parts).as[Long]
    idx.map { i =>
        val ii = i.toInt
        if (pageMeta(tier, ii).status == "ok") Doc(docIdOf(ii), docSpans(tier, ii))
        else Doc("", Seq.empty)
      }
      .filter(_.doc_id.nonEmpty)
      .write.mode(pq).parquet(s"$dir/interleaved.parquet")
    idx.map(i => hostingRow(tier, i.toInt))
      .write.mode(pq).parquet(s"$dir/hosting.parquet")
    rulesFor(tier).toDF().coalesce(1).write.mode(pq).parquet(s"$dir/robots.parquet")
    seedUrls(tier).toDF("url_canon").coalesce(1).write.mode(pq).parquet(s"$dir/seeds.parquet")
  }

  // ---- sitemaps (additive fixture, own marker — does not touch the
  //      GenVersion'd base tables or any crawl golden) -------------------

  private val SitemapVersion = "v1"

  /** Deterministic per-host sitemap XML: each host lists its first 50
    * URLs (ascending url_canon), except every 10th loc is rewritten to a
    * /missing path — a sitemap entry the corpus does NOT host, so the
    * coverage audit (q44) has both classes. Derived FROM hosting.parquet
    * with sort_array for determinism; guarded by its own marker so
    * existing fixtures (and the crawl goldens derived from them) are
    * untouched. */
  def ensureSitemaps(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val marker = Paths.get(dir, "_SITEMAPS_DONE")
    def fresh = Files.exists(marker) && Files.readString(marker) == SitemapVersion
    if (fresh) return dir
    synchronized {
      if (fresh) return dir
      hosting(spark, dir)
        .groupBy("host")
        .agg(slice(sort_array(collect_list(col("url_canon"))), 1, 50).as("locs"))
        .select(col("host"), concat(
          lit("""<?xml version="1.0"?><urlset>"""),
          array_join(transform(col("locs"), (u, i) =>
            concat(lit("<url><loc>"),
              when(i % 10 === 9, regexp_replace(u, "/p", "/missing")).otherwise(u),
              lit("</loc></url>"))), ""),
          lit("</urlset>")).as("xml"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/sitemaps.parquet")
      Files.writeString(marker, SitemapVersion)
    }
    dir
  }

  def sitemaps(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sitemaps.parquet")

  // ---- readers ---------------------------------------------------------

  def interleaved(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/interleaved.parquet")
  def hosting(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/hosting.parquet")
  def robots(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/robots.parquet")
  def seeds(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/seeds.parquet")
}
