package graft

import graft.urls.{UrlCanon, UrlExtract}
import org.scalatest.funsuite.AnyFunSuite

class UrlCanonSpec extends AnyFunSuite {

  // RFC 3986 §5.4 reference-resolution examples (public standard vectors)
  val base = "http://a/b/c/d;p?q"
  val rfc5_4: Seq[(String, String)] = Seq(
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g/",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g",
    // abnormal examples (§5.4.2)
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
  )

  test("RFC 3986 §5.4 resolution vectors") {
    rfc5_4.foreach { case (ref, expected) =>
      assert(UrlCanon.canonicalize(ref, base) == expected, s"ref=$ref")
    }
  }

  test("fragments are stripped during resolution") {
    assert(UrlCanon.canonicalize("g#s", base) == "http://a/b/c/g")
    assert(UrlCanon.canonicalize("g?y#s", base) == "http://a/b/c/g?y")
    assert(UrlCanon.canonicalize("#s", base) == "http://a/b/c/d;p?q")
  }

  test("case + port + percent normalization (§6.2.2)") {
    assert(UrlCanon.canonicalize("HTTPS://ExAmPle.COM:443/a/./b/../c") == "https://example.com/a/c")
    assert(UrlCanon.canonicalize("http://example.com:80/x") == "http://example.com/x")
    assert(UrlCanon.canonicalize("http://example.com:8080/x") == "http://example.com:8080/x")
    assert(UrlCanon.canonicalize("http://example.com/%7Euser") == "http://example.com/~user")
    assert(UrlCanon.canonicalize("http://example.com/%7euser") == "http://example.com/~user")
    assert(UrlCanon.canonicalize("http://example.com/a%2fb") == "http://example.com/a%2Fb")
    assert(UrlCanon.canonicalize("http://example.com/%70age") == "http://example.com/page")
    assert(UrlCanon.canonicalize("http://example.com") == "http://example.com/")
    assert(UrlCanon.canonicalize("http://example.com?q=1") == "http://example.com/?q=1")
    assert(UrlCanon.canonicalize("http://example.com/x?") == "http://example.com/x")
    // %2e-encoded dot segments: decoding surfaces them, so dot-segment
    // removal must run on the DECODED path (§6.2.2 decode-then-remove;
    // round-3 review — the old order emitted the non-fixed-point
    // "http://h/../p"). Idempotence asserted explicitly on each.
    Seq(
      "http://example.com/%2e%2e/p" -> "http://example.com/p",
      "http://example.com/a/%2e%2e/p" -> "http://example.com/p",
      "http://example.com/a/%2E/p" -> "http://example.com/a/p",
      "http://example.com/a/b/%2e%2e" -> "http://example.com/a/",
      "http://example.com/%2e" -> "http://example.com/").foreach { case (u, want) =>
      val c = UrlCanon.canonicalize(u)
      assert(c == want, s"$u -> $c, want $want")
      assert(UrlCanon.canonicalize(c) == c, s"not a fixed point: $u -> $c")
    }
  }

  test("invalid / non-http(s) rejected") {
    assert(UrlCanon.canonicalize("ftp://example.com/x") == null)
    assert(UrlCanon.canonicalize("mailto:a@b.c") == null)
    assert(UrlCanon.canonicalize("javascript:void(0)") == null)
    assert(UrlCanon.canonicalize("http://") == null)
    assert(UrlCanon.canonicalize(null) == null)
    assert(UrlCanon.canonicalize("/rel/only") == null) // no base
  }

  test("canonicalize is idempotent on corpus-shaped URLs (seeded property)") {
    val rng = new java.util.Random(7)
    val schemes = Array("http", "https", "HTTPS", "HTTP")
    val extras = Array("", "/x/../", "/./", "/a/b/../")
    val queries = Array("", "?a=1&b=2", "?z%2f", "?%7e")
    (0 until 5000).foreach { _ =>
      val u = s"${schemes(rng.nextInt(4))}://Host${rng.nextInt(400)}.example" +
        s"${extras(rng.nextInt(4))}/p${rng.nextInt(99999)}${queries(rng.nextInt(4))}"
      val c1 = UrlCanon.canonicalize(u)
      assert(c1 != null, u)
      assert(UrlCanon.canonicalize(c1) == c1, s"not idempotent: $u -> $c1")
    }
  }

  test("hostOf / pathOf on canonical forms") {
    assert(UrlCanon.hostOf("https://h.example/p/q?x") == "h.example")
    assert(UrlCanon.hostOf("https://u@h.example:8443/p") == "h.example")
    assert(UrlCanon.pathOf("https://h.example/p/q?x") == "/p/q")
    assert(UrlCanon.pathOf("https://h.example") == "/")
  }

  // RFC 3986 §3.2.2 bracket literals: hostOf must agree with the
  // canonicalizer's normAuthority (round-1 bug: hostOf stopped at the
  // first ':' and returned "[" for IPv6 hosts)
  test("IPv6 bracket-literal hosts: canonicalize and hostOf agree") {
    assert(UrlCanon.canonicalize("http://[::1]/x") == "http://[::1]/x")
    assert(UrlCanon.canonicalize("http://[2001:DB8::7]:80/a/../b?q") == "http://[2001:db8::7]/b?q")
    assert(UrlCanon.hostOf("http://[::1]/x") == "[::1]")
    assert(UrlCanon.hostOf("http://[2001:db8::7]/b?q") == "[2001:db8::7]")
    assert(UrlCanon.hostOf("http://[::1]:8080/x") == "[::1]")
    assert(UrlCanon.pathOf("http://[::1]/x") == "/x")
    // hostOf(canonicalize(u)) is the politeness/robots key — must be
    // consistent for every canonicalizable URL shape
    Seq("http://[::1]/x", "http://[2001:db8::7]:9090/p?q", "http://u@[::1]/y").foreach { u =>
      val c = UrlCanon.canonicalize(u)
      assert(c != null, u)
      assert(UrlCanon.hostOf(c).startsWith("["), s"u=$u c=$c host=${UrlCanon.hostOf(c)}")
      assert(UrlCanon.hostOf(c).endsWith("]"), s"u=$u c=$c")
    }
  }

  // IDN + reg-name percent normalization [PINNED]: literal non-ASCII
  // labels → punycode; unreserved escapes decode; other escapes keep
  // uppercase hex; everything idempotent
  test("IDN hosts and percent-encoded reg-names") {
    assert(UrlCanon.canonicalize("http://MÜNCHEN.example/x") == "http://xn--mnchen-3ya.example/x")
    assert(UrlCanon.canonicalize("http://bücher.example/") == "http://xn--bcher-kva.example/")
    assert(UrlCanon.canonicalize("http://ex%41mple.com/a") == "http://example.com/a")
    assert(UrlCanon.canonicalize("http://b%c3%bccher.example/") == "http://b%C3%BCcher.example/")
    Seq("http://MÜNCHEN.example/x", "http://ex%41mple.com/a",
      "http://b%c3%bccher.example/", "https://δοκιμή.example:8443/p?q",
      // mixed literal non-ASCII + escapes: IDN output must not lowercase
      // the preserved escape hex (round-2 review repro)
      "http://ü%c3.example/", "http://münchen%2f.example/x",
      "http://ü.b%c3xyz.example/").foreach { u =>
      val c = UrlCanon.canonicalize(u)
      assert(c != null, u)
      assert(UrlCanon.canonicalize(c) == c, s"not idempotent: $u -> $c")
      assert(UrlCanon.hostOf(c).forall(_ <= '\u007f'), s"host not ASCII: $c")
    }
  }

  // the zero-alloc fast path must NEVER accept a URL the canonicalizer
  // would change — property-check it across RFC vectors, corpus-shaped
  // URLs, tricky shapes, and (for effectiveness) canonical outputs
  test("isCanonicalAscii fast path is sound (and useful)") {
    import graft.functions.GraftRT
    import org.apache.spark.unsafe.types.UTF8String
    def fast(u: String): Boolean = GraftRT.isCanonicalAscii(UTF8String.fromString(u))
    val tricky = Seq(
      "http://a/b/c/d;p?q", "HTTP://A/x", "http://a:80/x", "http://a:8080/x",
      "http://a:080/x", "http://a", "http://a/", "http://a/?", "http://a/%7e",
      "http://a/./x", "http://a/../x", "http://a/x/.", "http://a/x/..",
      "http://a/x/./", "http://a/.hidden", "http://a/x..y", "http://a/x.",
      "http://[::1]/x", "http://u@a/x", "http://a/x#f", "http://a/x y",
      "https://a:443/x", "https://a:4430/x", "http://a/x?a=1&b=2", "http://a/x??",
      "http://a/x?", "http://a//y", "ftp://a/x", "/rel", "x/y")
    val rng = new java.util.Random(11)
    val gen = (0 until 3000).map { _ =>
      s"http${if (rng.nextBoolean()) "s" else ""}://Host${rng.nextInt(50)}.example" +
        s"/p${rng.nextInt(999)}${Seq("", "?a=1", "/sub/q", "/./x", "/%7e")(rng.nextInt(5))}"
    }
    val all = tricky ++ gen ++
      (tricky ++ gen).flatMap(u => Option(UrlCanon.canonicalize(u)))
    all.foreach { u =>
      if (fast(u))
        assert(UrlCanon.canonicalize(u) == u, s"fast path accepted non-canonical: $u")
    }
    // effectiveness: canonical outputs of plain corpus-shaped URLs are accepted
    val canonicals = gen.flatMap(u => Option(UrlCanon.canonicalize(u)))
    val accepted = canonicals.count(fast)
    assert(accepted.toDouble / canonicals.size > 0.7,
      s"fast path too conservative: $accepted/${canonicals.size}")
  }

  // the single-allocation relative-resolve fast path must agree with the
  // full canonicalizer on EVERY input it accepts, across eligible and
  // ineligible shapes; and it must actually fire on corpus-shaped links
  test("fastResolveAscii is sound vs canonicalize (and useful)") {
    import graft.functions.GraftRT
    import org.apache.spark.unsafe.types.UTF8String
    def fast(ref: String, base: String): Option[String] =
      Option(GraftRT.fastResolveAscii(UTF8String.fromString(ref), UTF8String.fromString(base)))
        .map(_.toString)
    val bases = Seq(
      "http://a.example/", "https://b.example:8080/dir/page?q=1",
      "http://c.example/a/b/c", "http://d.example/x?", // last not canonical-ascii
      "HTTP://E.example/x", "http://f.example/a%20b/c")
    val refs = Seq(
      "/p1", "/p1?x=1", "/a/b/c", "p1", "sub/p2", "p?x", "/p?a=1&b=2",
      "//other.example/p", "/p#frag", "/p%7e", "/./x", "/../x", "../up",
      "./here", ".", "..", "x/./y", "x/../y", "/x/.", "/x/..", "/x/y/.",
      "a:b", "/a:b", "/p?", "p?", "", "/ p", "/p\ttab", "/p?q?r", "/p??",
      "/@at", "/[br]", "/p;x=1", "/p,q", "https://abs.example/q", "/p1/p2/p3?a=b&c=d",
      // query-only refs: §5.2.2 keeps the FULL base path (round-3 review
      // caught the last-segment merge being wrongly applied to these)
      "?page=2", "?x", "?a=1&b=2", "?q?r", "??", "?")
    for (b <- bases; r <- refs) {
      fast(r, b).foreach { got =>
        val want = UrlCanon.canonicalize(r, b)
        assert(want == got, s"fastResolve mismatch: ref=$r base=$b got=$got want=$want")
      }
    }
    // effectiveness: plain absolute-path and relative links against
    // canonical bases must take the fast path
    val hits = Seq(
      ("/page/123", "http://a.example/"), ("img/photo.jpg", "http://a.example/dir/index"),
      ("/p?a=1", "https://b.example:8080/x"),
      ("?page=2", "http://a.example/dir/list")).count { case (r, b) => fast(r, b).isDefined }
    assert(hits == 4, s"fast resolve too conservative: $hits/4")
  }

  test("extraction grammar: absolute, href, relative, trailing punctuation, order") {
    val text =
      """intro https://a.example/p1. then <a href="https://b.example/p2">x</a> """ +
        """and <a href="/rel/p3">y</a> tail HTTP://C.Example/p4, done"""
    val links = UrlExtract.extract(text).toSeq
    assert(links == Seq("https://a.example/p1", "https://b.example/p2", "/rel/p3", "HTTP://C.Example/p4"))
  }

  test("extraction does not double-count an absolute URL inside href") {
    val text = """<a href="https://a.example/p1">x</a>"""
    assert(UrlExtract.extract(text).toSeq == Seq("https://a.example/p1"))
  }

  test("extraction handles empty/null") {
    assert(UrlExtract.extract(null).isEmpty)
    assert(UrlExtract.extract("no links here").isEmpty)
  }
}
