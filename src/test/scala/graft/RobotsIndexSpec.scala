package graft

import graft.crawl.RobotsIndex
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level robots decision ≡ the String oracle
  * (RobotsMatch.allows ∘ UrlCanon.pathOf) — the late-round-3
  * zero-allocation matcher must be a pure re-encoding. */
class RobotsIndexSpec extends AnyFunSuite {

  private val rules = Map(
    "a.example" -> Array((false, "/private"), (true, "/private/pub"), (false, "/tmp")),
    "b.example" -> Array((false, "")), // empty prefix: matches every path
    "c.example" -> Array((false, "/"), (true, "/a")),
    "d.example" -> Array((true, "/x"), (false, "/x")), // tie: allow wins
    "é.example" -> Array((false, "/café")), // multibyte host + prefix
    "e.example" -> Array[(Boolean, String)]() // present but empty
  )
  private val idx = new RobotsIndex(rules)

  private val urls = Seq(
    "http://a.example/private/doc",
    "http://a.example/private/pub/doc",
    "http://a.example/other",
    "http://a.example/tmp",
    "http://a.example/tm", // shorter than prefix
    "http://b.example/anything",
    "http://b.example", // no path ⇒ virtual "/"
    "http://c.example", // virtual "/" vs disallow "/"
    "http://c.example/a/b",
    "http://d.example/x/y",
    "http://é.example/café/menu",
    "http://é.example/cafe",
    "http://e.example/x",
    "http://unlisted.example/x",
    "http://a.example/private?q=1", // '?' terminates the path
    "http://a.example?q=/private", // '/' found inside query (pinned pathOf quirk)
    "no-scheme-at-all", // pathOf ⇒ ""
    "http://a.example:8080/private/p", // port before path
    ""
  )

  test("byte matcher equals the String oracle on edge vectors") {
    for (u <- urls; h <- rules.keys ++ Seq("unlisted.example")) {
      val hu = UTF8String.fromString(h)
      val uu = UTF8String.fromString(u)
      assert(idx.allowsUrl(hu, uu) === idx.allowsUrlViaStrings(hu, uu),
        s"host=$h url=$u")
    }
  }

  test("byte matcher equals the String oracle on generated urls/rules") {
    val rnd = new scala.util.Random(42)
    val hosts = Seq("h0.ex", "h1.ex", "héé.ex")
    val genRules = hosts.map { h =>
      h -> Array.fill(rnd.nextInt(5)) {
        (rnd.nextBoolean(), Seq("", "/", "/a", "/ab", "/a/b", "/café")(rnd.nextInt(6)))
      }
    }.toMap
    val gidx = new RobotsIndex(genRules)
    val paths = Seq("", "/", "/a", "/ab", "/abc", "/a/b", "/café/x", "/q?x=/a", "?x=/a")
    for (_ <- 1 to 2000) {
      val h = hosts(rnd.nextInt(hosts.length))
      val u = s"http://$h${paths(rnd.nextInt(paths.length))}"
      val hu = UTF8String.fromString(h)
      val uu = UTF8String.fromString(u)
      assert(gidx.allowsUrl(hu, uu) === gidx.allowsUrlViaStrings(hu, uu), s"host=$h url=$u")
    }
  }
}
