package graft

import graft.functions._
import graft.urls.{UrlCanon, UrlHash}
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("canonicalize_url expression matches the Scala function and survives codegen") {
    val urls = Seq(
      ("HTTPS://ExAmPle.COM:443/a/./b/../c", null: String),
      ("../g", "http://a/b/c/d;p?q"),
      ("ftp://nope/x", null: String),
      ("g?y#s", "http://a/b/c/d;p?q"),
    )
    val df = urls.toDF("u", "b")
      .select($"u", $"b", canonicalize_url($"u", $"b").as("c"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    got.foreach { case (u, b, c) =>
      assert(c == UrlCanon.canonicalize(u, b), s"u=$u b=$b")
    }
  }

  test("extract_urls expression matches UrlExtract and keeps order") {
    val text = """x https://a.example/p1. <a href="/rel">r</a> HTTP://B.EX/p2, y"""
    val got = Seq(text).toDF("t").select(extract_urls($"t").as("links"))
      .as[Seq[String]].head()
    assert(got == graft.urls.UrlExtract.extract(text).toSeq)
  }

  test("byte-level extractUTF8 ≡ regex UrlExtract on adversarial + random inputs") {
    import org.apache.spark.unsafe.types.UTF8String
    def viaBytes(s: String): Seq[String] = {
      val a = GraftRT.extractUTF8(UTF8String.fromString(s))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    val edge = Seq(
      "", "h", "http://", "https://", "http://x", "HtTpS://X.Y/p",
      "xhttps://a.ex/p", "_https://a.ex/p", "0https://a.ex/p", "-https://a.ex/p",
      """href="/rel"""", """HREF="/REL"""", """href="""", """href="unterminated""",
      """href="a" href="b" https://c.ex/d""",
      """<a href="https://in.href/x">t</a> https://out.side/y""",
      """https://x/?href="https://y"""", // abs swallowing href=, then href value
      "link https://a.ex/p. end", "https://a.ex/p,;)...", "https://a.ex/....",
      "https://a.ex/p\nhttps://b.ex/q\thttps://c.ex/r",
      "日本 https://uni.ex/パス?q=1 後", "préhttps://acc.ex/p", // non-ASCII boundary
      """href="x" https://a.ex/p href="y"""",
      "http://a.ex/1 https://a.ex/2 HTTP://A.EX/3",
      """text href="../up/page" more""", "(see https://paren.ex/p)")
    edge.foreach { s =>
      assert(viaBytes(s) == graft.urls.UrlExtract.extract(s).toSeq, s"input: $s")
    }
    // randomized: fragments that stress every branch, fixed seed
    val rnd = new scala.util.Random(4242)
    val frags = Array("https://h.ex/p", "HTTP://H.EX/Q", "href=\"", "\"", "/rel",
      "../u", " ", "\n", ".", ",", ")", ";", "<", ">", "'", "x", "_", "7", "é",
      "http", "s://", "://", "=", "日", "٣", "\u200d")
    (1 to 2000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))(frags(rnd.nextInt(frags.length))).mkString
      assert(viaBytes(s) == graft.urls.UrlExtract.extract(s).toSeq, s"input: $s")
    }
  }

  test("url_hash matches UrlHash.hash64 (xxhash64 seed 42)") {
    val u = "https://host1.example/p42"
    val got = Seq(u).toDF("u").select(url_hash($"u")).as[Long].head()
    assert(got == UrlHash.hash64(u))
  }

  test("host_of / path_of expressions") {
    val row = Seq("https://h7.example:8080/a/b?q=1").toDF("u")
      .select(host_of($"u"), path_of($"u")).as[(String, String)].head()
    assert(row == (("h7.example", "/a/b")))
  }

  test("whole-stage codegen keeps custom expressions (no fallback)") {
    val df = spark.range(100)
      .select(concat(lit("https://X.example/a/../p"), $"id").as("u"))
      .select(canonicalize_url($"u").as("c"), extract_urls(lit("x https://a.ex/p1")).as("l"))
      .filter($"c".isNotNull)
    // "*(1)" prefixes = operators fused into whole-stage-codegen stage 1;
    // the custom expressions must appear inside a starred operator.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("canonicalize_url"), plan)
    assert(plan.contains("*(1) Filter"), plan)
    assert(df.count() == 100)
  }
}
