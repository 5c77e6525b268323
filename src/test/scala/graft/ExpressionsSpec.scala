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
