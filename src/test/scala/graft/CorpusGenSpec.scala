package graft

import graft.corpus.CorpusGen
import graft.urls.{UrlCanon, UrlExtract, UrlHash}
import org.apache.spark.sql.functions._

class CorpusGenSpec extends SparkTestBase {
  import spark.implicits._

  lazy val corpus = CorpusGen.build(CorpusGen.Smoke)

  test("distributed generation equals the driver-side build exactly") {
    import spark.implicits._
    val dir = CorpusGen.ensure(spark, CorpusGen.Smoke)
    val distHosting = CorpusGen.hosting(spark, dir)
      .as[CorpusGen.HostingRow].collect().sortBy(_.url_canon)
    val built = corpus.pages.map(p =>
      CorpusGen.HostingRow(graft.urls.UrlHash.hash64(p.url_canon), p.url_canon, p.host, p.doc_id, p.status))
      .sortBy(_.url_canon)
    assert(distHosting.toSeq == built)
    val distDocs = CorpusGen.interleaved(spark, dir)
      .as[CorpusGen.Doc].collect().sortBy(_.doc_id)
    assert(distDocs.toSeq == corpus.docs.sortBy(_.doc_id))
  }

  test("pages have unique canonical URLs and hashes") {
    val urls = corpus.pages.map(_.url_canon)
    assert(urls.distinct.size == urls.size)
    val hashes = urls.map(UrlHash.hash64)
    assert(hashes.distinct.size == hashes.size)
    urls.foreach(u => assert(UrlCanon.canonicalize(u) == u, s"not canonical: $u"))
  }

  test("every link in every doc canonicalizes to a hosted page") {
    val hosted = corpus.pages.map(_.url_canon).toSet
    val pageUrlOfDoc = corpus.pages.filter(_.doc_id.nonEmpty).map(p => p.doc_id -> p.url_canon).toMap
    var checked = 0
    corpus.docs.foreach { d =>
      val base = pageUrlOfDoc(d.doc_id)
      d.spans.filter(_.kind == "text").foreach { s =>
        UrlExtract.extract(s.text).foreach { raw =>
          val c = UrlCanon.canonicalize(raw, base)
          assert(c != null, s"raw=$raw base=$base")
          assert(hosted.contains(c), s"dangling link: raw=$raw canon=$c")
          checked += 1
        }
      }
    }
    assert(checked > 500, s"too few links exercised: $checked")
  }

  test("span offsets strictly increase and schema invariants hold") {
    corpus.docs.foreach { d =>
      val offs = d.spans.map(_.offset)
      assert(offs == offs.sorted && offs.distinct.size == offs.size, d.doc_id)
      d.spans.foreach { s =>
        if (s.kind == "text") assert(s.media_ref == "")
        else assert(s.text == "" && s.media_ref.nonEmpty)
      }
    }
  }

  test("parquet round-trip preserves span sequences byte-for-byte") {
    val dir = CorpusGen.ensure(spark, CorpusGen.Smoke)
    val back = CorpusGen.interleaved(spark, dir)
      .select($"doc_id", posexplode($"spans"))
      .select($"doc_id", $"pos", $"col.kind", $"col.text", $"col.media_ref", $"col.offset")
      .as[(String, Int, String, String, String, Int)]
      .collect()
      .groupBy(_._1)
    corpus.docs.foreach { d =>
      val got = back(d.doc_id).sortBy(_._2).map(t => (t._3, t._4, t._5, t._6)).toSeq
      val want = d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      assert(got == want, d.doc_id)
    }
  }

  test("zipf host distribution is skewed (salting is exercised)") {
    val byHost = corpus.pages.groupBy(_.host).view.mapValues(_.size)
    val max = byHost.values.max
    val mean = corpus.pages.size.toDouble / byHost.size
    assert(max > 5 * mean, s"max=$max mean=$mean")
  }

  test("robots rules exist and some hosted pages are disallowed") {
    val blockedPages = corpus.pages.filter(p => UrlCanon.pathOf(p.url_canon).startsWith("/blocked"))
    assert(blockedPages.nonEmpty)
    assert(corpus.rules.exists(r => !r.allow))
  }
}
