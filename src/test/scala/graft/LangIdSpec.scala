package graft

import graft.corpus.LangCorpus
import graft.tools.LangIdTrain
import org.apache.spark.sql.functions._

/** Model-based language ID (q58): the committed model fixture is pinned
  * against its trainer, the engine kernel is pinned against an
  * independent sequential NB scorer, and the model must beat the q22
  * marker-stopword heuristic on the held-out fold. */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val committed: Seq[(String, Array[Long])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/langid_model.tsv"), "UTF-8")
    try src.getLines().drop(1).map { ln =>
      val p = ln.split("\t", -1)
      p(0) -> p.drop(1).map(_.toLong)
    }.toList
    finally src.close()
  }

  private lazy val testDocs = LangCorpus.docs.filter(d => LangCorpus.isTest(d._1.toInt))

  /** Independent scorer over the COMMITTED table (map-based, driver
    * side — disjoint from the kernel's int-keyed loop). */
  private def refScores(text: String): Seq[Long] = {
    val table = committed.toMap
    val oov = table("<oov>")
    val sums = Array.fill(4)(0L)
    LangIdTrain.wordsOf(text).foreach { w =>
      LangIdTrain.bigrams(w).foreach { f =>
        val row = table.getOrElse(f, oov)
        (0 until 4).foreach(i => sums(i) += row(i))
      }
    }
    sums.toSeq
  }

  private def argmax(s: Seq[Long]): String = // pinned first-max-wins order
    LangCorpus.Langs(s.indices.maxBy(i => (s(i), -i)))

  test("committed model fixture equals a fresh deterministic retrain " +
      "(no generator/fixture drift)") {
    val train = LangCorpus.docs.filterNot(d => LangCorpus.isTest(d._1.toInt))
      .map(d => (d._2, d._3))
    val fresh = LangIdTrain.trainModel(train)
    assert(fresh.size == committed.size,
      s"rows: fresh=${fresh.size} committed=${committed.size} — regenerate the fixture")
    fresh.zip(committed).foreach { case ((ff, fm), (cf, cm)) =>
      assert(ff == cf && fm.sameElements(cm),
        s"model drift at feature '$ff'/'$cf' — rerun graft.tools.LangIdTrain and commit")
    }
  }

  test("engine q58 scores equal the independent sequential scorer on " +
      "every held-out doc; accuracy >= 0.95") {
    val df = SparkEntry.queries("q58_langid_model")(spark, "/root/testdata/sf0.001")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1),
      Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)), r.getString(6)))
    assert(got.length == testDocs.size)
    var correct = 0
    got.zip(testDocs).foreach { case ((id, lang, sc, pred), (rid, rlang, text)) =>
      assert(id == rid && lang == rlang)
      val want = refScores(text)
      assert(sc == want, s"doc $id: engine=$sc ref=$want")
      assert(pred == argmax(want), s"doc $id: pred=$pred want=${argmax(want)}")
      if (pred == lang) correct += 1
    }
    val acc = correct.toDouble / got.length
    info(f"NB held-out accuracy: $acc%.3f ($correct/${got.length})")
    assert(acc >= 0.95, f"model accuracy degraded: $acc%.3f")
  }

  test("NB model beats the q22 marker-stopword heuristic on the same " +
      "held-out docs") {
    // the q22 heuristic, verbatim markers and tie order
    def heuristic(text: String): String = {
      val ws = LangIdTrain.wordsOf(text)
      def sc(m: Set[String]) = ws.count(m)
      val (en, de, es, fr) = (sc(Set("the", "and", "of", "is")),
        sc(Set("der", "die", "und", "das")),
        sc(Set("el", "la", "que", "los")),
        sc(Set("le", "les", "des", "est")))
      if (en >= de && en >= es && en >= fr) "en"
      else if (de >= es && de >= fr) "de"
      else if (es >= fr) "es" else "fr"
    }
    val nbAcc = testDocs.count { case (_, lang, text) =>
      argmax(refScores(text)) == lang }.toDouble / testDocs.size
    val heurAcc = testDocs.count { case (_, lang, text) =>
      heuristic(text) == lang }.toDouble / testDocs.size
    info(f"held-out accuracy: NB=$nbAcc%.3f heuristic=$heurAcc%.3f")
    assert(nbAcc >= heurAcc,
      f"NB ($nbAcc%.3f) must be at least the heuristic ($heurAcc%.3f)")
  }

  test("graft_nb_lang_scores SQL surface matches the Column API") {
    val df = Seq(Seq("der", "die", "internet"), Seq("the", "of")).toDF("ws")
    df.createOrReplaceTempView("langid_t")
    val viaSql = spark.sql("SELECT graft_nb_lang_scores(ws) AS s FROM langid_t").collect().toSeq
    val viaDsl = df.select(graft.functions.nb_lang_scores(col("ws")).as("s")).collect().toSeq
    assert(viaSql == viaDsl)
  }
}
