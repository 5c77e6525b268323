package graft.tools

import graft.corpus.LangCorpus
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Offline trainer for the char-bigram Naive Bayes language-ID model —
  * run ONCE, output committed as the pinned fixture
  * `src/main/resources/graft/langid_model.tsv` (read by the
  * [[graft.functions.LangId]] kernel and, via read_csv on the same
  * committed file, by the q58 DuckDB oracle).
  *
  * MODEL [PINNED, mirrored in kernel + oracle]:
  *  - features: character bigrams of each word padded with boundary
  *    markers, i.e. bigrams of "^w$", words under the repo grammar
  *    ([a-z0-9]+ over lower(text)); every occurrence counts
  *    (multinomial NB);
  *  - per (lang L, feature f): logprob = log10((c(L,f) + 1) /
  *    (total(L) + V)) with V = |global feature vocabulary| (add-one
  *    smoothing); an UNSEEN feature scores the lang's OOV value
  *    log10(1 / (total(L) + V)) — the c=0 case of the same formula,
  *    stored once under the reserved feature key `<oov>`;
  *  - every logprob is quantized to integer MICROS (scale 1e-7,
  *    HALF_UP) at train time — document scores are then exact BIGINT
  *    sums, bit-identical across engines regardless of fold order
  *    (the q54 decimal-quantization trick, taken to integers);
  *  - prediction = argmax score in the pinned lang order
  *    en > de > es > fr on ties (first max wins).
  *
  * Trained on the LangCorpus training fold (doc_id % 5 != 0).
  *
  * Usage: runMain graft.tools.LangIdTrain [outTsv]
  */
object LangIdTrain {

  /** 1e-7 quantization scale [PINNED]. */
  val Scale = 7

  val OovKey = "<oov>"

  def wordsOf(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toSeq

  def bigrams(w: String): Seq[String] = {
    val p = "^" + w + "$"
    (0 until p.length - 1).map(i => p.substring(i, i + 2))
  }

  private def micros(logp: Double): Long =
    JBigDecimal.valueOf(logp).setScale(Scale, RoundingMode.HALF_UP)
      .movePointRight(Scale).longValueExact()

  /** (feature -> per-lang micros in LangCorpus.Langs order, including
    * the `<oov>` row), rows sorted by feature for a stable file. */
  def trainModel(docs: Seq[(String, String)]): Seq[(String, Array[Long])] = {
    val langs = LangCorpus.Langs
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach { case (lang, text) =>
      wordsOf(text).foreach { w =>
        bigrams(w).foreach { f =>
          counts.updateWith((lang, f))(v => Some(v.getOrElse(0L) + 1))
          totals.updateWith(lang)(v => Some(v.getOrElse(0L) + 1))
        }
      }
    }
    val vocabulary = counts.keysIterator.map(_._2).toSet
    val v = vocabulary.size
    def row(f: String): Array[Long] = langs.map { l =>
      val c = counts.getOrElse((l, f), 0L)
      micros(math.log10((c + 1).toDouble / (totals.getOrElse(l, 0L) + v).toDouble))
    }.toArray
    val oov = langs.map(l =>
      micros(math.log10(1.0 / (totals.getOrElse(l, 0L) + v).toDouble))).toArray
    (OovKey -> oov) +: vocabulary.toSeq.sorted.map(f => f -> row(f))
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "src/main/resources/graft/langid_model.tsv"
    val train = LangCorpus.docs.filterNot(d => LangCorpus.isTest(d._1.toInt))
      .map(d => (d._2, d._3))
    val model = trainModel(train)
    val w = new java.io.PrintWriter(out, "UTF-8")
    try {
      w.print("feature\t" + LangCorpus.Langs.map("m_" + _).mkString("\t") + "\n")
      model.foreach { case (f, ms) => w.print(f + "\t" + ms.mkString("\t") + "\n") }
    } finally w.close()
    println(s"wrote ${model.size} rows (incl. $OovKey) to $out " +
      s"from ${train.size} training docs")
  }
}
