package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Model-based language ID: char-bigram multinomial Naive Bayes over
  * the pinned fixture `/graft/langid_model.tsv` (trained offline by
  * [[graft.tools.LangIdTrain]], committed; the q58 DuckDB oracle
  * read_csv's the SAME file and recomputes the sums independently).
  *
  * SCORE CONTRACT [PINNED, see LangIdTrain for the model]: per doc,
  * per language, the score is the exact BIGINT sum of quantized
  * (1e-7-micro) log10 probabilities over every char bigram of every
  * word padded as "^w$"; an unseen bigram adds the lang's `<oov>`
  * value. Output order = LangCorpus.Langs (en, de, es, fr).
  *
  * Scale shape: map-only codegen pass, zero shuffle — the model is a
  * few KB of per-JVM state (an int-keyed char-pair table, no string
  * allocation in the hot loop), the fastText-deployment shape rather
  * than an explode + model-join (which would shuffle |doc|·|bigram|
  * rows at 10^10 docs; the ORACLE uses that join shape on 100 docs —
  * independence beats elegance there). */
object LangId {

  val NLangs = 4

  private final class Model {
    // key = (char1 << 16) | char2 of the bigram; values = NLangs micros
    val byPair = new java.util.HashMap[Integer, Array[Long]]()
    var oov: Array[Long] = _
  }

  private lazy val model: Model = {
    val in = getClass.getResourceAsStream("/graft/langid_model.tsv")
    require(in != null, "pinned langid model /graft/langid_model.tsv missing from classpath")
    val m = new Model
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().drop(1).foreach { ln =>
        val parts = ln.split("\t", -1)
        require(parts.length == 1 + NLangs, s"malformed model row: '$ln'")
        val ms = Array.tabulate(NLangs)(i => parts(i + 1).toLong)
        if (parts(0) == "<oov>") m.oov = ms
        else {
          require(parts(0).length == 2, s"non-bigram feature: '${parts(0)}'")
          m.byPair.put((parts(0).charAt(0) << 16) | parts(0).charAt(1), ms)
        }
      }
    } finally src.close()
    require(m.oov != null, "model is missing its <oov> row")
    m
  }

  /** Per-language micro-score sums for a word array (engine word
    * grammar output), in the pinned lang order. */
  def scores(words: ArrayData): ArrayData = {
    val m = model
    val sums = new Array[Long](NLangs)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      // bigrams of '^' + w + '$' without building the padded string
      var prev: Char = '^'
      var j = 0
      while (j <= w.length) {
        val cur: Char = if (j < w.length) w.charAt(j) else '$'
        val row = m.byPair.get((prev << 16) | cur)
        val add = if (row == null) m.oov else row
        var l = 0
        while (l < NLangs) { sums(l) += add(l); l += 1 }
        prev = cur
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sums.map(x => x: Any))
  }
}

/** `nb_lang_scores(words)` over an `array<string>` word column →
  * `array<long>` of per-language quantized NB scores (pinned lang
  * order; see [[LangId]]). */
case class NbLangScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nb_lang_scores"
  override protected def nullSafeEval(ws: Any): Any =
    LangId.scores(ws.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.LangId.scores($w)")
  override protected def withNewChildInternal(c: Expression): NbLangScores =
    copy(child = c)
}
