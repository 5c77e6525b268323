package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Deterministic subword (BPE) tokenization — the unit every training
  * token budget is denominated in (q20 counts, q53 export accounting,
  * q55 sequence packing).
  *
  * The model is the PINNED fixture `/graft/bpe_merges.tsv` on the
  * classpath (trained offline by [[graft.tools.BpeTrain]], committed;
  * mirrored verbatim into the DuckDB oracles via `read_csv` on the
  * same file — see TextOps.bpeCte).
  *
  * ENCODE CONTRACT [PINNED, mirrored in the oracle CTE]:
  *  - input is the word array produced by the repo-wide word grammar
  *    (`[a-z0-9]+` runs over `lower(text)`) — the expression takes the
  *    WORDS, not raw text, so both engines share the one
  *    already-gated pre-tokenizer;
  *  - per word: start from single characters; repeatedly merge the
  *    LEFTMOST occurrence of the LOWEST-RANK adjacent pair present in
  *    the merges table, until none applies (one occurrence per step —
  *    equivalent to batch merging for BPE rank tables, and trivially
  *    SQL-mirrorable);
  *  - token ids: 'a'..'z' -> 0..25, '0'..'9' -> 26..35, merge rank r
  *    -> 36 + r; if two merges produce the same string, the LOWEST id
  *    wins (first producer);
  *  - document encoding = concatenation of word encodings in order.
  *
  * Scale shape: map-only, zero shuffle; per-word results are memoized
  * in a bounded per-executor cache (word frequency is Zipfian, so at
  * 10^10 docs the hot vocabulary hits the cache and cold garbage
  * words stay cheap — encode is O(len·merges-applied) with len ≤ a
  * word's character count).
  */
object Bpe {

  private final class Model {
    val pairRank = new java.util.HashMap[String, Integer]()
    val tokId = new java.util.HashMap[String, Integer]()
    var nMerges = 0
  }

  private lazy val model: Model = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.tsv")
    require(in != null, "pinned BPE model /graft/bpe_merges.tsv missing from classpath")
    val m = new Model
    for (c <- 'a' to 'z') m.tokId.put(c.toString, c - 'a')
    for (c <- '0' to '9') m.tokId.put(c.toString, 26 + (c - '0'))
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().drop(1).foreach { ln =>
        val parts = ln.split("\t", -1)
        require(parts.length == 3, s"malformed merges row: '$ln'")
        val rank = parts(0).toInt
        m.pairRank.put(parts(1) + "\u0001" + parts(2), rank)
        val merged = parts(1) + parts(2)
        // first (lowest-rank) producer wins [PINNED — oracle: MIN(id)]
        if (!m.tokId.containsKey(merged)) m.tokId.put(merged, 36 + rank)
        m.nMerges += 1
      }
    } finally src.close()
    m
  }

  /** Bounded per-JVM word->ids memo (encode is a pure function of the
    * word; the cap only stops adversarial unbounded-vocab growth). */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private val MemoCap = 1 << 20

  def encodeWord(w: String): Array[Int] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val ids = computeIds(w)
    if (memo.size < MemoCap) memo.put(w, ids)
    ids
  }

  private def computeIds(w: String): Array[Int] = {
    val m = model
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    var done = syms.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = m.pairRank.get(syms.get(j) + "\u0001" + syms.get(j + 1))
        // strict < keeps the LEFTMOST occurrence of the lowest rank
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
        syms.remove(bestIdx + 1)
        if (syms.size < 2) done = true
      }
    }
    val out = new Array[Int](syms.size)
    var k = 0
    while (k < syms.size) {
      val id = m.tokId.get(syms.get(k))
      // unreachable for [a-z0-9]+ input (base alphabet covers it); the
      // sentinel keeps a foreign caller loud instead of silently wrong
      out(k) = if (id == null) -1 else id.intValue()
      k += 1
    }
    out
  }

  /** Whole-document encode: concat of per-word encodes in word order. */
  def encodeWords(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val parts = new Array[Array[Int]](n)
    var total = 0
    var i = 0
    while (i < n) {
      val p = encodeWord(words.getUTF8String(i).toString)
      parts(i) = p
      total += p.length
      i += 1
    }
    val out = new Array[Any](total)
    var o = 0
    i = 0
    while (i < n) {
      val p = parts(i)
      var j = 0
      while (j < p.length) { out(o) = p(j); o += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bpe_encode_words(words)` over an `array<string>` word column →
  * `array<int>` of subword token ids (see [[Bpe]] for the pinned
  * contract). */
case class BpeEncodeWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_words"
  override protected def nullSafeEval(ws: Any): Any =
    Bpe.encodeWords(ws.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.Bpe.encodeWords($w)")
  override protected def withNewChildInternal(c: Expression): BpeEncodeWords =
    copy(child = c)
}
