package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen text kernels for the dedup family.
  *
  * The MinHash signature pipeline (q24/q25, and the shape every
  * shingle-dedup job at corpus scale runs per document) was staged as
  * FOUR higher-order-function projections — shingles, md5-as-hex,
  * conv(substring) × 2 into structs, then k × array_min(transform) —
  * all interpreted, each materializing an intermediate array per row,
  * with the digest round-tripped through hex strings and base-10
  * conversion. At 10^9 documents that is the hot kernel of the dedup
  * pipeline. [[TextRT.minhashSigs]] computes the identical values in
  * ONE pass: word bytes are extracted once, each 3-shingle is digested
  * directly (word bytes + 0x20 joins — no shingle string is ever
  * built), a/b are read straight off the digest bytes, and the k
  * running minima update in place.
  *
  * Value contract (pinned by MinhashSigsSpec equality vs the HOF form,
  * and by q24/q25's DuckDB oracle): md5 over the UTF-8 shingle string
  * "w1 w2 w3"; `a` = hex chars 1-14 = digest bytes 0..6 big-endian,
  * `b` = hex chars 17-30 = digest bytes 8..14 big-endian; signature j
  * is min over shingles of a + j*b (Long wrap-around arithmetic, same
  * as the former ANSI-safe < 2^59 values); fewer than 3 words → one
  * shingle of all words space-joined (shingles3's `otherwise` branch).
  */
object TextRT {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SP: Byte = ' '.toByte

  /** 32-bit SimHash over a word multiset: per word, h = md5's first 4
    * bytes big-endian (= hex chars 1-8 as a base-16 BIGINT, the q26
    * formula); each of the 32 bit positions accumulates +1/−1 by bit i
    * of h; output bit i set iff its count is strictly positive. The
    * former q26 shape EXPLODED words × 32 bit-rows through two shuffled
    * aggregations — a 32·|words| row blow-up per document that this
    * kernel replaces with one pass and zero shuffles. */
  def simhash32(words: ArrayData): Long = {
    val counts = new Array[Int](32)
    val md = md5.get()
    val n = words.numElements()
    var w = 0
    while (w < n) {
      md.reset()
      val digest = md.digest(words.getUTF8String(w).getBytes)
      var h = 0L
      var t = 0
      while (t < 4) { h = (h << 8) | (digest(t) & 0xFFL); t += 1 }
      var i = 0
      while (i < 32) {
        if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      w += 1
    }
    var sh = 0L
    var i = 0
    while (i < 32) { if (counts(i) > 0) sh |= (1L << i); i += 1 }
    sh
  }

  def minhashSigs(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { wb(i) = words.getUTF8String(i).getBytes; i += 1 }
    val md = md5.get()
    val sigs = Array.fill(k)(Long.MaxValue)

    def fold(digest: Array[Byte]): Unit = {
      var a = 0L; var b = 0L
      var t = 0
      while (t < 7) {
        a = (a << 8) | (digest(t) & 0xFFL)
        b = (b << 8) | (digest(t + 8) & 0xFFL)
        t += 1
      }
      var j = 0; var h = a
      while (j < k) { if (h < sigs(j)) sigs(j) = h; h += b; j += 1 }
    }

    if (n >= 3) {
      var s = 0
      while (s <= n - 3) {
        md.reset()
        md.update(wb(s)); md.update(SP)
        md.update(wb(s + 1)); md.update(SP)
        md.update(wb(s + 2))
        fold(md.digest())
        s += 1
      }
    } else {
      md.reset()
      var w = 0
      while (w < n) { if (w > 0) md.update(SP); md.update(wb(w)); w += 1 }
      fold(md.digest())
    }
    new GenericArrayData(sigs.map(x => x: Any))
  }

  /** Per-window n-gram hashes for substring-level duplicate detection
    * (q40): for each window of n consecutive words, the 56-bit
    * big-endian value of md5 digest bytes 0..6 (= hex chars 1-14) over
    * the UTF-8 window string "w1 w2 ... wn" — exactly the `a` value
    * [[minhashSigs]] folds, so the DuckDB mirror is
    * `CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)` over the same
    * space-joined window. One md5 per window, no window string ever
    * built. Fewer than n words → EMPTY array (a doc too short to hold
    * one full window has no windows; no all-words fallback — mirrored
    * by the oracle's ELSE []). 56 bits keep every value non-negative
    * and inside DuckDB's BIGINT hex-cast range. */
  def ngramHashes(words: ArrayData, n: Int): ArrayData = {
    val cnt = words.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val wb = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) { wb(i) = words.getUTF8String(i).getBytes; i += 1 }
    val md = md5.get()
    val out = new Array[Any](cnt - n + 1)
    var s = 0
    while (s <= cnt - n) {
      md.reset()
      var w = 0
      while (w < n) { if (w > 0) md.update(SP); md.update(wb(s + w)); w += 1 }
      val digest = md.digest()
      var a = 0L; var t = 0
      while (t < 7) { a = (a << 8) | (digest(t) & 0xFFL); t += 1 }
      out(s) = a
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `simhash32(words)` over an `array<string>` word column → LongType. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override protected def nullSafeEval(ws: Any): Any =
    TextRT.simhash32(ws.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.TextRT.simhash32($w)")
  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}

/** `minhash_sigs(words, k)` over an `array<string>` word column →
  * `array<long>` of k signatures. */
case class MinhashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override protected def nullSafeEval(ws: Any): Any =
    TextRT.minhashSigs(ws.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.TextRT.minhashSigs($w, $k)")
  override protected def withNewChildInternal(c: Expression): MinhashSigs =
    copy(child = c)
}

/** `ngram_hashes(words, n)` over an `array<string>` word column →
  * `array<long>` of per-window hashes, one per n-word window in
  * document order (see [[TextRT.ngramHashes]]). */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1: $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"
  override protected def nullSafeEval(ws: Any): Any =
    TextRT.ngramHashes(ws.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.TextRT.ngramHashes($w, $n)")
  override protected def withNewChildInternal(c: Expression): NgramHashes =
    copy(child = c)
}
