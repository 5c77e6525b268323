package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
import org.apache.spark.sql.graftinternal.Shim
import org.apache.spark.sql.types.StringType

/** Column-level API over the engine's custom Catalyst expressions —
  * the `org.apache.spark.sql.functions`-style surface of the library.
  */
package object functions {

  /** RFC 3986 canonical form of `url` resolved against canonical `base`
    * (null base = absolute URLs only). Null for invalid / non-http(s). */
  def canonicalize_url(url: Column, base: Column): Column =
    Shim.col(CanonicalizeUrl(Shim.expr(url), Shim.expr(base)))

  def canonicalize_url(url: Column): Column =
    Shim.col(CanonicalizeUrl(Shim.expr(url), Literal.create(null, StringType)))

  /** Links found in a text span, in document order (PINNED grammar). */
  def extract_urls(text: Column): Column =
    Shim.col(ExtractUrls(Shim.expr(text)))

  /** Host component of a canonical URL. */
  def host_of(canonicalUrl: Column): Column =
    Shim.col(HostOf(Shim.expr(canonicalUrl)))

  /** Path component of a canonical URL. */
  def path_of(canonicalUrl: Column): Column =
    Shim.col(PathOf(Shim.expr(canonicalUrl)))

  /** 64-bit URL identity: Spark's built-in xxhash64 (seed 42) of the
    * canonical form — BASELINE.json:6 "RFC 3986 normalize + xxHash64". */
  def url_hash(canonicalUrl: Column): Column = xxhash64(canonicalUrl)

  /** Skew-spreading salt in [0, k) for hot hosts (BASELINE.json:14). */
  def url_salt(canonicalUrl: Column, k: Int): Column =
    pmod(xxhash64(canonicalUrl), lit(k.toLong))

  /** Round-varying constants with round-stable generated code (see
    * [[RefLongLiteral]] — keeps the crawl loop's whole-stage codegen on
    * the janino compilation cache instead of recompiling per round). */
  def ref_long(v: Long): Column = Shim.col(RefLongLiteral(v))
  def ref_int(v: Int): Column = Shim.col(RefIntLiteral(v))
  def ref_double(v: Double): Column = Shim.col(RefDoubleLiteral(v))

  // ---- codegen vector kernels (array<double>) — see VectorExpressions --

  def vec_dot(a: Column, b: Column): Column =
    Shim.col(DotProduct(Shim.expr(a), Shim.expr(b)))

  def vec_cosine(a: Column, b: Column): Column =
    Shim.col(CosineSim(Shim.expr(a), Shim.expr(b)))

  def vec_dist2(a: Column, b: Column): Column =
    Shim.col(Dist2(Shim.expr(a), Shim.expr(b)))

  /** One LSH table's random-hyperplane signature from precomputed
    * weights (rows = bits, cols = vector dims). */
  def rhp_sig(vec: Column, weights: Array[Array[Double]]): Column =
    Shim.col(RhpSig(Shim.expr(vec), weights))

  /** Nearest-centroid id (IVF coarse quantizer); `cents` must be sorted
    * ascending by cid. */
  def nearest_centroid(vec: Column, cents: Array[(Int, Array[Double])]): Column =
    Shim.col(NearestCentroid(Shim.expr(vec), cents.map(_._1), cents.map(_._2)))

  /** The nprobe nearest cell ids by (dist2, cid). */
  def probe_cells(vec: Column, cents: Array[(Int, Array[Double])], nprobe: Int): Column =
    Shim.col(ProbeCells(Shim.expr(vec), cents.map(_._1), cents.map(_._2), nprobe))

  /** k MinHash signatures over word-3-shingles in one codegen pass —
    * see [[TextExpressions]]. */
  def minhash_sigs(words: Column, k: Int): Column =
    Shim.col(MinhashSigs(Shim.expr(words), k))

  /** 32-bit SimHash over a word multiset in one codegen pass. */
  def simhash32(words: Column): Column =
    Shim.col(SimHash32(Shim.expr(words)))

  /** Per-window n-gram hashes (one per n-word window, document order)
    * for substring-level duplicate detection — see [[TextExpressions]]. */
  def ngram_hashes(words: Column, n: Int): Column =
    Shim.col(NgramHashes(Shim.expr(words), n))

  /** Subword (BPE) token ids for a word array, one codegen pass over
    * the pinned merges fixture — see [[Bpe]] for the encode contract. */
  def bpe_encode_words(words: Column): Column =
    Shim.col(BpeEncodeWords(Shim.expr(words)))

  /** Per-language char-bigram Naive Bayes scores (quantized micro
    * log-probs, pinned lang order) — see [[LangId]]. */
  def nb_lang_scores(words: Column): Column =
    Shim.col(NbLangScores(Shim.expr(words)))
}
