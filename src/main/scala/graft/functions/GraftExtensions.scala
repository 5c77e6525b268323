package graft

import graft.functions.{BpeEncodeWords, CanonicalizeUrl, NbLangScores, CosineSim, Dist2, DotProduct, ExtractUrls, HostOf, MinhashSigs, NgramHashes, PathOf, RhpSig, SimHash32}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Pmod, XxHash64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinternal.Shim
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

/** SQL surface of the library: registers every graft Catalyst expression
  * as a native SQL function, so the engine's kernels are reachable from
  * `spark.sql("...")` — not only the Scala Column API in
  * [[graft.functions]] — exactly like Spark's own built-ins (same
  * FunctionRegistry, same whole-stage codegen, no UDF wrapper anywhere).
  *
  * Two delivery paths, both tested (SqlSurfaceSpec):
  *
  *  - session build time: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the public `SparkSessionExtensions` hook — injectFunction);
  *  - an already-built session: `GraftExtensions.register(spark)`.
  *
  * Only state-free expressions are SQL-exposed. [[graft.crawl.RobotsAllows]]
  * and [[graft.crawl.BloomMightContain]] close over engine-side index
  * objects (a parsed robots rule table / a shard-file reader) that have no
  * SQL literal form — they stay Column-API/engine-internal by design.
  * Constant arguments (MinHash k, RHP weight matrix) must be foldable;
  * the builders evaluate them once at analysis time so the generated code
  * is identical to the Scala API's.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register the functions on an already-built session (idempotent —
    * re-registration replaces the identical builder). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      Shim.registerFunction(spark, id, info, builder)
    }

  // ---- builder plumbing ---------------------------------------------------

  private def arity(fn: String, args: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(args.length))
      throw new IllegalArgumentException(
        s"$fn expects ${ns.mkString(" or ")} argument(s), got ${args.length}")

  /** A constant non-negative Int argument (e.g. MinHash k), evaluated at
    * analysis time. */
  private def constInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"$fn: $arg must be a constant INT (e.g. 8), got ${e.sql}")
    val v = e.eval(null)
    require(v != null, s"$fn: $arg must not be NULL")
    v.asInstanceOf[Int]
  }

  /** A constant ARRAY<ARRAY<DOUBLE>> argument (the RHP weight matrix),
    * evaluated at analysis time. */
  private def constMatrix(fn: String, arg: String, e: Expression): Array[Array[Double]] = {
    val ok = e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _                                      => false
    }
    require(e.foldable && ok,
      s"$fn: $arg must be a constant ARRAY<ARRAY<DOUBLE>> " +
        s"(e.g. array(array(0.1d, -0.2d), ...)), got ${e.sql}")
    val ad = e.eval(null).asInstanceOf[ArrayData]
    require(ad != null, s"$fn: $arg must not be NULL")
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // ---- the function table -------------------------------------------------

  /** (identifier, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` and the FunctionRegistry share. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_canonicalize"),
      info("graft_canonicalize",
        "graft_canonicalize(url[, base]) - RFC 3986 canonical form of url, resolved against canonical base when given; NULL for invalid/non-http(s)."),
      args => {
        arity("graft_canonicalize", args, 1, 2)
        CanonicalizeUrl(args.head,
          if (args.length == 2) args(1) else Literal.create(null, StringType))
      }),
    (FunctionIdentifier("graft_extract_urls"),
      info("graft_extract_urls",
        "graft_extract_urls(text) - links found in a text span, in document order (PINNED grammar)."),
      args => { arity("graft_extract_urls", args, 1); ExtractUrls(args.head) }),
    (FunctionIdentifier("graft_host_of"),
      info("graft_host_of", "graft_host_of(canonical_url) - host component of a canonical URL."),
      args => { arity("graft_host_of", args, 1); HostOf(args.head) }),
    (FunctionIdentifier("graft_path_of"),
      info("graft_path_of", "graft_path_of(canonical_url) - path component of a canonical URL."),
      args => { arity("graft_path_of", args, 1); PathOf(args.head) }),
    (FunctionIdentifier("graft_url_hash"),
      info("graft_url_hash",
        "graft_url_hash(canonical_url) - 64-bit URL identity: xxhash64 (seed 42) of the canonical form."),
      args => { arity("graft_url_hash", args, 1); XxHash64(Seq(args.head), 42L) }),
    (FunctionIdentifier("graft_url_salt"),
      info("graft_url_salt",
        "graft_url_salt(canonical_url, k) - skew-spreading salt in [0, k) for hot hosts."),
      args => {
        arity("graft_url_salt", args, 2)
        Pmod(XxHash64(Seq(args.head), 42L),
          Literal(constInt("graft_url_salt", "k", args(1)).toLong))
      }),
    (FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "graft_vec_dot(a, b) - dot product of two ARRAY<DOUBLE> vectors (pinned IEEE fold order)."),
      args => { arity("graft_vec_dot", args, 2); DotProduct(args.head, args(1)) }),
    (FunctionIdentifier("graft_vec_cosine"),
      info("graft_vec_cosine", "graft_vec_cosine(a, b) - cosine similarity of two ARRAY<DOUBLE> vectors (pinned IEEE fold order)."),
      args => { arity("graft_vec_cosine", args, 2); CosineSim(args.head, args(1)) }),
    (FunctionIdentifier("graft_vec_dist2"),
      info("graft_vec_dist2", "graft_vec_dist2(a, b) - squared L2 distance of two ARRAY<DOUBLE> vectors."),
      args => { arity("graft_vec_dist2", args, 2); Dist2(args.head, args(1)) }),
    (FunctionIdentifier("graft_rhp_sig"),
      info("graft_rhp_sig",
        "graft_rhp_sig(vec, weights) - random-hyperplane LSH signature; weights is a constant ARRAY<ARRAY<DOUBLE>> (rows = bits)."),
      args => {
        arity("graft_rhp_sig", args, 2)
        RhpSig(args.head, constMatrix("graft_rhp_sig", "weights", args(1)))
      }),
    (FunctionIdentifier("graft_minhash_sigs"),
      info("graft_minhash_sigs",
        "graft_minhash_sigs(words, k) - k MinHash signatures over word-3-shingles in one codegen pass; k is a constant INT."),
      args => {
        arity("graft_minhash_sigs", args, 2)
        MinhashSigs(args.head, constInt("graft_minhash_sigs", "k", args(1)))
      }),
    (FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32", "graft_simhash32(words) - 32-bit SimHash over a word multiset in one codegen pass."),
      args => { arity("graft_simhash32", args, 1); SimHash32(args.head) }),
    (FunctionIdentifier("graft_ngram_hashes"),
      info("graft_ngram_hashes",
        "graft_ngram_hashes(words, n) - per-window n-gram hashes (one per n-word window, document order) for substring-level duplicate detection; n is a constant INT."),
      args => {
        arity("graft_ngram_hashes", args, 2)
        NgramHashes(args.head, constInt("graft_ngram_hashes", "n", args(1)))
      }),
    (FunctionIdentifier("graft_bpe_encode"),
      info("graft_bpe_encode",
        "graft_bpe_encode(words) - subword (BPE) token ids for an ARRAY<STRING> word column, one codegen pass over the pinned merges fixture."),
      args => { arity("graft_bpe_encode", args, 1); BpeEncodeWords(args.head) }),
    (FunctionIdentifier("graft_nb_lang_scores"),
      info("graft_nb_lang_scores",
        "graft_nb_lang_scores(words) - per-language char-bigram Naive Bayes scores (quantized micro log-probs, pinned lang order) over the pinned model fixture."),
      args => { arity("graft_nb_lang_scores", args, 1); NbLangScores(args.head) })
  )
}
