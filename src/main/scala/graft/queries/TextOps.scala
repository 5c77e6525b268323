package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Training-data text pipeline ops over the `documents` table: token
  * counting, quality scoring, language-ID heuristic, exact + MinHash/LSH +
  * SimHash + n-gram-Jaccard deduplication, document fingerprinting.
  *
  * Every hash used here is md5 (not xxhash64) so the DuckDB oracle can
  * reproduce it bit-for-bit; MinHash minimizes md5 hex strings
  * lexicographically — an order-isomorphic substitute for integer
  * min-hashing that both engines share exactly.
  *
  * The raw documents table has no duplicates, so the dedup queries append
  * deterministic duplicate/near-duplicate rows inline (same formula in
  * the SQL oracle): exact copies at doc_id+1000000 for doc_id % 10 == 0,
  * tail-mutated copies at doc_id+2000000 for doc_id % 7 == 0.
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  private[graft] def words(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** The pinned NB argmax (first max wins in en, de, es, fr order) —
    * single-sourced between q58 and the q60 crawl-curation pipeline. */
  private[graft] def nbArgmax(en: Column, de: Column, es: Column, fr: Column): Column =
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")

  /** documents ∪ exact dups ∪ near dups (deterministic, mirrored in SQL). */
  private def docsAugmented(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    d.unionByName(
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" zz9 extra tail words")).as("text")))
  }

  private val docsAugmentedSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      |UNION ALL SELECT doc_id + 2000000 AS doc_id, text || ' zz9 extra tail words' AS text
      |  FROM documents WHERE doc_id % 7 = 0""".stripMargin

  /** Absolute-path twin of the classpath BPE fixture the engine kernel
    * loads ([[graft.functions.Bpe]]) — the oracle reads the SAME
    * committed file via read_csv, so a model/oracle drift is
    * structurally impossible. */
  private[graft] val BpeMergesPath =
    "/root/repo/src/main/resources/graft/bpe_merges.tsv"

  /** Same twin arrangement for the langid NB model fixture
    * ([[graft.functions.LangId]]). */
  private[graft] val LangModelPath =
    "/root/repo/src/main/resources/graft/langid_model.tsv"

  /** DuckDB mirror of the pinned BPE encode ([[graft.functions.Bpe]]):
    * given `docsSql` yielding (doc_id, text), produces CTEs
    * `dws(doc_id, ws)` (the word arrays under the repo word grammar)
    * and `bpe(doc_id, ids)` (the per-doc subword id sequence). The
    * encode loop is a recursive CTE over DISTINCT words — one merge of
    * the leftmost lowest-rank adjacent pair per recursion step, exactly
    * the kernel's loop — then words map back to docs through an
    * order-preserving list_transform (no unnest ordering relied on).
    * Embed under `WITH RECURSIVE`. */
  private[graft] def bpeCte(docsSql: String): String =
    s"""bm AS (SELECT CAST("rank" AS INT) AS rank, l, r, l || r AS merged
       |  FROM read_csv('$BpeMergesPath', delim='\t', header=true,
       |       columns={'rank':'INTEGER','l':'VARCHAR','r':'VARCHAR'})),
       |pmap AS (SELECT map(list(l || chr(1) || r ORDER BY rank), list(rank ORDER BY rank)) AS pm FROM bm),
       |vmap AS (SELECT map(list(tok), list(id)) AS vm FROM (
       |  SELECT tok, MIN(id) AS id FROM (
       |    SELECT chr(CAST(97 + i AS INT)) AS tok, CAST(i AS INT) AS id FROM range(26) t(i)
       |    UNION ALL SELECT chr(CAST(48 + i AS INT)), CAST(26 + i AS INT) FROM range(10) t(i)
       |    UNION ALL SELECT merged, 36 + rank FROM bm) GROUP BY tok)),
       |dws AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM ($docsSql)),
       |uw AS (SELECT DISTINCT unnest(ws) AS w FROM dws),
       |enc(w, ts) AS (
       |  SELECT w, list_transform(range(1, length(w) + 1), i -> w[CAST(i AS INT)]) FROM uw
       |  UNION ALL
       |  SELECT w, list_concat(list_concat(ts[1:bi-1], [ts[bi] || ts[bi+1]]), ts[bi+2:len(ts)])
       |  FROM (SELECT w, ts, CASE WHEN best IS NULL THEN NULL
       |               ELSE list_position(rks, best) END AS bi
       |        FROM (SELECT w, ts, rks, list_min(list_filter(rks, x -> x IS NOT NULL)) AS best
       |              FROM (SELECT e.w, e.ts, list_transform(range(1, len(e.ts)),
       |                       i -> map_extract(p.pm, e.ts[CAST(i AS INT)] || chr(1) || e.ts[CAST(i+1 AS INT)])[1]) AS rks
       |                    FROM enc e, pmap p)))
       |  WHERE bi IS NOT NULL),
       |encf AS (SELECT w, arg_min(ts, len(ts)) AS ts FROM enc GROUP BY w),
       |wids AS (SELECT w, list_transform(ts, t -> map_extract(v.vm, t)[1]) AS ids FROM encf, vmap v),
       |wmap AS (SELECT map(list(w), list(ids)) AS wm FROM wids),
       |bpe AS (SELECT d.doc_id, flatten(list_transform(d.ws, w -> map_extract(m.wm, w)[1])) AS ids
       |        FROM dws d, wmap m)""".stripMargin

  /** Word-3-shingles over an ALREADY-MATERIALIZED words column. `ws`
    * must be a physical attribute, not the regexp subtree: higher-order
    * functions evaluate interpreted, so a lambda that references a
    * non-attribute child re-evaluates that whole subtree PER ELEMENT —
    * with `words(text)` inlined here, every shingle re-ran the regexp
    * over the full text (O(words²) per doc; this, not hashing, was most
    * of q25's round-1 wall time). */
  private def shingles3(ws: Column): Column = {
    val n = size(ws)
    when(n >= 3,
      transform(sequence(lit(1), n - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  /** Appends `out` = array of k numeric MinHash signatures over
    * word-3-shingles: ONE md5 per shingle, k hash functions derived
    * arithmetically as h_j = a + j*b with a/b the first/second 56-bit
    * halves of the digest (the classic two-hash construction —
    * Kirsch–Mitzenmacher). 56-bit halves keep a + 7b < 2^59, safe under
    * ANSI LongType.
    *
    * Round 4: ONE codegen pass ([[graft.functions.TextRT.minhashSigs]])
    * replacing four interpreted HOF projections — word bytes extracted
    * once, shingles digested directly (no shingle strings, no hex
    * round-trip, no per-element lambda dispatch), k minima updated in
    * place. Values are pinned bit-identical to the previous staged HOF
    * form ([[minhashSigsHofForm]], kept as the in-repo oracle for
    * MinhashSigsSpec's equality property test) and to q24/q25's DuckDB
    * SQL. */
  private def withMinhashSigs(df: DataFrame, text: Column, k: Int, out: String): DataFrame =
    df.withColumn(out, graft.functions.minhash_sigs(words(text), k))

  /** MinHash+LSH near-dup pairs over ANY (doc_id, text) frame — the
    * q25 pipeline, single-sourced between q25 (augmented documents) and
    * the q60 crawl-curation pipeline (the crawl's own packed corpus;
    * doc_id type is generic — long there, string here). 4 bands × 2
    * rows, band buckets larger than BUCKET_CAP dropped before the
    * self-join [PINNED — an adversarial corpus of near-identical docs
    * would otherwise make the bucket join quadratic in the largest
    * bucket; the same cap is applied in the oracle SQL], candidates
    * confirmed by word-set Jaccard ≥ 0.5. Returns a PERSISTED frame —
    * ownership transfers to the caller. */
  private[graft] def lshNearDupPairs(base: DataFrame): DataFrame = {
    val BUCKET_CAP = 64
    val ws = words(col("text"))
    val sigged = withMinhashSigs(base, col("text"), 8, "sigs")
      .select(col("doc_id"), array_distinct(ws).as("wset"), col("sigs")).persist()
    sigged.count() // materialize before the fan-out
    val banded = sigged.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        md5(concat(element_at(col("sigs"), b * 2 + 1).cast("string"), lit("_"),
          element_at(col("sigs"), b * 2 + 2).cast("string")))))
        .as(Seq("band_id", "band_key")))
    // mega-bucket cap: hot buckets are few — broadcast anti-join them out
    val hot = banded.groupBy("band_id", "band_key").count()
      .filter(col("count") > BUCKET_CAP).select("band_id", "band_key")
    val pruned = banded.join(broadcast(hot), Seq("band_id", "band_key"), "left_anti")
    val a = pruned.select(col("band_id"), col("band_key"), col("doc_id").as("doc_a"))
    val b = pruned.select(col("band_id"), col("band_key"), col("doc_id").as("doc_b"))
    // candidate pairs on ids only (cheap distinct), word sets joined back
    val pairs = a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val wa = sigged.select(col("doc_id").as("doc_a"), col("wset").as("wset_a"))
    val wb = sigged.select(col("doc_id").as("doc_b"), col("wset").as("wset_b"))
    val out = pairs.join(wa, Seq("doc_a")).join(wb, Seq("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("wset_a"), col("wset_b"))).cast("double") /
          size(array_union(col("wset_a"), col("wset_b"))), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
      // materialize the (small) verified-pairs result while the
      // signature cache is hot, then release the INTERNAL cache — the
      // round-3 form returned with `sigged` still persisted, leaking
      // one cached table per standalone call (review finding). The
      // returned frame stays persisted; ownership transfers to the
      // caller (Bench/Verify/QueriesSpec unpersist after consuming).
      .persist()
    out.count()
    sigged.unpersist(false)
    out
  }

  /** The pre-round-4 staged-HOF signature pipeline, kept ONLY as the
    * independent oracle for the codegen kernel's equality test. Staged
    * as several small projections on purpose: the md5/conv subtree
    * inlined 8–16× made janino compilation alone ~70 s at the bench
    * tier; `__ab` is referenced 8× so CollapseProject keeps the stages
    * separate. */
  private[graft] def minhashSigsHofForm(df: DataFrame, text: Column, k: Int,
                                        out: String): DataFrame =
    df.withColumn("__ws", words(text))
      .withColumn("__sh", shingles3(col("__ws")))
      .withColumn("__m", transform(col("__sh"), x => md5(x)))
      .withColumn("__ab", transform(col("__m"), m => struct(
        conv(substring(m, 1, 14), 16, 10).cast("long").as("a"),
        conv(substring(m, 17, 14), 16, 10).cast("long").as("b"))))
      .withColumn(out, array((0 until k).map(j =>
        array_min(transform(col("__ab"), p =>
          p.getField("a") + lit(j.toLong) * p.getField("b")))): _*))
      .drop("__ws", "__sh", "__m", "__ab")

  private def minhashSigSql(k: Int): String = {
    // expects CTE alias `sh(doc_id, shingles)`; one element per hash fn
    def aSql = "CAST('0x' || substr(md5(x), 1, 14) AS BIGINT)"
    def bSql = "CAST('0x' || substr(md5(x), 17, 14) AS BIGINT)"
    (0 until k)
      .map(j => s"CAST(list_min(list_transform(shingles, x -> $aSql + $j * $bSql)) AS VARCHAR)")
      .mkString(" || '|' || ")
  }

  private def minhashSigsSql(k: Int): String =
    s"list_transform(range(0, $k), j -> list_min(list_transform(shingles, " +
      "x -> CAST('0x' || substr(md5(x), 1, 14) AS BIGINT) + j * CAST('0x' || substr(md5(x), 17, 14) AS BIGINT))))"

  private val shinglesSqlCte: String =
    """WITH d AS (%s),
      |w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM d),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE [array_to_string(ws, ' ')] END AS shingles
      | FROM w)""".stripMargin

  /** The [PINNED] q49 sampling rule over a (doc_id, lang) frame —
    * single-sourced between q49 and the composed pipeline q56. Per-10
    * keep rates: en 9, de/fr/es 6, zh 3, anything else 2; membership =
    * integer compare u₅₆·10 < num·2⁵⁶ on the first 56 md5 bits of
    * "mix42_"‖doc_id (no float boundary); weight = 1/rate. */
  private[graft] def mixtureSample(docs: DataFrame): DataFrame = {
    val u56 = conv(substring(
      md5(concat(lit("mix42_"), col("doc_id").cast("string"))), 1, 14), 16, 10)
      .cast("long")
    val num = when(col("lang") === "en", 9)
      .when(col("lang").isin("de", "fr", "es"), 6)
      .when(col("lang") === "zh", 3)
      .otherwise(2).cast("long")
    docs
      .select(col("doc_id"), col("lang"), u56.as("u"), num.as("num"))
      .filter(col("u") * lit(10L) < col("num") * lit(72057594037927936L)) // 2^56
      .withColumn("weight", round(lit(10.0) / col("num"), 4))
      .select("doc_id", "lang", "weight")
      .orderBy("doc_id")
  }

  /** The q49 sampling rule's SQL mirror over a source providing
    * (doc_id, lang) — parameterized by the source subquery. */
  private[graft] def mixtureSampleSql(source: String): String =
    s"""SELECT doc_id, lang, round(10.0 / num, 4) AS weight FROM (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substr(md5('mix42_' || CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) AS u,
       |    CASE WHEN lang = 'en' THEN 9 WHEN lang IN ('de','fr','es') THEN 6
       |         WHEN lang = 'zh' THEN 3 ELSE 2 END AS num
       |  FROM ($source))
       |WHERE u * 10 < num * 72057594037927936
       |ORDER BY doc_id""".stripMargin

  /** q55's packing over a (doc_id, n_tok) frame. `bucketWidth` shapes
    * only the two-phase decomposition — the OUTPUT is invariant to it
    * (pinned by a QueriesSpec test at two widths), which is exactly the
    * scale claim: at 10^10 docs the width is raised (or the trick
    * recursed on the bucket table) without changing a single row. */
  private[graft] def seqPacking(docs: DataFrame, bucketWidth: Long = 64L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 1024L // token budget per packed sequence [PINNED]
    val d = docs.withColumn("bkt", floor(col("doc_id") / lit(bucketWidth)).cast("long"))
    val wIn = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val fine = d.withColumn("run_in", coalesce(sum("n_tok").over(wIn), lit(0L)))
    val wB = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("bkt").agg(sum("n_tok").as("tot"))
      .withColumn("off", coalesce(sum("tot").over(wB), lit(0L)))
      .select("bkt", "off")
    val carry = // continuity columns (e.g. n_words) ride along untouched
      docs.columns.filterNot(Set("doc_id", "n_tok", "bkt")).map(col).toSeq
    fine.join(offsets, Seq("bkt"))
      .withColumn("start_tok", col("off") + col("run_in"))
      .select(Seq(col("doc_id"), col("n_tok")) ++ carry ++ Seq(col("start_tok"),
        floor(col("start_tok") / lit(B)).cast("long").as("seq_id"),
        (col("start_tok") % lit(B)).as("seq_off")): _*)
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(

    // token counting: whitespace tokens, grammar words, and (round 5)
    // the real unit — subword BPE tokens from the pinned merges fixture
    "q20_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("n_tokens"),
          size(words(col("text"))).as("n_words"),
          size(graft.functions.bpe_encode_words(words(col("text")))).as("n_bpe"),
          length(col("text")).as("n_chars_c"))
        .orderBy("doc_id")
    }),

    // subword (BPE) tokenization — the full id sequence, oracle-gated
    // end-to-end: doc -> words -> leftmost-lowest-rank merges -> ids.
    // Map-only (one codegen pass per row, memoized per-word kernel);
    // the augmented rows exercise out-of-vocabulary words ('zz9',
    // 'extra', ...) through the character fallback.
    "q57_bpe_tokens" -> ((s, dir) => {
      val base = docsAugmented(s, dir)
      base.select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n_words"),
          graft.functions.bpe_encode_words(col("ws")).as("ids"))
        .select(col("doc_id"), col("n_words"), size(col("ids")).as("n_bpe"),
          array_join(transform(col("ids"), x => x.cast("string")), "|").as("bpe_ids"))
        .orderBy("doc_id")
    }),

    // quality scoring: stopword ratio + length bucket
    "q21_quality" -> ((s, dir) => {
      val ws = words(col("text"))
      val stops = size(filter(ws, w => w.isin("the", "a", "of", "and", "in")))
      val nw = size(ws)
      t(s, dir, "documents")
        .select(col("doc_id"), nw.as("n_words"), stops.as("n_stop"),
          round(stops.cast("double") / greatest(nw, lit(1)), 4).as("stop_ratio"))
        .withColumn("quality",
          when(col("n_words") >= 20 && col("stop_ratio") <= 0.5, "ok").otherwise("low"))
        .orderBy("doc_id")
    }),

    // language-ID: marker-stopword scores, argmax with pinned tie order
    "q22_langid" -> ((s, dir) => {
      val ws = words(col("text"))
      def score(markers: Seq[String]) = size(filter(ws, w => w.isin(markers: _*)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          score(Seq("the", "and", "of", "is")).as("s_en"),
          score(Seq("der", "die", "und", "das")).as("s_de"),
          score(Seq("el", "la", "que", "los")).as("s_es"),
          score(Seq("le", "les", "des", "est")).as("s_fr"))
        .withColumn("lang_pred",
          nbArgmax(col("s_en"), col("s_de"), col("s_es"), col("s_fr")))
        .orderBy("doc_id")
    }),

    // model-based language ID (q58): char-bigram multinomial Naive
    // Bayes over the pinned model fixture (LangIdTrain), scored on the
    // held-out fold of the multilingual fixture corpus (LangCorpus —
    // the driver documents.lang label is uncorrelated with its text, so
    // honest model accuracy needs text whose language actually varies).
    // Map-only codegen kernel (no explode/model join in the engine —
    // the ORACLE uses the join shape for independence); exact BIGINT
    // micro-sums make the scores bit-identical cross-engine. Accuracy
    // vs the q22 marker heuristic is asserted in LangIdSpec.
    "q58_langid_model" -> ((s, dir) => {
      val d = graft.corpus.LangCorpus.ensure(s)
      s.read.parquet(s"$d/langid.parquet")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang"),
          graft.functions.nb_lang_scores(words(col("text"))).as("sc"))
        .select(col("doc_id"), col("lang"),
          element_at(col("sc"), 1).as("s_en"),
          element_at(col("sc"), 2).as("s_de"),
          element_at(col("sc"), 3).as("s_es"),
          element_at(col("sc"), 4).as("s_fr"))
        .withColumn("lang_pred",
          nbArgmax(col("s_en"), col("s_de"), col("s_es"), col("s_fr")))
        .orderBy("doc_id")
    }),

    // composed quality-filter endpoint (q62): the Gopher-style document
    // filter a curation pipeline actually applies — every signal comes
    // from the SAME single-sourced queries the driver gates standalone
    // (q48 repetition/diversity incl. its doubled-text rows, q21 stop
    // ratio, q54 word-frequency score; the doubled +3e6 rows take their
    // base doc's ratios, exact because both are invariant to text
    // doubling), combined by a pinned first-failing-rule CASE. All
    // thresholds operate on round(...,4) values both engines share
    // exactly, so the boolean split is deterministic cross-engine.
    // Rules [PINNED, in order]: n_words < 16 too_short; dup5_frac > 0.20
    // repetitive; uniq_ratio < 0.30 low_diversity; stop_ratio > 0.12
    // boilerplate; logfreq4 < 2.9 rare_words; else ok.
    "q62_quality_filter" -> ((s, dir) => {
      val rep = queries("q48_repetition")(s, dir)
        .select(col("doc_id"), col("n_words"), col("uniq_ratio"), col("dup5_frac"))
      val qual = queries("q21_quality")(s, dir)
        .select(col("doc_id").as("base_id"), col("stop_ratio"))
      val freq = queries("q54_wordfreq_score")(s, dir)
        .select(col("doc_id").as("base_id"), col("logfreq4"))
      rep.withColumn("base_id", pmod(col("doc_id"), lit(3000000L)))
        .join(qual, Seq("base_id")).join(freq, Seq("base_id"))
        .withColumn("fail_rule",
          when(col("n_words") < 16, "too_short")
            .when(col("dup5_frac") > 0.20, "repetitive")
            .when(col("uniq_ratio") < 0.30, "low_diversity")
            .when(col("stop_ratio") > 0.12, "boilerplate")
            .when(col("logfreq4") < 2.9, "rare_words")
            .otherwise("ok"))
        .withColumn("keep", col("fail_rule") === "ok")
        .select("doc_id", "n_words", "fail_rule", "keep")
        .orderBy("doc_id")
    }),

    // exact dedup: hash-groupBy, first doc_id wins
    "q23_exact_dedup" -> ((s, dir) => {
      docsAugmented(s, dir)
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("dup_count"))
        .filter(col("dup_count") > 1)
        .orderBy("text_md5")
    }),

    // MinHash signatures (k=8) over word-3-shingles
    "q24_minhash" -> ((s, dir) => {
      withMinhashSigs(docsAugmented(s, dir), col("text"), 8, "sigs")
        .select(col("doc_id"),
          array_join(transform(col("sigs"), x => x.cast("string")), "|").as("minhash"))
        .orderBy("doc_id")
    }),

    // MinHash + LSH banding (4 bands × 2 rows) → candidate pairs →
    // verified by word-set Jaccard ≥ 0.5. Scale hygiene: the signature
    // subtree is persisted AND eagerly materialized (round 1 left the
    // cache unpopulated, so the 4-way fan-out recomputed the md5 subtree
    // per branch — 121 s at sf0.1); band buckets larger than BUCKET_CAP
    // are dropped before the self-join [PINNED — an adversarial corpus of
    // near-identical docs would otherwise make the bucket join quadratic
    // in the largest bucket; the same cap is applied in the oracle SQL].
    "q25_lsh_pairs" -> ((s, dir) => lshNearDupPairs(docsAugmented(s, dir))),

    // SimHash (32-bit, md5-derived word hashes, multiset weighting) —
    // round 4: one codegen pass per document (TextRT.simhash32). The
    // previous form exploded words × 32 bit-rows through TWO shuffled
    // aggregations — a 32·|words| row blow-up per document that is the
    // difference between a map-only job and a shuffle-bound one at
    // corpus scale. The empty-word-set filter mirrors the old explode
    // (and the oracle's unnest), which dropped such docs. Values pinned
    // bit-identical to the exploded form by MinhashSigsSpec and to the
    // unchanged DuckDB oracle.
    "q26_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("__ws"))
        .filter(size(col("__ws")) > 0)
        .select(col("doc_id"), graft.functions.simhash32(col("__ws")).as("simhash"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard similarity between successive docs
    "q27_jaccard_neighbors" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), array_distinct(words(col("text"))).as("wset"))
      val a = d.select(col("doc_id").as("doc_a"), col("wset").as("wa"))
      val b = d.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("wset").as("wb"))
      a.join(b, Seq("doc_a"))
        .select(col("doc_a"), col("doc_b"), round(
          size(array_intersect(col("wa"), col("wb"))).cast("double") /
            size(array_union(col("wa"), col("wb"))), 4).as("jaccard"))
        .orderBy("doc_a")
    }),

    // substring-level duplicate detection — the span-level dedup
    // modality (cf. Lee et al. 2022, "Deduplicating Training Data Makes
    // Language Models Better": duplicated substrings, not just
    // duplicated documents). A 5-word window whose hash occurs in >= 2
    // DISTINCT documents is a duplicated span position; per document we
    // report total window count, duplicated-window count, the longest
    // contiguous duplicated run (adjacent duplicated windows merge into
    // one span — the run length is the suffix-array analogue at window
    // granularity) and the duplication ratio. Shape at corpus scale:
    // ONE codegen pass per doc for the window hashes (TextRT.ngramHashes
    // — no window string is ever built), posexplode → inverted index
    // (groupBy on the 56-bit key, map-side partial countDistinct),
    // semi-join back on the same key, then a per-doc window function for
    // run-lengths. Nothing is all-pairs; the heavy shuffle keys are
    // near-uniform hashes.
    "q40_dup_ngrams" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val W = 5
      val winged = docsAugmented(s, dir).select(col("doc_id"),
        graft.functions.ngram_hashes(words(col("text")), W).as("hs"))
      val ex = winged.select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
      val dupKeys = ex.groupBy("h").agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select("h")
      val dup = ex.join(dupKeys, Seq("h"), "left_semi")
      val runs = dup
        .withColumn("grp", col("pos") -
          row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
        .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("run"))
      val perDoc = runs.groupBy("doc_id")
        .agg(sum("run").as("n_dup"), max("run").as("max_dup_run"))
      winged.select(col("doc_id"), size(col("hs")).as("n_windows"))
        .join(perDoc, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_dup", "max_dup_run"))
        .withColumn("dup_ratio", when(col("n_windows") === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_windows")))
        .select("doc_id", "n_windows", "n_dup", "max_dup_run", "dup_ratio")
        .orderBy("doc_id")
    }),

    // WITHIN-document repetition signals (Gopher-style quality filters,
    // Rae et al. 2021 appendix A1.1): fraction of n-gram windows claimed
    // by the single most frequent 2-gram, fraction of 2-/5-gram windows
    // that occur more than once in the SAME document, and the
    // distinct-word ratio. The complement of q40 (which detects text
    // duplicated ACROSS documents): a doc that loops over its own
    // phrases is low-quality even if no other doc shares them. Shape at
    // corpus scale: window hashes are one codegen pass per doc (the q40
    // kernel — one md5 per window, no window strings), and everything
    // downstream is partial-aggregating groupBy on (doc_id[, h]) — a
    // pure hash-agg pipeline, no join against any global structure, no
    // self-join; 100 TB cost is two map-side-combined shuffles of
    // near-uniform (doc_id, h) keys.
    "q48_repetition" -> ((s, dir) => {
      // the raw docs have no WITHIN-doc phrase repetition, so the 5-gram
      // signal would be vacuously zero — append deterministic
      // self-concatenated rows (same convention as docsAugmented's dedup
      // rows, mirrored in SQL) so every signal is exercised
      val d0 = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val d = d0.unionByName(d0.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text")))
      def winStats(w: Int, pfx: String): DataFrame =
        d.select(col("doc_id"),
            explode(graft.functions.ngram_hashes(words(col("text")), w)).as("h"))
          .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            sum("c").as(s"${pfx}_n"),
            max("c").as(s"${pfx}_top"),
            sum(when(col("c") >= 2, col("c")).otherwise(0L)).as(s"${pfx}_dup"))
      val ws = words(col("text"))
      val base = d.select(col("doc_id"),
        size(ws).as("n_words"), size(array_distinct(ws)).as("n_uniq"))
      base
        .join(winStats(2, "g2"), Seq("doc_id"), "left")
        .join(winStats(5, "g5"), Seq("doc_id"), "left")
        .na.fill(0L, Seq("g2_n", "g2_top", "g2_dup", "g5_n", "g5_dup"))
        .withColumn("uniq_ratio",
          round(col("n_uniq").cast("double") / greatest(col("n_words"), lit(1)), 4))
        .withColumn("top2_frac", when(col("g2_n") === 0, lit(0.0))
          .otherwise(round(col("g2_top").cast("double") / col("g2_n"), 4)))
        .withColumn("dup2_frac", when(col("g2_n") === 0, lit(0.0))
          .otherwise(round(col("g2_dup").cast("double") / col("g2_n"), 4)))
        .withColumn("dup5_frac", when(col("g5_n") === 0, lit(0.0))
          .otherwise(round(col("g5_dup").cast("double") / col("g5_n"), 4)))
        .select("doc_id", "n_words", "uniq_ratio", "top2_frac", "dup2_frac", "dup5_frac")
        .orderBy("doc_id")
    }),

    // deterministic stratified mixture sampling (the data-mixology op:
    // build a training mix with per-language keep rates). Membership is
    // an INTEGER compare on the first 56 bits of md5("mix42_"||doc_id)
    // against an exact rational rate (tenths): u*10 < num*2^56 — no
    // float boundary anywhere, so any engine reproduces the exact same
    // sample (the property that makes a mixture recipe auditable), and
    // the sample is a pure function of (doc_id, seed string), stable
    // under corpus repartition/reorder. `weight` = 1/rate is the
    // importance weight downstream loss accounting needs. At 100 TB this
    // is a map-only filter — no shuffle, no sketch, no stored state.
    "q49_mixture_sample" -> ((s, dir) =>
      mixtureSample(t(s, dir, "documents").select("doc_id", "lang"))),

    // sequence packing — the GPT-style concat-then-split step: documents
    // are concatenated in doc_id order and split into fixed-token-budget
    // training sequences; each doc gets its global token offset, its
    // sequence id and its offset within that sequence. The global offset
    // is a DISTRIBUTED TWO-PHASE PREFIX SUM (the Scheduler.salted
    // offsets pattern): a within-bucket running sum over
    // bucket = doc_id/64 partitions plus a cumulative bucket-offset
    // table (one row per bucket). The OUTPUT is invariant to the bucket
    // width — W only shapes the decomposition — so at 10^10 docs W is
    // simply raised (or the same trick applied to the bucket table
    // recursively) to keep the offsets window one small task; no global
    // single-partition pass ever touches the doc-level rows.
    // round 5: the packing budget is denominated in BPE tokens (the
    // unit a trainer actually packs); n_words kept for continuity
    "q55_seq_packing" -> ((s, dir) =>
      seqPacking(t(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.bpe_encode_words(words(col("text"))))
            .cast("long").as("n_tok"),
          size(words(col("text"))).cast("long").as("n_words")))),

    // word-frequency quality score — the cheap LM-perplexity proxy
    // (CCNet-style): a document's score is the mean log10 corpus
    // frequency of its words. Rare-word-heavy docs (garbled text, code
    // dumps, boilerplate IDs) score low; ordinary prose scores high.
    // Determinism across engines [PINNED]: each per-word log10 is
    // quantized to decimal(20,10) BEFORE summing — decimal sums are
    // exact and shuffle-order-independent, so engine and DuckDB produce
    // bit-identical sums as long as their log10s agree within 5e-11 (C
    // and Java log10 are both faithfully rounded; corpus counts are
    // small ints). Scale shape: vocab = one map-side-combined groupBy;
    // score = shuffle equi-join on the word + per-doc hash agg — no
    // broadcast of the vocab needed (at 100 TB the vocabulary is
    // itself large).
    "q54_wordfreq_score" -> ((s, dir) => {
      val w = t(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
      val vocab = w.groupBy("w").agg(count(lit(1)).as("c"))
      w.join(vocab, Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"),
          (sum(log10(col("c").cast("double")).cast("decimal(20,10)")).cast("double")
            / count(lit(1))).as("avg_raw"))
        .select(col("doc_id"), col("n").cast("int").as("n_scored"),
          round(col("avg_raw"), 4).as("logfreq4"))
        .orderBy("doc_id")
    }),

    // benchmark DECONTAMINATION — the training-data hygiene op: flag
    // training documents that share n-gram windows with a held-out
    // evaluation set (n-gram-overlap decontamination, the GPT-3/Gopher
    // convention; W=3 here because the synthetic docs are short — real
    // pipelines use 8-13-gram windows, same shape). Eval set = doc_id %
    // 97 == 0 [PINNED, a stand-in benchmark]; a training doc is
    // contaminated iff any of its windows hashes into the eval window
    // set. Shape at corpus scale: eval windows are benchmark-sized
    // (tiny vs the corpus) → broadcast semi-ish inner join on the
    // 56-bit window hash; the training side is the same one-pass
    // codegen kernel + explode as q40 — no self-join, no all-pairs.
    "q52_decontaminate" -> ((s, dir) => {
      val W = 3
      val d = t(s, dir, "documents").select(col("doc_id"),
        graft.functions.ngram_hashes(words(col("text")), W).as("hs"))
      val evalWins = d.filter(col("doc_id") % 97 === 0)
        .select(explode(col("hs")).as("h")).distinct()
      val train = d.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), size(col("hs")).as("n_windows"), explode(col("hs")).as("h"))
      train.join(broadcast(evalWins), Seq("h"))
        .groupBy("doc_id", "n_windows")
        .agg(countDistinct(col("h")).as("n_shared"))
        .withColumn("share_ratio",
          round(col("n_shared").cast("double") / col("n_windows"), 4))
        .select("doc_id", "n_windows", "n_shared", "share_ratio")
        .orderBy("doc_id")
    }),

    // near-dup CLUSTERS off the q25 verified pair graph — the step a
    // training-data pipeline actually acts on: connected components of
    // the pair graph (GraphOps.hostComponents — label propagation to a
    // verified fixpoint), cluster id = min doc_id, `keep` marks the one
    // representative per cluster a dedup pass would retain. Docs in no
    // verified pair are absent (singletons are trivially kept; mirrored
    // by the oracle's closure over the same pair SQL).
    "q47_dedup_clusters" -> ((s, dir) => {
      val pairsDf = queries("q25_lsh_pairs")(s, dir) // persisted; ours to release
      val comps = GraphOps.hostComponents(
        pairsDf.select(col("doc_a").as("src_host"), col("doc_b").as("dst_host")))
      val labeled = comps
        .select(col("host").as("doc_id"), col("component").as("cluster"))
      val sizes = labeled.groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"))
      val out = labeled.join(sizes, Seq("cluster"))
        .withColumn("keep", col("doc_id") === col("cluster"))
        .select("doc_id", "cluster", "cluster_size", "keep")
        .orderBy("doc_id")
        .persist()
      out.count()
      comps.unpersist(false)
      pairsDf.unpersist(false)
      out
    }),

    // the composed CURATION PIPELINE endpoint: near-dup removal (q47's
    // verified clusters — one representative per cluster survives) then
    // deterministic mixture sampling (the q49 rule) over what remains.
    // Demonstrates the ops composing the way a real pipeline runs them:
    // dedup feeds sampling; every stage is the same single-sourced code
    // the standalone queries gate. Synthetic dup rows (doc_id ≥ 10⁶)
    // exist only inside the dedup universe and never reach the sample.
    "q56_curated_sample" -> ((s, dir) => {
      val clusters = queries("q47_dedup_clusters")(s, dir) // persisted; ours to release
      val drops = clusters
        .filter(!col("keep") && col("doc_id") < 1000000L)
        .select("doc_id")
      val out = mixtureSample(
        t(s, dir, "documents").select("doc_id", "lang")
          .join(drops, Seq("doc_id"), "left_anti"))
        .persist()
      out.count()
      clusters.unpersist(false)
      out
    }),

    // document fingerprint: md5 over the sorted distinct word set
    "q31_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(array_join(sort_array(array_distinct(words(col("text")))), " ")).as("fingerprint"))
        .orderBy("doc_id")
    }),
  )

  /** q25's oracle SQL, shared verbatim with q47 (which closes over the
    * verified pair graph): one source, so the pair semantics cannot
    * drift between the pair query and the cluster query. */
  /** DuckDB mirror of [[nbArgmax]] + the NB scoring over a
    * (doc_id, text) source — CTE chain ending in `lp(doc_id, lang)`
    * (the predicted language). Same committed model TSV as the kernel;
    * explode+join shape on purpose (oracle independence). */
  private[graft] def nbLangPredCteFor(src: String): String =
    s"""nbmodel AS (SELECT feature, m_en, m_de, m_es, m_fr
       |  FROM read_csv('$LangModelPath', delim='\t', header=true,
       |       columns={'feature':'VARCHAR','m_en':'BIGINT','m_de':'BIGINT','m_es':'BIGINT','m_fr':'BIGINT'})),
       |nboov AS (SELECT m_en AS o_en, m_de AS o_de, m_es AS o_es, m_fr AS o_fr
       |  FROM nbmodel WHERE feature = '<oov>'),
       |nbwd AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM ($src)),
       |nbft AS (SELECT doc_id, unnest(list_transform(range(1, length('^' || w || '$$')),
       |    i -> substr('^' || w || '$$', CAST(i AS INT), 2))) AS feat FROM nbwd),
       |nbsc AS (SELECT f.doc_id,
       |    CAST(SUM(COALESCE(m.m_en, o.o_en)) AS BIGINT) AS s_en,
       |    CAST(SUM(COALESCE(m.m_de, o.o_de)) AS BIGINT) AS s_de,
       |    CAST(SUM(COALESCE(m.m_es, o.o_es)) AS BIGINT) AS s_es,
       |    CAST(SUM(COALESCE(m.m_fr, o.o_fr)) AS BIGINT) AS s_fr
       |  FROM nbft f LEFT JOIN nbmodel m ON m.feature = f.feat CROSS JOIN nboov o
       |  GROUP BY f.doc_id),
       |lp AS (SELECT doc_id,
       |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang FROM nbsc)""".stripMargin

  /** The q25 pair pipeline's SQL mirror over ANY (doc_id, text) source
    * — single-sourced between q25/q47/q56 (augmented documents) and
    * q60 (the crawl's packed corpus). */
  private[graft] def lshPairsSqlFor(pairsSrc: String): String =
    shinglesSqlCte.format(pairsSrc) +
      s""",
        |sig AS (SELECT doc_id, ${minhashSigsSql(8)} AS sigs FROM sh),
        |wsets AS (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wset
        | FROM (%s)),
        |banded AS (SELECT doc_id, b AS band_id,
        |  md5(CAST(sigs[2*b+1] AS VARCHAR) || '_' || CAST(sigs[2*b+2] AS VARCHAR)) AS band_key
        | FROM sig, UNNEST([0,1,2,3]) AS t(b)),
        |hot AS (SELECT band_id, band_key FROM banded GROUP BY 1, 2 HAVING COUNT(*) > 64),
        |pruned AS (SELECT * FROM banded bd WHERE NOT EXISTS (
        |  SELECT 1 FROM hot h WHERE h.band_id = bd.band_id AND h.band_key = bd.band_key)),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM pruned a JOIN pruned b ON a.band_id = b.band_id AND a.band_key = b.band_key
        | WHERE a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        | round(len(list_intersect(wa.wset, wb.wset)) * 1.0
        |       / len(list_distinct(wa.wset || wb.wset)), 4) AS jaccard
        |FROM pairs JOIN wsets wa ON wa.doc_id = doc_a JOIN wsets wb ON wb.doc_id = doc_b
        |WHERE round(len(list_intersect(wa.wset, wb.wset)) * 1.0
        |       / len(list_distinct(wa.wset || wb.wset)), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin.format(pairsSrc)

  private lazy val q25PairsSql: String = lshPairsSqlFor(docsAugmentedSql)

  // oracle SQL shared verbatim with the composed q62 filter
  private val q21QualitySql: String =
      """SELECT doc_id, n_words, n_stop, stop_ratio,
        | CASE WHEN n_words >= 20 AND stop_ratio <= 0.5 THEN 'ok' ELSE 'low' END AS quality
        |FROM (
        | SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_words,
        |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in'))) AS INT) AS n_stop,
        |  round(len(list_filter(ws, w -> w IN ('the','a','of','and','in'))) * 1.0
        |        / greatest(len(ws), 1), 4) AS stop_ratio
        | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents))
        |ORDER BY doc_id""".stripMargin

  private val q48RepetitionSql: String =
      """WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 3000000 AS doc_id, text || ' ' || text AS text
        |    FROM documents WHERE doc_id % 13 = 0),
        |w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |  FROM d),
        |h2 AS (SELECT doc_id, CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
        |  i -> CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 14) AS BIGINT))
        |  ELSE [] END AS hs FROM w),
        |h5 AS (SELECT doc_id, CASE WHEN len(ws) >= 5 THEN list_transform(range(1, len(ws) - 3),
        |  i -> CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 14) AS BIGINT))
        |  ELSE [] END AS hs FROM w),
        |a2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS g2_n, CAST(MAX(c) AS BIGINT) AS g2_top,
        |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS g2_dup
        |  FROM (SELECT doc_id, h, COUNT(*) AS c
        |        FROM (SELECT doc_id, unnest(hs) AS h FROM h2) GROUP BY doc_id, h)
        |  GROUP BY doc_id),
        |a5 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS g5_n,
        |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS g5_dup
        |  FROM (SELECT doc_id, h, COUNT(*) AS c
        |        FROM (SELECT doc_id, unnest(hs) AS h FROM h5) GROUP BY doc_id, h)
        |  GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.ws) AS INT) AS n_words,
        |  round(len(list_distinct(w.ws)) * 1.0 / greatest(len(w.ws), 1), 4) AS uniq_ratio,
        |  CASE WHEN COALESCE(a2.g2_n, 0) = 0 THEN 0.0
        |       ELSE round(a2.g2_top * 1.0 / a2.g2_n, 4) END AS top2_frac,
        |  CASE WHEN COALESCE(a2.g2_n, 0) = 0 THEN 0.0
        |       ELSE round(a2.g2_dup * 1.0 / a2.g2_n, 4) END AS dup2_frac,
        |  CASE WHEN COALESCE(a5.g5_n, 0) = 0 THEN 0.0
        |       ELSE round(a5.g5_dup * 1.0 / a5.g5_n, 4) END AS dup5_frac
        |FROM w LEFT JOIN a2 USING (doc_id) LEFT JOIN a5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin

  private val q54WordfreqSql: String =
      """WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |vocab AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_scored,
        |  round(CAST(SUM(CAST(log10(CAST(c AS DOUBLE)) AS DECIMAL(20,10))) AS DOUBLE)
        |        / COUNT(*), 4) AS logfreq4
        |FROM w JOIN vocab USING (w)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q20_tokens" ->
      s"""WITH RECURSIVE ${bpeCte("SELECT doc_id, text FROM documents")}
         |SELECT d.doc_id,
         | CAST(len(regexp_extract_all(d.text, '\\S+')) AS INT) AS n_tokens,
         | CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS INT) AS n_words,
         | CAST(len(b.ids) AS INT) AS n_bpe,
         | CAST(length(d.text) AS INT) AS n_chars_c
         |FROM documents d JOIN bpe b USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q57_bpe_tokens" ->
      s"""WITH RECURSIVE ${bpeCte(docsAugmentedSql)}
         |SELECT d.doc_id, CAST(len(d.ws) AS INT) AS n_words,
         | CAST(len(b.ids) AS INT) AS n_bpe,
         | array_to_string(b.ids, '|') AS bpe_ids
         |FROM dws d JOIN bpe b USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q21_quality" -> q21QualitySql,

    "q22_langid" ->
      """SELECT doc_id, s_en, s_de, s_es, s_fr,
        | CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |      WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |      WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
        |FROM (
        | SELECT doc_id,
        |  CAST(len(list_filter(ws, w -> w IN ('the','and','of','is'))) AS INT) AS s_en,
        |  CAST(len(list_filter(ws, w -> w IN ('der','die','und','das'))) AS INT) AS s_de,
        |  CAST(len(list_filter(ws, w -> w IN ('el','la','que','los'))) AS INT) AS s_es,
        |  CAST(len(list_filter(ws, w -> w IN ('le','les','des','est'))) AS INT) AS s_fr
        | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents))
        |ORDER BY doc_id""".stripMargin,

    // independent recomputation path on purpose: the oracle EXPLODES
    // bigrams and joins the committed model TSV (read_csv on the same
    // file the kernel loads), where the engine runs the map-only
    // kernel — shared inputs, disjoint code
    "q58_langid_model" ->
      s"""WITH model AS (SELECT feature, m_en, m_de, m_es, m_fr
         |  FROM read_csv('$LangModelPath', delim='\t', header=true,
         |       columns={'feature':'VARCHAR','m_en':'BIGINT','m_de':'BIGINT','m_es':'BIGINT','m_fr':'BIGINT'})),
         |oov AS (SELECT m_en AS o_en, m_de AS o_de, m_es AS o_es, m_fr AS o_fr
         |  FROM model WHERE feature = '<oov>'),
         |docs AS (SELECT doc_id, lang, text
         |  FROM read_parquet('${graft.corpus.LangCorpus.dir}/langid.parquet/*.parquet')
         |  WHERE doc_id % 5 = 0),
         |wd AS (SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
         |  FROM docs),
         |ft AS (SELECT doc_id, lang, unnest(list_transform(range(1, length('^' || w || '$$')),
         |    i -> substr('^' || w || '$$', CAST(i AS INT), 2))) AS feat FROM wd),
         |sc AS (SELECT ft.doc_id, ft.lang,
         |    CAST(SUM(COALESCE(m.m_en, o.o_en)) AS BIGINT) AS s_en,
         |    CAST(SUM(COALESCE(m.m_de, o.o_de)) AS BIGINT) AS s_de,
         |    CAST(SUM(COALESCE(m.m_es, o.o_es)) AS BIGINT) AS s_es,
         |    CAST(SUM(COALESCE(m.m_fr, o.o_fr)) AS BIGINT) AS s_fr
         |  FROM ft LEFT JOIN model m ON m.feature = ft.feat CROSS JOIN oov o
         |  GROUP BY ft.doc_id, ft.lang)
         |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q23_exact_dedup" ->
      s"""SELECT md5(text) AS text_md5, CAST(MIN(doc_id) AS BIGINT) AS rep_id,
         | CAST(COUNT(*) AS BIGINT) AS dup_count
         |FROM ($docsAugmentedSql)
         |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin,

    "q24_minhash" ->
      (shinglesSqlCte.format(docsAugmentedSql) +
        s"\nSELECT doc_id, ${minhashSigSql(8)} AS minhash FROM sh ORDER BY doc_id"),

    "q25_lsh_pairs" -> q25PairsSql,

    // near-dup clusters: recursive label closure over the q25 pair
    // graph (q25PairsSql verbatim as the subquery — single-sourced), the
    // same component-id rule as q46 (min reachable doc_id); canonical
    // representative = the min itself (`keep`).
    "q47_dedup_clusters" ->
      s"""WITH RECURSIVE p AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM ($q25PairsSql)),
         |und AS MATERIALIZED (
         |  SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM p),
         |r(d, label) AS (
         |  SELECT DISTINCT a, a FROM und
         |  UNION
         |  SELECT u.b, r.label FROM r JOIN und u ON u.a = r.d),
         |comp AS (SELECT d AS doc_id, MIN(label) AS cluster FROM r GROUP BY d),
         |siz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM comp GROUP BY 1)
         |SELECT doc_id, cluster, cluster_size, (doc_id = cluster) AS keep
         |FROM comp JOIN siz USING (cluster) ORDER BY doc_id""".stripMargin,

    "q26_simhash" ->
      """SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash FROM (
        | SELECT doc_id, i,
        |  CASE WHEN SUM(c) > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END AS bitval
        | FROM (
        |  SELECT doc_id, i, CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END AS c
        |  FROM (
        |   SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h
        |   FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |         FROM documents)),
        |   UNNEST(range(0, 32)) AS t(i))
        | GROUP BY doc_id, i)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q27_jaccard_neighbors" ->
      """WITH d AS (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wset
        |           FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | round(len(list_intersect(a.wset, b.wset)) * 1.0
        |       / len(list_distinct(a.wset || b.wset)), 4) AS jaccard
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,

    "q31_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // independent reconstruction of the window-hash pipeline: windows as
    // the same md5-prefix 56-bit value over the space-joined 5-word
    // window (the minhash `a` formula both engines already share), zipped
    // unnest for positions, inverted index + run-length via window fn
    "q40_dup_ngrams" ->
      s"""WITH d AS ($docsAugmentedSql),
         |w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM d),
         |wins AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 5 THEN list_transform(range(1, len(ws) - 3),
         |    i -> CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 14) AS BIGINT))
         |  ELSE [] END AS hs FROM w),
         |ex AS (SELECT doc_id, unnest(range(0, len(hs))) AS pos, unnest(hs) AS h FROM wins),
         |dupkeys AS (SELECT h FROM ex GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |dup AS (SELECT e.doc_id, e.pos FROM ex e JOIN dupkeys k ON e.h = k.h),
         |rl AS (SELECT doc_id, grp, COUNT(*) AS run FROM (
         |  SELECT doc_id, pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM dup) GROUP BY doc_id, grp),
         |perdoc AS (SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_dup,
         |  CAST(MAX(run) AS BIGINT) AS max_dup_run FROM rl GROUP BY doc_id)
         |SELECT w2.doc_id, CAST(len(w2.hs) AS INT) AS n_windows,
         |  COALESCE(p.n_dup, 0) AS n_dup,
         |  COALESCE(p.max_dup_run, 0) AS max_dup_run,
         |  CASE WHEN len(w2.hs) = 0 THEN 0.0
         |       ELSE CAST(COALESCE(p.n_dup, 0) AS DOUBLE) / len(w2.hs) END AS dup_ratio
         |FROM wins w2 LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // q48: same 56-bit md5-window formula as q40's oracle, window sizes
    // 2 and 5, aggregated WITHIN each document
    "q48_repetition" -> q48RepetitionSql,

    "q55_seq_packing" ->
      s"""WITH RECURSIVE ${bpeCte("SELECT doc_id, text FROM documents")},
         |d AS (SELECT w.doc_id,
         |  CAST(len(b.ids) AS BIGINT) AS n_tok,
         |  CAST(len(w.ws) AS BIGINT) AS n_words
         |  FROM dws w JOIN bpe b USING (doc_id)),
         |c AS (SELECT doc_id, n_tok, n_words,
         |  COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
         |  FROM d)
         |SELECT doc_id, n_tok, n_words, CAST(start_tok AS BIGINT) AS start_tok,
         |  CAST(start_tok // 1024 AS BIGINT) AS seq_id,
         |  CAST(start_tok % 1024 AS BIGINT) AS seq_off
         |FROM c ORDER BY doc_id""".stripMargin,

    "q54_wordfreq_score" -> q54WordfreqSql,

    "q52_decontaminate" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |  FROM documents),
        |h3 AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1),
        |  i -> CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 14) AS BIGINT))
        |  ELSE [] END AS hs FROM w),
        |ex AS (SELECT doc_id, CAST(len(hs) AS INT) AS n_windows, unnest(hs) AS h FROM h3),
        |ev AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0)
        |SELECT e.doc_id, e.n_windows,
        |  CAST(COUNT(DISTINCT e.h) AS BIGINT) AS n_shared,
        |  round(COUNT(DISTINCT e.h) * 1.0 / e.n_windows, 4) AS share_ratio
        |FROM ex e JOIN ev USING (h)
        |WHERE e.doc_id % 97 != 0
        |GROUP BY e.doc_id, e.n_windows
        |ORDER BY e.doc_id""".stripMargin,

    "q49_mixture_sample" ->
      mixtureSampleSql("SELECT doc_id, lang FROM documents"),

    // q62: the three signal queries' oracle SQL verbatim as CTEs (the
    // same single-sourcing as the engine side), joined on the base doc
    // id, then the pinned first-failing-rule CASE
    "q62_quality_filter" ->
      s"""WITH rep AS ($q48RepetitionSql),
         |qual AS ($q21QualitySql),
         |freq AS ($q54WordfreqSql),
         |j AS (SELECT r.doc_id, r.n_words, r.uniq_ratio, r.dup5_frac,
         |        q.stop_ratio, f.logfreq4
         |      FROM rep r
         |      JOIN qual q ON q.doc_id = r.doc_id % 3000000
         |      JOIN freq f ON f.doc_id = r.doc_id % 3000000),
         |ruled AS (SELECT doc_id, n_words,
         |  CASE WHEN n_words < 16 THEN 'too_short'
         |       WHEN dup5_frac > 0.20 THEN 'repetitive'
         |       WHEN uniq_ratio < 0.30 THEN 'low_diversity'
         |       WHEN stop_ratio > 0.12 THEN 'boilerplate'
         |       WHEN logfreq4 < 2.9 THEN 'rare_words'
         |       ELSE 'ok' END AS fail_rule
         |  FROM j)
         |SELECT doc_id, n_words, fail_rule, (fail_rule = 'ok') AS keep
         |FROM ruled ORDER BY doc_id""".stripMargin,

    // q56: the composed curation endpoint — q47's cluster closure
    // (verbatim CTEs over the single-sourced q25 pair SQL) drops
    // non-representative near-dups, then the q49 sampling rule
    // (single-sourced mixtureSampleSql) draws the mixture
    "q56_curated_sample" ->
      s"""WITH RECURSIVE p AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM ($q25PairsSql)),
         |und AS MATERIALIZED (
         |  SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM p),
         |r(d, label) AS (
         |  SELECT DISTINCT a, a FROM und
         |  UNION
         |  SELECT u.b, r.label FROM r JOIN und u ON u.a = r.d),
         |comp AS (SELECT d AS doc_id, MIN(label) AS cluster FROM r GROUP BY d),
         |drops AS (SELECT doc_id FROM comp WHERE doc_id <> cluster AND doc_id < 1000000),
         |base AS (SELECT doc_id, lang FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM drops))
         |${mixtureSampleSql("SELECT doc_id, lang FROM base")}""".stripMargin,
  )
}
