package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** Pins the one-pass codegen MinHash kernel
  * (graft.functions.TextRT.minhashSigs) bit-identical to the staged
  * higher-order-function pipeline it replaced
  * (TextOps.minhashSigsHofForm — kept in-repo as this oracle), across
  * generated texts and the word-count edge cases (0/1/2 words take
  * shingles3's `otherwise` branch: ONE shingle of all words joined). */
class MinhashSigsSpec extends SparkTestBase {
  import spark.implicits._

  private def bothForms(texts: Seq[String], k: Int): Unit = {
    val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
    val hof = TextOps.minhashSigsHofForm(df, col("text"), k, "sigs")
      .select(col("id"), col("sigs").cast("array<long>").as("sigs"))
    val gen = df.select(col("id"),
      graft.functions.minhash_sigs(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0)), k).as("sigs"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val g = gen.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h.keySet == g.keySet)
    for ((id, hs) <- h)
      assert(g(id) == hs,
        s"sig mismatch for text '${texts(id.toInt)}': hof=$hs codegen=${g(id)}")
  }

  test("codegen minhash_sigs equals the staged HOF form on edge cases") {
    bothForms(Seq(
      "",                        // 0 words → md5("")
      "  --  ",                  // 0 words after the regexp
      "one",                     // 1 word
      "two words",               // 2 words
      "now three words",         // exactly one shingle
      "a b c d e f g",           // several shingles
      "Mixed CASE And 42 numbers 42 repeated 42",
      "unicode außen привет 漢字 kept-out by the regexp but splits tokens",
      ("lorem ipsum dolor sit amet " * 50).trim, // long doc, repeated shingles
    ), k = 8)
  }

  test("codegen minhash_sigs equals the staged HOF form on 300 generated texts") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "x1",
      "y2", "z3", "lorem", "ipsum", "dolor", "sit", "amet", "0", "42")
    val texts = (0 until 300).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    bothForms(texts, k = 8)
    bothForms(texts.take(50), k = 3) // a different k: the j-loop bound
  }

  test("codegen simhash32 equals the exploded two-aggregation form") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2", "42",
      "lorem", "ipsum", "dolor")
    val texts = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(40) // >= 1 word: the explode drops empty docs
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ "one" :+ ("alpha " * 100).trim
    val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
    val ws = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))

    // the pre-round-4 q26 shape, kept here as the kernel's oracle
    val exploded = df
      .select(col("id"), explode(ws).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"))
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(31))).as("i"))
      .withColumn("c", when(expr("(shiftright(h, i) & 1)") === 1, 1L).otherwise(-1L))
      .groupBy("id", "i").agg(sum(col("c")).as("cnt"))
      .withColumn("bitval",
        when(col("cnt") > 0, expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0L))
      .groupBy("id").agg(sum(col("bitval")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val gen = df.select(col("id"), graft.functions.simhash32(ws).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gen == exploded)
  }

  test("codegen ngram_hashes equals the HOF window form; short docs empty") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "x1", "42",
      "lorem", "ipsum", "dolor", "sit")
    val texts = (0 until 250).map { _ =>
      val n = rnd.nextInt(25) // includes < W word counts → empty arrays
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ "" :+ "a b c d e" :+ ("alpha beta " * 40).trim
    for (w <- Seq(3, 5)) {
      val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
      val ws = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
      // independent HOF reconstruction: slice + concat_ws window strings,
      // md5 hex chars 1-14 as a base-16 long — the q40 oracle's formula
      val hof = df.select(col("id"),
        when(size(ws) >= w,
          transform(sequence(lit(1), size(ws) - (w - 1)), i =>
            conv(substring(md5(concat_ws(" ", slice(ws, i, lit(w)))), 1, 14), 16, 10)
              .cast("long")))
          .otherwise(array().cast("array<long>")).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val gen = df.select(col("id"), graft.functions.ngram_hashes(ws, w).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(gen.keySet == hof.keySet)
      for ((id, hs) <- hof)
        assert(gen(id) == hs, s"ngram hash mismatch (w=$w) for '${texts(id.toInt)}'")
    }
  }
}
