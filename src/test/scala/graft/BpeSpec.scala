package graft

import graft.functions.bpe_encode_words
import org.apache.spark.sql.functions._

/** The BPE kernel vs an independent in-test model of the pinned encode
  * contract, plus structural invariants (lossless decode, OOV
  * behavior, concatenation, SQL-surface parity). The DuckDB
  * recursive-CTE mirror is additionally gated by q57/q20/q55/q53 in
  * the driver's correctness run. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** The committed merges fixture, parsed independently of the kernel's
    * loader (same file, separate code path). */
  private lazy val merges: Seq[(Int, String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/bpe_merges.tsv"), "UTF-8")
    try src.getLines().drop(1).map { ln =>
      val Array(r, l, rr) = ln.split("\t", -1)
      (r.toInt, l, rr)
    }.toList
    finally src.close()
  }

  private lazy val refTokId: Map[String, Int] = {
    val base = (('a' to 'z').zipWithIndex.map { case (c, i) => c.toString -> i } ++
      ('0' to '9').zipWithIndex.map { case (c, i) => c.toString -> (26 + i) }).toMap
    merges.sortBy(_._1).foldLeft(base) { case (m, (rank, l, r)) =>
      val t = l + r
      if (m.contains(t)) m else m + (t -> (36 + rank))
    }
  }

  /** Independent model of the pinned loop: merge the leftmost
    * occurrence of the lowest-rank adjacent pair until none applies
    * (functional style — distinct from the kernel's in-place loop). */
  private def refEncode(w: String): Seq[Int] = {
    val rank = merges.map { case (r, l, rr) => (l, rr) -> r }.toMap
    @annotation.tailrec
    def go(syms: Vector[String]): Vector[String] = {
      val cands = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) syms
      else {
        val (_, i) = cands.min // (rank, idx): lowest rank, then leftmost
        go(syms.take(i) :+ (syms(i) + syms(i + 1)) :++ syms.drop(i + 2))
      }
    }
    go(w.map(_.toString).toVector).map(refTokId)
  }

  private def engineEncode(wordLists: Seq[Seq[String]]): Seq[Seq[Int]] =
    wordLists.toDF("ws")
      .select(bpe_encode_words(col("ws")).as("ids"))
      .as[Seq[Int]].collect().toSeq

  test("engine encode equals the independent model on vocab, OOV and " +
      "random words") {
    val vocab = Seq("the", "customer", "window", "scan", "spark", "merge",
      "column", "stream", "batch", "vector", "a", "dup")
    val oov = Seq("zz9", "extra", "tail", "words", "qqq", "z", "9",
      "d004512", "https", "example", "xylophone0")
    val rnd = new scala.util.Random(7L)
    val random = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => "abcdefgh0123"(rnd.nextInt(12))).mkString)
    val all = vocab ++ oov ++ random
    val got = engineEncode(all.map(Seq(_)))
    all.zip(got).foreach { case (w, ids) =>
      assert(ids == refEncode(w), s"word '$w': engine=$ids model=${refEncode(w)}")
    }
  }

  test("document encode is the concatenation of word encodes, in order") {
    val docs = Seq(
      Seq("the", "fast", "key", "order"),
      Seq("zz9", "the", "zz9"),
      Seq.empty[String])
    val got = engineEncode(docs)
    docs.zip(got).foreach { case (ws, ids) =>
      assert(ids == ws.flatMap(refEncode), s"doc $ws")
    }
  }

  test("encode is lossless: decoding ids through the vocabulary " +
      "reconstructs every word exactly") {
    val idTok = refTokId.groupBy(_._2).map { case (id, m) => id -> m.keys.min }
    // min is safe: MIN(id)-wins means each USED id maps to one token
    val words = Seq("customer", "window", "the", "zz9", "vector", "d00c1")
    val got = engineEncode(words.map(Seq(_)))
    words.zip(got).foreach { case (w, ids) =>
      assert(ids.map(idTok).mkString == w, s"decode($ids) != $w")
    }
  }

  test("memoized path is consistent: repeated encodes are identical " +
      "and id range is within the vocabulary") {
    val w = Seq("stream", "stream", "stream")
    val a = engineEncode(w.map(Seq(_)))
    assert(a.distinct.size == 1)
    val maxId = 36 + merges.size - 1
    a.head.foreach(id => assert(id >= 0 && id <= maxId))
  }

  test("graft_bpe_encode SQL surface matches the Column API and stays " +
      "codegen (no UDF node)") {
    val df = Seq(Seq("the", "customer", "zz9")).toDF("ws")
    df.createOrReplaceTempView("bpe_t")
    val viaSql = spark.sql("SELECT graft_bpe_encode(ws) AS ids FROM bpe_t").collect().toSeq
    val viaDsl = df.select(bpe_encode_words(col("ws")).as("ids")).collect().toSeq
    assert(viaSql == viaDsl)
    val plan = df.select(bpe_encode_words(col("ws"))).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      s"unexpected UDF node:\n$plan")
  }
}
