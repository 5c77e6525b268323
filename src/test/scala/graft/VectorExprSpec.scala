package graft

import graft.functions.{nearest_centroid, probe_cells, rhp_sig, vec_cosine, vec_dist2, vec_dot}
import graft.queries.VectorOps
import org.apache.spark.sql.functions._

/** The codegen vector kernels (round 3) must be IEEE-BIT-IDENTICAL to
  * the interpreted `aggregate(zip_with(...))` higher-order forms they
  * replaced — same fold order, same seed — or the golden-oracle matches
  * silently drift. Asserted here by evaluating both forms through Spark
  * on deterministic pseudo-random vectors and comparing raw bits. */
class VectorExprSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic "random" doubles in [-1, 1)
  private def vec(seed: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val x = (seed * 6364136223846793005L + i * 1442695040888963407L)
      (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }

  private val dims = Seq(1, 3, 64)
  private lazy val df = dims.flatMap(d => (0 until 50).map(s =>
      (s.toLong, d, vec(s, d).toSeq, vec(s + 1000, d).toSeq)))
    .toDF("id", "dim", "a", "b")

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("vec_dot / vec_dist2 / vec_cosine are bit-identical to the interpreted HOF folds") {
    val hofD2 = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val hofCos = hofDot(col("a"), col("b")) /
      (sqrt(hofDot(col("a"), col("a"))) * sqrt(hofDot(col("b"), col("b"))))
    val rows = df.select(
        vec_dot(col("a"), col("b")).as("d1"), hofDot(col("a"), col("b")).as("d2"),
        vec_dist2(col("a"), col("b")).as("e1"), hofD2.as("e2"),
        vec_cosine(col("a"), col("b")).as("c1"), hofCos.as("c2"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"dot: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"dist2: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)), s"cosine: $r")
    }
  }

  test("rhp_sig equals the literal-weights HOF signature, and the golden-oracle formula") {
    val dim = 64
    val w = VectorOps.planeWeights(8, dim)
    // interpreted literal-weights form (round 2's rhpTablesLit shape)
    def hofSig(v: org.apache.spark.sql.Column, first: Int, bits: Int) =
      (0 until bits).map { j =>
        val wj = typedLit(w(first + j).toSeq)
        val proj = aggregate(zip_with(v, wj, (x, wd) => x * wd), lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
    val d64 = df.filter(col("dim") === dim)
    val rows = d64.select(col("id"), col("a"),
        rhp_sig(col("a"), w.slice(0, 4)).as("s1"), hofSig(col("a"), 0, 4).as("s2"),
        rhp_sig(col("a"), w.slice(4, 8)).as("s3"), hofSig(col("a"), 4, 4).as("s4"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"table0 sig mismatch: $r")
      assert(r.getLong(4) == r.getLong(5), s"table1 sig mismatch: $r")
    }
  }

  test("nearest_centroid / probe_cells match the naive (dist2, cid) tuple-min model") {
    val cents: Array[(Int, Array[Double])] =
      Array.tabulate(7)(i => (i, vec(5000 + i, 16)))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val vs = (0 until 40).map(s => (s.toLong, vec(s + 77, 16)))
    val got = vs.toDF("id", "v")
      .select(col("id"), nearest_centroid(col("v"), cents).as("cid"),
        probe_cells(col("v"), cents, 2).as("pr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    val want = vs.map { case (id, v) =>
      val ranked = cents.map { case (cid, c) => (d2(v, c), cid) }.sortBy(identity)
      (id, ranked.head._2, ranked.take(2).map(_._2).toSeq)
    }
    assert(got.sortBy(_._1) == want.sortBy(_._1))
  }

  test("golden-oracle models are deterministic across two runs (pinned fold orders)") {
    val emb: Array[(Long, Array[Double])] =
      Array.tabulate(120)(i => ((i * 5).toLong, vec(i + 31, 64)))
    import graft.oracle.GoldenOracles._
    assert(annLsh(emb) == annLsh(emb.map { case (id, v) => (id, v.clone()) }))
    assert(annIvf(emb) == annIvf(emb.map { case (id, v) => (id, v.clone()) }))
    assert(embedNearDup(emb) == embedNearDup(emb.map { case (id, v) => (id, v.clone()) }))
  }
}
