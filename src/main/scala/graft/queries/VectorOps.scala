package graft.queries

import graft.functions.{nearest_centroid, probe_cells, rhp_sig, vec_cosine, vec_dist2}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Similarity search over the embeddings table (Array[Float], dim 64):
  * brute-force cosine top-k as the exact baseline, and LSH/IVF-bucketed
  * variants as the scale paths (buckets bound the candidate set; at
  * 100 TB the bucket/cell equi-join replaces the all-pairs cross join,
  * trading recall for a ~2^bits candidate reduction — recall is
  * asserted in LshAnnSpec).
  *
  * All distance kernels are codegen Catalyst expressions
  * (graft.functions.VectorExpressions) since round 3 — the round-2
  * interpreted `aggregate(zip_with(...))` HOF forms were the measured
  * cause of the q35 bench regression. Fold orders are IEEE-bit-identical
  * to the former forms and to the independent golden oracle
  * (GoldenOracles), so results are unchanged.
  */
object VectorOps {

  type Q = (SparkSession, String) => DataFrame

  /** float→double widening is exact; Cast over arrays is codegen'd
    * (the former `transform(...)` HOF was interpreted). */
  private def asDouble(c: Column): Column = c.cast("array<double>")

  def cosine(a: Column, b: Column): Column = vec_cosine(a, b)

  /** Driver-side md5-derived plane weights ([PINNED] formula, mirrored
    * in GoldenOracles): w(p,d) = (md5₆("p_d") % 1001 − 500) / 500. */
  def planeWeights(planes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (p, d) =>
      val hex = md.digest(s"${p}_$d".getBytes("UTF-8"))
        .take(3).map(b => f"${b & 0xff}%02x").mkString
      ((java.lang.Long.parseLong(hex, 16) % 1001L).toDouble - 500.0) / 500.0
    }
  }

  /** Multi-table LSH signatures: array of (table, signature) structs —
    * L independent tables amplify recall (candidate iff ANY table
    * collides), the classic L×(bits) construction. One codegen vector
    * pass per table. */
  def rhpTables(vec: Column, weights: Array[Array[Double]], tables: Int, bits: Int): Column =
    array((0 until tables).map { tb =>
      struct(lit(tb).as("t"),
        rhp_sig(vec, weights.slice(tb * bits, (tb + 1) * bits)).as("sig"))
    }: _*)

  /** Hard ceiling on the brute-force query-set size [PINNED]. The
    * `=!=` theta-join below physically plans as a
    * BroadcastNestedLoopJoin — O(|queries| × |corpus|) cosine kernels.
    * That is the CORRECT shape for an exact baseline over a bounded
    * query set (it is what q29/q35 recall is measured against), and a
    * scale-killer for anything else: at 10^9 vectors even 10^5 queries
    * is 10^14 kernels. The refusal is loud so the operator cannot be
    * lifted into a pipeline by accident — use q29 (LSH) or q35 (IVF)
    * beyond this. */
  val BruteForceMaxQueries = 4096L

  /** Exact cosine top-k of `q` against `emb` — O(Q·N) by construction;
    * refuses query sets larger than [[BruteForceMaxQueries]]. The guard
    * counts through limit(cap+1), so it short-circuits at the cap
    * instead of fully scanning the query frame a second time
    * [round-5 review — the count() guard re-ran the whole query-side
    * scan on every q28 call]. */
  private[graft] def bruteForceTopK(q: DataFrame, emb: DataFrame, k: Int): DataFrame = {
    val probe = q.limit(BruteForceMaxQueries.toInt + 1).count()
    require(probe <= BruteForceMaxQueries,
      s"bruteForceTopK: > $BruteForceMaxQueries queries — this " +
        "exact baseline is O(queries x corpus) (BroadcastNestedLoopJoin); " +
        "use q29_ann_lsh or q35_ann_ivf for large query sets")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    q.join(emb, col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos4"))
  }

  val queries: Map[String, Q] = Map(

    // brute-force cosine top-k (exact ANN baseline; capped — see
    // BruteForceMaxQueries)
    "q28_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = emb.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      bruteForceTopK(q, emb, 5).orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN: multi-table (4×4-bit) random-hyperplane buckets;
    // candidate iff any table collides, then exact cosine re-rank.
    // Signatures use the precomputed-weight codegen path ([PINNED]
    // formula shared with q36 and the golden oracle since round 3).
    "q29_ann_lsh" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val dim = raw.select(size(col("v"))).head().getInt(0)
      val W = planeWeights(16, dim)
      val emb = raw
        .select(col("vec_id"), col("v"), explode(rhpTables(col("v"), W, 4, 4)).as("ts"))
        .select(col("vec_id"), col("v"), col("ts.t").as("t"), col("ts.sig").as("sig"))
      val q = emb.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("t"), col("sig"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      q.join(emb, Seq("t", "sig"))
        .filter(col("vec_id") =!= col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .dropDuplicates("query_id", "vec_id")
        .withColumn("cos", cosine(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 4).as("cos4"))
        .orderBy("query_id", "rank")
    }),

    // IVF ANN: deterministic k-means-lite coarse quantizer (K=16, one
    // Lloyd step, nprobe=2), candidates restricted to the probed cells.
    // Round-3 shape: cell assignment is a single codegen
    // nearest_centroid pass (round 2 crossJoined 16 broadcast centroids
    // and groupBy-min'd — 16× the rows plus a shuffle, per assign pass,
    // through interpreted dist2; with the leaked `emb.persist()` that
    // was the round-2 bench's one big regression). Nothing is persisted.
    "q35_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // deterministic seeding: every 31st vec_id, first 16
      val seeds0: Array[(Int, Array[Double])] =
        emb.filter(col("vec_id") % 31 === 0)
          .orderBy("vec_id").limit(16).collect()
          .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
      // one Lloyd step: element-wise mean per cell. The sum goes through
      // DECIMAL so it is order-independent (a double sum's value depends
      // on shuffle arrival order) — the q35 result is then exactly
      // reproducible by the independent golden oracle (GoldenOracles).
      val cents1: Array[(Int, Array[Double])] =
        emb.withColumn("cid", nearest_centroid(col("v"), seeds0))
          .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg((sum(col("x").cast("decimal(27,15)")).cast("double") / count(lit(1))).as("x"))
          .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
          .select(col("cid"), transform(col("px"), p => p.getField("x")).as("c"))
          .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1) // ascending cid — the expressions' tie-break contract
      val cells = emb.withColumn("cid", nearest_centroid(col("v"), cents1))
      // queries probe their 2 nearest cells (one codegen pass, no
      // centroid crossJoin / row_number)
      val probes = emb.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
        .select(col("query_id"), col("qv"),
          explode(probe_cells(col("qv"), cents1, 2)).as("cid"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      probes.join(cells, Seq("cid"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 4).as("cos4"))
        .orderBy("query_id", "rank")
    }),

    // k-means (Lloyd) over the embeddings — the clustering step of
    // semantic dedup / data curation (SemDeDup-style: cluster, then
    // dedup/prune within clusters) and the real trainer behind q35's
    // one-step IVF coarse quantizer. Iterative discipline: centroids are
    // K×dim doubles — the ONLY thing that ever collects — so each Lloyd
    // step is ONE job over the cached embeddings (codegen
    // nearest_centroid assignment + a partial-aggregating groupBy);
    // plans stay constant-size because the loop state lives in the
    // centroid literals, not in a growing DataFrame lineage. Element-wise
    // means go through decimal(27,15), making them shuffle-order-
    // independent — the whole run is bit-reproducible, which is what
    // lets an independent sequential model (GoldenOracles.kmeans) pin
    // the output EXACTLY while DuckDB independently re-verifies the
    // distances and the argmin property within tolerance. Convergence =
    // centroid-array fixpoint (exact double equality, driver-side,
    // free), maxIters backstop [PINNED: both mirrored in the golden
    // model; an empty cell keeps its previous centroid].
    "q50_kmeans" -> ((s, dir) => {
      import s.implicits._
      val K = 8; val MaxIters = 25
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .persist()
      emb.count() // materialize once; every Lloyd step re-scans this cache
      val (cents, _) = kmeansCentroids(emb, K, MaxIters)
      val cdf = cents.toSeq.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "c")
      val out = emb.withColumn("cid", nearest_centroid(col("v"), cents))
        .join(broadcast(cdf), Seq("cid"))
        .withColumn("d4", round(vec_dist2(col("v"), col("c")), 4))
        .select("vec_id", "cid", "d4")
        .orderBy("vec_id")
        .persist()
      out.count()
      emb.unpersist(false)
      out
    }),

    // embedding-cosine near-duplicate detection, LSH-bucketed: the
    // candidate set comes from 4×6-bit random-hyperplane bucket
    // collisions (equi-join — no all-pairs cross join at scale), then
    // exact cosine ≥ 0.9 confirms. The raw embeddings table has no
    // near-dups, so deterministic exact + perturbed copies are appended
    // (same [PINNED] formula in the golden oracle). Band buckets larger
    // than BUCKET_CAP are dropped before the self-join [PINNED, round 3
    // — the q25 mega-bucket hygiene: a dense near-dup cluster at 100 TB
    // would otherwise make the bucket join quadratic in the largest
    // bucket; the same cap is applied in GoldenOracles.embedNearDup].
    "q36_embed_neardup" -> ((s, dir) => {
      val BUCKET_CAP = 64
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val emb = embAugmented(raw)
      val dim = raw.select(size(col("v"))).head().getInt(0)
      val W = planeWeights(24, dim)
      val banded = emb
        .select(col("vec_id"), col("v"), explode(rhpTables(col("v"), W, 4, 6)).as("ts"))
        .select(col("vec_id"), col("v"), col("ts.t").as("t"), col("ts.sig").as("sig"))
      // mega-bucket cap: hot buckets are few — broadcast anti-join them out
      val hot = banded.groupBy("t", "sig").count()
        .filter(col("count") > BUCKET_CAP).select("t", "sig")
      val pruned = banded.join(broadcast(hot), Seq("t", "sig"), "left_anti")
      val a = pruned.select(col("t"), col("sig"), col("vec_id").as("vec_a"))
      val b = pruned.select(col("t"), col("sig"), col("vec_id").as("vec_b"))
      val pairs = a.join(b, Seq("t", "sig"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      val va = emb.select(col("vec_id").as("vec_a"), col("v").as("v_a"))
      val vb = emb.select(col("vec_id").as("vec_b"), col("v").as("v_b"))
      pairs.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
        .withColumn("cos", cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.9)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos4"))
        .orderBy("vec_a", "vec_b")
    }),

    // SemDeDup (q59): the composed semantic-dedup pipeline — k-means
    // clusters (single-sourced with q50's kmeansCentroids), then
    // WITHIN-CLUSTER near-dup candidates via (cid, table, sig)-keyed
    // RHP-LSH buckets (capped, q25/q36 hygiene — candidate generation
    // provably bounded: every join is an equi-join on cluster+bucket
    // keys, nothing all-pairs across clusters), exact cosine >= 0.9
    // confirm, and the pinned representative rule: a vector is KEPT iff
    // it has no lower-id near-dup in its cluster; a dropped vector
    // reports dup_of = its smallest such neighbor (sentinels -1/0.0 on
    // kept rows). Oracle: golden sequential model (GoldenOracles
    // .semDedup) + the DuckDB gate independently re-verifies every
    // dropped row's cosine from SQL-reconstructed augmented vectors.
    "q59_semdedup" -> ((s, dir) => {
      val BUCKET_CAP = 64
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val emb = embAugmented(raw).persist()
      emb.count() // materialize: kmeans iterations + banding re-scan this
      val (cents, _) = kmeansCentroids(emb, 8, 25)
      val cells = emb.withColumn("cid", nearest_centroid(col("v"), cents))
      val dim = raw.select(size(col("v"))).head().getInt(0)
      val W = planeWeights(24, dim)
      val banded = cells
        .select(col("vec_id"), col("cid"), explode(rhpTables(col("v"), W, 4, 6)).as("ts"))
        .select(col("vec_id"), col("cid"), col("ts.t").as("t"), col("ts.sig").as("sig"))
      val hot = banded.groupBy("cid", "t", "sig").count()
        .filter(col("count") > BUCKET_CAP).select("cid", "t", "sig")
      val pruned = banded.join(broadcast(hot), Seq("cid", "t", "sig"), "left_anti")
      val a = pruned.select(col("cid"), col("t"), col("sig"), col("vec_id").as("vec_a"))
      val b = pruned.select(col("cid"), col("t"), col("sig"), col("vec_id").as("vec_b"))
      val pairs = a.join(b, Seq("cid", "t", "sig"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      val va = emb.select(col("vec_id").as("vec_a"), col("v").as("v_a"))
      val vb = emb.select(col("vec_id").as("vec_b"), col("v").as("v_b"))
      val near = pairs.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
        .withColumn("cos", cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.9)
        .select("vec_a", "vec_b", "cos").persist()
      near.count() // materialize: read twice below (min + cos recovery)
      val drops = near.groupBy(col("vec_b").as("vec_id")).agg(min(col("vec_a")).as("dup_of"))
      val dupCos = drops.join(
        near.select(col("vec_b").as("vec_id"), col("vec_a").as("dup_of"), col("cos")),
        Seq("vec_id", "dup_of"))
        .select(col("vec_id"), col("dup_of"), round(col("cos"), 4).as("cos4"))
      val out = cells.select("vec_id", "cid")
        .join(dupCos, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"),
          col("dup_of").isNull.cast("int").as("kept"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
          coalesce(col("cos4"), lit(0.0)).as("cos4"))
        .orderBy("vec_id")
        .persist()
      out.count()
      near.unpersist(false)
      emb.unpersist(false)
      out
    }),

    // vector stats via higher-order functions (fully SQL-checkable)
    "q34_embedding_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("vec_id")).as("n_vecs"),
          min(size(col("embedding"))).as("min_dim"),
          max(size(col("embedding"))).as("max_dim"))
        .orderBy("label")
    }),
  )

  /** The embeddings table has no near-dups, so the near-dup family
    * (q36, q59) appends deterministic exact + perturbed copies
    * [PINNED formulas, mirrored in GoldenOracles and the q59 oracle's
    * SQL reconstruction]: exact copies at +1e6 for vec_id % 20 == 0,
    * elementwise +0.05·((d%7)−3) perturbations at +2e6 for
    * vec_id % 15 == 0. */
  private[graft] def embAugmented(raw: DataFrame): DataFrame =
    raw
      .unionByName(raw.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("v")))
      .unionByName(raw.filter(col("vec_id") % 15 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
            (x, d) => x + lit(0.05) * (pmod(d, lit(7)) - lit(3)).cast("double")).as("v")))

  /** Lloyd k-means to a centroid fixpoint (or maxIters). Seeds: every
    * 31st vec_id, first k, in vec_id order — the q35 seeding rule.
    * `emb` must be (vec_id, v: array<double>) and should be cached by
    * the caller (each iteration scans it exactly once). Semantics
    * [PINNED, mirrored bit-for-bit in GoldenOracles.kmeans]: assignment
    * = min (dist2, cid); mean = Σ decimal(27,15) → double, / count;
    * empty cell keeps its previous centroid; stop when the centroid
    * array repeats exactly or after maxIters. */
  private[graft] def kmeansCentroids(emb: DataFrame, k: Int, maxIters: Int)
      : (Array[(Int, Array[Double])], Int) = {
    var cents: Array[(Int, Array[Double])] =
      emb.filter(col("vec_id") % 31 === 0)
        .orderBy("vec_id").limit(k).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val means: Map[Int, Array[Double]] =
        emb.withColumn("cid", nearest_centroid(col("v"), cents))
          .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg((sum(col("x").cast("decimal(27,15)")).cast("double") / count(lit(1))).as("x"))
          .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
          .select(col("cid"), transform(col("px"), p => p.getField("x")).as("c"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      val next = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      converged = next.zip(cents).forall { case ((_, a), (_, b)) =>
        java.util.Arrays.equals(a, b) }
      cents = next
      iters += 1
    }
    (cents, iters)
  }

  /** Golden fixtures from the independent plain-Scala ANN model
    * (graft.oracle.GoldenOracles), written during Verify. Single-sourced
    * path (pinned to the correctness tier — Verify runs at sf0.01). */
  private val GOLD =
    graft.oracle.GoldenOracles.dirFor(graft.corpus.CorpusGen.Correctness)

  val oracle: Map[String, String] = Map(
    "q29_ann_lsh" ->
      s"""SELECT query_id, rank, neighbor_id, cos4
         |FROM read_parquet('$GOLD/q29_ann_lsh.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin,

    "q35_ann_ivf" ->
      s"""SELECT query_id, rank, neighbor_id, cos4
         |FROM read_parquet('$GOLD/q35_ann_ivf.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin,

    "q36_embed_neardup" ->
      s"""SELECT vec_a, vec_b, cos4
         |FROM read_parquet('$GOLD/q36_embed_neardup.parquet/*.parquet')
         |ORDER BY vec_a, vec_b""".stripMargin,

    // EXACT assignment/distance comes from the golden fixture
    // (GoldenOracles.kmeans — an independent sequential Lloyd model);
    // DuckDB independently re-verifies every row with its own list
    // arithmetic: the assigned distance matches d4 within rounding
    // tolerance AND no other centroid is closer (the argmin property) —
    // a failing check drops rows → red row-count gate. Same two-sided
    // scheme as q28 (golden ordering + independent value check).
    "q50_kmeans" ->
      // cross join g × centroids (K rows per vec) then MIN per vec: the
      // natural correlated-subquery form binds "e" inside a list lambda,
      // which DuckDB 1.0 cannot correlate (Binder Error)
      s"""WITH g AS (SELECT vec_id, cid, d4
         |  FROM read_parquet('$GOLD/q50_kmeans.parquet/*.parquet')),
         |c AS (SELECT cid, c FROM read_parquet('$GOLD/q50_centroids.parquet/*.parquet')),
         |dists AS (
         |  SELECT g.vec_id, g.cid, g.d4, c2.cid AS ocid,
         |    list_sum(list_transform(range(1, len(c2.c) + 1),
         |      i -> (CAST(e.embedding[i] AS DOUBLE) - c2.c[i]) ^ 2)) AS d
         |  FROM g JOIN embeddings e ON e.vec_id = g.vec_id CROSS JOIN c c2),
         |chk AS (
         |  SELECT vec_id, cid, d4,
         |    MIN(CASE WHEN ocid = cid THEN d END) AS dassign,
         |    MIN(d) AS dmin
         |  FROM dists GROUP BY vec_id, cid, d4)
         |SELECT vec_id, cid, d4 FROM chk
         |WHERE abs(d4 - dassign) <= 1e-2 AND dassign <= dmin + 1e-6
         |ORDER BY vec_id""".stripMargin,

    // RANK ordering comes from the golden fixture (GoldenOracles
    // .cosineTopK): the rank orders by the UNROUNDED cosine, and
    // list_cosine_similarity's fold can differ from the engine's by an
    // ulp, swapping tie-adjacent neighbors — the cross-engine
    // float-ordering hazard that moved q29/q35/q36 to golden fixtures.
    // The cosine VALUES are additionally cross-checked against DuckDB's
    // own independent list_cosine_similarity within 2e-4 (round-4 review:
    // the golden fold is deliberately bit-identical to the engine kernel,
    // so without this a systematic error in the shared formula would pass
    // both sides; a failing tolerance drops rows → red row-count gate).
    "q28_cosine_topk" ->
      s"""SELECT g.query_id, g.rank, g.neighbor_id, g.cos4
         |FROM read_parquet('$GOLD/q28_cosine_topk.parquet/*.parquet') g
         |JOIN embeddings q ON q.vec_id = g.query_id
         |JOIN embeddings n ON n.vec_id = g.neighbor_id
         |WHERE abs(g.cos4 - list_cosine_similarity(q.embedding, n.embedding)) <= 2e-4
         |ORDER BY g.query_id, g.rank""".stripMargin,

    // EXACT rows come from the golden sequential model (GoldenOracles
    // .semDedup); DuckDB independently re-verifies every DROPPED row:
    // it reconstructs the augmented vectors from the raw embeddings
    // table with the pinned formulas and checks the claimed cos4
    // against its own list_cosine_similarity within 2e-4 (plus that the
    // pair sits in one cluster per the golden labels and dup_of <
    // vec_id). A failing check drops rows -> red row-count gate.
    "q59_semdedup" ->
      s"""WITH g AS (SELECT vec_id, cid, kept, dup_of, cos4
         |  FROM read_parquet('$GOLD/q59_semdedup.parquet/*.parquet')),
         |aug AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
         |  FROM embeddings WHERE vec_id % 20 = 0
         |  UNION ALL
         |  SELECT vec_id + 2000000, list_transform(range(1, len(embedding) + 1),
         |    i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) + 0.05 * (((i - 1) % 7) - 3))
         |  FROM embeddings WHERE vec_id % 15 = 0)
         |SELECT g.vec_id, g.cid, g.kept, g.dup_of, g.cos4
         |FROM g
         |LEFT JOIN aug a ON a.vec_id = g.dup_of
         |LEFT JOIN aug b ON b.vec_id = g.vec_id
         |LEFT JOIN g ga ON ga.vec_id = g.dup_of
         |WHERE g.kept = 1
         |   OR (g.dup_of < g.vec_id AND ga.cid = g.cid
         |       AND abs(g.cos4 - list_cosine_similarity(a.v, b.v)) <= 2e-4)
         |ORDER BY g.vec_id""".stripMargin,

    "q34_embedding_stats" ->
      """SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vecs,
        | CAST(MIN(len(embedding)) AS INT) AS min_dim,
        | CAST(MAX(len(embedding)) AS INT) AS max_dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
  )
}
