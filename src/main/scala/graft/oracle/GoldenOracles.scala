package graft.oracle

import graft.corpus.CorpusGen
import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.SparkSession

/** Independent, non-Spark reimplementations of the three queries whose
  * semantics are not directly DuckDB-SQL-expressible (q09 crawl, q29
  * LSH-ANN, q35 IVF-ANN), emitted as golden parquet fixtures so the
  * driver's DuckDB gate can `read_parquet` them and every SparkEntry
  * query gets a green CORRECTNESS row (round-1 gap: three `no_oracle`
  * rows).
  *
  * Independence: q09 comes from [[CrawlOracle]] — the sequential
  * single-threaded crawl model (plain Scala loops over in-memory maps);
  * q29/q35 are plain-Scala loops over the collected embeddings table
  * using `java.security.MessageDigest` md5 and explicit IEEE fold
  * orders. Nothing here shares Catalyst expression code with the
  * queries under test; Spark is used only to WRITE the parquet files.
  *
  * Exact-match notes (all [PINNED], mirrored in queries/VectorOps):
  *  - fold order of every double reduction is array-index order, seeded
  *    with 0.0 (matches `aggregate(zip_with(...), lit(0.0), _ + _)`);
  *  - the random-hyperplane term is (x * (h%1001 - 500)) / 500 in that
  *    association order (Spark parses `x * (A - 500.0) / 500.0` as
  *    `(x * (A-500.0)) / 500.0`);
  *  - round(d, 4) is `BigDecimal.valueOf(d).setScale(4, HALF_UP)` —
  *    Spark's Round semantics for DoubleType;
  *  - q35 centroid means sum through decimal(27,15) (order-independent),
  *    i.e. Σ BigDecimal.valueOf(x).setScale(15, HALF_UP), cast to double,
  *    divided by the count in double.
  */
object GoldenOracles {

  val Root = "/root/repo/target/golden"
  def dirFor(tier: CorpusGen.Tier): String = s"$Root/${tier.name}"

  final case class FetchRow(seq: Long, url_canon: String, host: String, depth: Int,
    round: Int, fetch_ts: Long, status: String, doc_id: String)
  final case class AnnRow(query_id: Long, rank: Int, neighbor_id: Long, cos4: Double)

  // ---- shared scalar kernels ------------------------------------------

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  private def round4(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP).doubleValue()

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** (h % 1001 - 500) numerator of the md5-derived plane weight; the
    * /500.0 happens AFTER the x* multiply (association order matters). */
  private def planeNum(p: Int, d: Int): Double = {
    val h = java.lang.Long.parseLong(md5hex(s"${p}_$d").substring(0, 6), 16)
    (h % 1001L).toDouble - 500.0
  }

  /** Signature from PRECOMPUTED weights w(p,d) = planeNum(p,d)/500.0 —
    * since round 3 this is the one [PINNED] RHP formula for q29 AND q36
    * (the engine computes it in the codegen RhpSig expression from the
    * same driver-precomputed weights; round 2's q29 divided by 500 after
    * the multiply instead, a different IEEE association — both sides
    * moved in lockstep). */
  private def rhpSigW(v: Array[Double], w: Array[Array[Double]], firstPlane: Int,
                      bits: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      val wp = w(firstPlane + j)
      var acc = 0.0; var d = 0
      while (d < v.length) { acc += v(d) * wp(d); d += 1 }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  private def topK(queryId: Long, qv: Array[Double], cands: Iterable[(Long, Array[Double])],
                   k: Int): Seq[AnnRow] =
    cands.toSeq
      .map { case (id, v) => (id, cosine(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k)
      .zipWithIndex
      .map { case ((id, c), i) => AnnRow(queryId, i + 1, id, round4(c)) }

  private def loadEmbeddings(spark: SparkSession, sfDir: String): Array[(Long, Array[Double])] = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Float](1).toArray.map(_.toDouble)
        (id, v)
      }.sortBy(_._1)
    // pinned precondition: a zero-norm vector makes every cosine NaN,
    // and Spark's desc window ranks NaN FIRST while this oracle's
    // ascending sort on -c ranks it last — the two "correct" orderings
    // silently diverge. Fail loud instead (review finding).
    emb.foreach { case (id, v) =>
      require(v.exists(_ != 0.0), s"zero-norm embedding vec_id=$id: cosine undefined")
    }
    emb
  }

  // ---- q28: exact brute-force cosine top-k -----------------------------
  // Golden (not DuckDB) for the same reason as q29/q35: the rank orders
  // by the UNROUNDED cosine, and two engines' independent float folds can
  // differ by an ulp and swap tie-adjacent neighbors (round-3 review).
  // This plain-Scala ascending fold is bit-identical to the engine's
  // codegen CosineSim by construction (VectorExprSpec pins the kernels).

  def cosineTopK(emb: Array[(Long, Array[Double])], k: Int = 5): Seq[AnnRow] =
    emb.collect { case (qid, qv) if qid % 40 == 0 =>
      topK(qid, qv, emb.iterator.filter(_._1 != qid).toSeq, k)
    }.flatten.toSeq

  // ---- q29: multi-table random-hyperplane LSH ANN ---------------------

  def annLsh(emb: Array[(Long, Array[Double])], tables: Int = 4, bits: Int = 4,
             k: Int = 5): Seq[AnnRow] = {
    val dim = emb.head._2.length
    val w: Array[Array[Double]] =
      Array.tabulate(tables * bits, dim)((p, d) => planeNum(p, d) / 500.0)
    val sigs: Map[Long, Array[Long]] = emb.map { case (id, v) =>
      id -> Array.tabulate(tables)(t => rhpSigW(v, w, t * bits, bits))
    }.toMap
    emb.collect { case (qid, qv) if qid % 40 == 0 =>
      val qsig = sigs(qid)
      val cands = emb.iterator.collect {
        case (id, v) if id != qid && (0 until tables).exists(t => sigs(id)(t) == qsig(t)) =>
          (id, v)
      }.toSeq
      topK(qid, qv, cands, k)
    }.flatten.toSeq
  }

  // ---- q35: IVF (k-means-lite coarse quantizer, nprobe=2) -------------

  def annIvf(emb: Array[(Long, Array[Double])], kCells: Int = 16, nprobe: Int = 2,
             k: Int = 5): Seq[AnnRow] = {
    val dim = emb.head._2.length
    // deterministic seeding: every 31st vec_id, first 16 in vec_id order
    val seeds0: Array[(Int, Array[Double])] = emb.filter(_._1 % 31 == 0)
      .sortBy(_._1).take(kCells).zipWithIndex.map { case ((_, v), i) => (i, v) }
    def assign(cents: Array[(Int, Array[Double])]): Map[Long, Int] =
      emb.map { case (id, v) =>
        id -> cents.map { case (cid, c) => (dist2(v, c), cid) }.min._2
      }.toMap
    // one Lloyd step: element-wise decimal-sum mean per cell (matches the
    // engine's order-independent decimal(27,15) centroid aggregation)
    val assign0 = assign(seeds0)
    val cents1: Array[(Int, Array[Double])] = emb.groupBy { case (id, _) => assign0(id) }
      .map { case (cid, members) =>
        val n = members.length
        val c = Array.tabulate(dim) { d =>
          val sum = members.map { case (_, v) =>
            JBigDecimal.valueOf(v(d)).setScale(15, RoundingMode.HALF_UP)
          }.reduce(_.add(_))
          sum.doubleValue() / n
        }
        (cid, c)
      }.toArray.sortBy(_._1)
    val cellOf = assign(cents1)
    val byCell: Map[Int, Seq[(Long, Array[Double])]] =
      emb.toSeq.groupBy { case (id, _) => cellOf(id) }
    emb.collect { case (qid, qv) if qid % 40 == 0 =>
      val probed = cents1.map { case (cid, c) => (dist2(qv, c), cid) }
        .sortBy(identity).take(nprobe).map(_._2)
      val cands = probed.flatMap(cid => byCell.getOrElse(cid, Seq.empty))
        .filter(_._1 != qid)
      topK(qid, qv, cands, k)
    }.flatten.toSeq
  }

  // ---- q50: k-means (Lloyd to a centroid fixpoint) --------------------

  final case class KmeansRow(vec_id: Long, cid: Int, d4: Double)

  /** Sequential Lloyd model, [PINNED] semantics shared bit-for-bit with
    * `VectorOps.kmeansCentroids`: q35's seeding rule (every 31st vec_id,
    * first k, vec_id order), assignment = min (dist2, cid), element-wise
    * mean through decimal-15 sums (order-independent, matching the
    * engine's decimal(27,15) aggregation), empty cell keeps its previous
    * centroid, stop on exact centroid-array fixpoint or maxIters. */
  def kmeans(emb: Array[(Long, Array[Double])], k: Int = 8, maxIters: Int = 25)
      : (Seq[KmeansRow], Array[(Int, Array[Double])], Int) = {
    val dim = emb.head._2.length
    var cents: Array[(Int, Array[Double])] = emb.filter(_._1 % 31 == 0)
      .sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }
    def assign(cs: Array[(Int, Array[Double])]): Map[Long, Int] =
      emb.map { case (id, v) =>
        id -> cs.map { case (cid, c) => (dist2(v, c), cid) }.min._2
      }.toMap
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val a = assign(cents)
      val byCell = emb.groupBy { case (id, _) => a(id) }
      val next = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case None => (cid, old)
          case Some(members) =>
            val n = members.length
            (cid, Array.tabulate(dim) { d =>
              members.map { case (_, v) =>
                JBigDecimal.valueOf(v(d)).setScale(15, RoundingMode.HALF_UP)
              }.reduce(_.add(_)).doubleValue() / n
            })
        }
      }
      converged = next.zip(cents).forall { case ((_, x), (_, y)) =>
        java.util.Arrays.equals(x, y) }
      cents = next
      iters += 1
    }
    val fin = assign(cents)
    val centOf = cents.toMap
    val rows = emb.sortBy(_._1).map { case (id, v) =>
      val cid = fin(id)
      KmeansRow(id, cid, round4(dist2(v, centOf(cid))))
    }.toSeq
    (rows, cents, iters)
  }

  // ---- q36: embedding-cosine near-dup (LSH-bucketed candidates) -------

  final case class NearDupRow(vec_a: Long, vec_b: Long, cos4: Double)

  def embedNearDup(emb: Array[(Long, Array[Double])], tables: Int = 4, bits: Int = 6,
                   thresh: Double = 0.9, bucketCap: Int = 64): Seq[NearDupRow] = {
    val dim = emb.head._2.length
    // pinned plane weights: (md5_6("p_d") % 1001 - 500) / 500, driver-evaluated
    val w: Array[Array[Double]] =
      Array.tabulate(tables * bits, dim)((p, d) => planeNum(p, d) / 500.0)
    val aug = emb ++
      emb.filter(_._1 % 20 == 0).map { case (id, v) => (id + 1000000L, v) } ++
      emb.filter(_._1 % 15 == 0).map { case (id, v) =>
        (id + 2000000L, Array.tabulate(v.length)(d => v(d) + 0.05 * ((d % 7) - 3).toDouble))
      }
    val sigs: Array[Array[Long]] = aug.map { case (_, v) =>
      Array.tabulate(tables)(t => rhpSigW(v, w, t * bits, bits))
    }
    // [PINNED round 3] mega-bucket cap, mirroring the engine's q25-style
    // hot-bucket anti-join: collisions only count through (t, sig)
    // buckets of size ≤ bucketCap
    val bucketSize = scala.collection.mutable.Map.empty[(Int, Long), Int]
    sigs.foreach(sa => (0 until tables).foreach { t =>
      val k = (t, sa(t)); bucketSize(k) = bucketSize.getOrElse(k, 0) + 1
    })
    // bucket-grouped candidate generation, NOT an all-pairs scan: the
    // old O(|aug|²) double loop re-tested every pair against every table
    // (~1.6e11 iterations if ever pointed at the bench tier — review
    // finding). Grouping indices per kept (t, sig) bucket visits only
    // within-bucket pairs (each bucket ≤ bucketCap), then pairs are
    // sorted into the old (i, k) emission order so the fixture bytes are
    // unchanged (the determinism test pins this).
    val byBucket = scala.collection.mutable.Map.empty[(Int, Long), scala.collection.mutable.ArrayBuffer[Int]]
    var bi = 0
    while (bi < sigs.length) {
      var t = 0
      while (t < tables) {
        val k = (t, sigs(bi)(t))
        if (bucketSize(k) <= bucketCap)
          byBucket.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) += bi
        t += 1
      }
      bi += 1
    }
    val n = aug.length.toLong
    val candPairs = scala.collection.mutable.HashSet.empty[Long] // i * n + k, i < k
    byBucket.valuesIterator.foreach { idxs =>
      var x = 0
      while (x < idxs.length) {
        var y = x + 1
        while (y < idxs.length) {
          val i = math.min(idxs(x), idxs(y)); val k = math.max(idxs(x), idxs(y))
          candPairs += i * n + k
          y += 1
        }
        x += 1
      }
    }
    val out = Seq.newBuilder[NearDupRow]
    candPairs.toArray.sorted.foreach { enc =>
      val i = (enc / n).toInt; val k = (enc % n).toInt
      val (ia, va) = aug(i); val (ib, vb) = aug(k)
      val (a, b, xa, xb) = if (ia < ib) (ia, ib, va, vb) else (ib, ia, vb, va)
      val c = cosine(xa, xb)
      if (c >= thresh) out += NearDupRow(a, b, round4(c))
    }
    out.result()
  }

  // ---- q59: SemDeDup (cluster -> within-cluster LSH prune) ------------

  final case class SemDedupRow(vec_id: Long, cid: Int, kept: Int, dup_of: Long, cos4: Double)

  /** Sequential SemDeDup model [PINNED, mirrored in VectorOps q59]:
    * the q36 augmentation, k-means clusters over the AUGMENTED set
    * (the same kmeans model as q50), candidate pairs only within
    * (cid, table, sig) buckets of size ≤ bucketCap, exact cosine ≥
    * thresh confirms, and a vector is kept iff it has no lower-id
    * near-dup in its cluster (dup_of = the smallest such neighbor;
    * sentinels -1 / 0.0 on kept rows). */
  def semDedup(emb: Array[(Long, Array[Double])], tables: Int = 4, bits: Int = 6,
               thresh: Double = 0.9, bucketCap: Int = 64,
               k: Int = 8, maxIters: Int = 25): Seq[SemDedupRow] = {
    val dim = emb.head._2.length
    val w: Array[Array[Double]] =
      Array.tabulate(tables * bits, dim)((p, d) => planeNum(p, d) / 500.0)
    val aug = emb ++
      emb.filter(_._1 % 20 == 0).map { case (id, v) => (id + 1000000L, v) } ++
      emb.filter(_._1 % 15 == 0).map { case (id, v) =>
        (id + 2000000L, Array.tabulate(v.length)(d => v(d) + 0.05 * ((d % 7) - 3).toDouble))
      }
    val (kmRows, _, _) = kmeans(aug, k, maxIters)
    val cidOf: Map[Long, Int] = kmRows.map(r => r.vec_id -> r.cid).toMap
    val sigs: Array[Array[Long]] = aug.map { case (_, v) =>
      Array.tabulate(tables)(t => rhpSigW(v, w, t * bits, bits))
    }
    val bucketSize = scala.collection.mutable.Map.empty[(Int, Int, Long), Int]
    var bi = 0
    while (bi < sigs.length) {
      val cid = cidOf(aug(bi)._1)
      var t = 0
      while (t < tables) {
        val key = (cid, t, sigs(bi)(t))
        bucketSize(key) = bucketSize.getOrElse(key, 0) + 1
        t += 1
      }
      bi += 1
    }
    val byBucket = scala.collection.mutable.Map
      .empty[(Int, Int, Long), scala.collection.mutable.ArrayBuffer[Int]]
    bi = 0
    while (bi < sigs.length) {
      val cid = cidOf(aug(bi)._1)
      var t = 0
      while (t < tables) {
        val key = (cid, t, sigs(bi)(t))
        if (bucketSize(key) <= bucketCap)
          byBucket.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty) += bi
        t += 1
      }
      bi += 1
    }
    val n = aug.length.toLong
    val candPairs = scala.collection.mutable.HashSet.empty[Long]
    byBucket.valuesIterator.foreach { idxs =>
      var x = 0
      while (x < idxs.length) {
        var y = x + 1
        while (y < idxs.length) {
          val i = math.min(idxs(x), idxs(y)); val j = math.max(idxs(x), idxs(y))
          candPairs += i * n + j
          y += 1
        }
        x += 1
      }
    }
    // dup_of = min lower-id near-dup per dropped vector, + that pair's cos
    val dupOf = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    candPairs.toArray.sorted.foreach { enc =>
      val i = (enc / n).toInt; val j = (enc % n).toInt
      val (ia, va) = aug(i); val (ib, vb) = aug(j)
      val (a, b, xa, xb) = if (ia < ib) (ia, ib, va, vb) else (ib, ia, vb, va)
      val c = cosine(xa, xb)
      if (c >= thresh) dupOf.updateWith(b) {
        case Some((pa, pc)) if pa <= a => Some((pa, pc))
        case _                         => Some((a, c))
      }
    }
    aug.sortBy(_._1).map { case (id, _) =>
      dupOf.get(id) match {
        case Some((a, c)) => SemDedupRow(id, cidOf(id), 0, a, round4(c))
        case None         => SemDedupRow(id, cidOf(id), 1, -1L, 0.0)
      }
    }.toSeq
  }

  // ---- entry point: write all golden fixtures for a tier --------------

  def writeAll(spark: SparkSession, sfDir: String): Unit = {
    val tier = CorpusGen.tierFor(sfDir)
    val dir = dirFor(tier)
    // wipe-then-write: a failed or interrupted regeneration must never
    // leave LAST run's fixtures where the DuckDB gate would silently
    // treat them as truth (stale-formula false green / false red —
    // review finding). After the wipe, a partial write yields loud
    // missing-file errors for exactly the unwritten queries.
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    import spark.implicits._

    // q09: the sequential crawl model (CrawlOracle) with the exact config
    // the q09 query uses (graft.queries.CrawlOps.crawlConfigFor)
    val corpus = CorpusGen.build(tier)
    val cfg = graft.queries.CrawlOps.crawlConfigFor(
      spark.sessionState.conf.numShufflePartitions, tier)
    val res = new CrawlOracle(corpus, cfg).run()
    val fetchRows = res.log.map(f => FetchRow(f.seq, f.urlCanon, f.host, f.depth,
      f.round, f.fetchTs, f.status, f.docId))
    fetchRows.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q09_crawl.parquet")

    // q37: the media-follow crawl variant. The query pins the SMOKE tier
    // regardless of the Verify tier (CrawlOps scaladoc: no second
    // bench-tier crawl per Bench run), so the golden is the sequential
    // oracle on the SMOKE corpus with the exact q37 config.
    val smoke = CorpusGen.Smoke
    val mediaCfg = graft.queries.CrawlOps.crawlConfigFor(
      spark.sessionState.conf.numShufflePartitions, smoke).copy(followMedia = true)
    val mediaRes = new CrawlOracle(CorpusGen.build(smoke), mediaCfg).run()
    mediaRes.log.map(f => FetchRow(f.seq, f.urlCanon, f.host, f.depth,
        f.round, f.fetchTs, f.status, f.docId))
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q37_media_crawl.parquet")

    // q51: the priority-scheduled crawl variant (smoke tier, like q37)
    val prioCfg = graft.queries.CrawlOps.crawlConfigFor(
      spark.sessionState.conf.numShufflePartitions, smoke).copy(priorityByUrlLen = true)
    val prioRes = new CrawlOracle(CorpusGen.build(smoke), prioCfg).run()
    prioRes.log.map(f => FetchRow(f.seq, f.urlCanon, f.host, f.depth,
        f.round, f.fetchTs, f.status, f.docId))
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q51_priority_crawl.parquet")

    // q60: the default-config smoke crawl whose fetch set feeds the
    // crawl-curation oracle (engine ≡ this model is already pinned by
    // the q09-equality tests under the same config)
    val curCfg = graft.queries.CrawlOps.crawlConfigFor(
      spark.sessionState.conf.numShufflePartitions, smoke)
    val curRes = new CrawlOracle(CorpusGen.build(smoke), curCfg).run()
    curRes.log.map(f => FetchRow(f.seq, f.urlCanon, f.host, f.depth,
        f.round, f.fetchTs, f.status, f.docId))
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q60_fetch.parquet")

    val emb = loadEmbeddings(spark, sfDir)
    cosineTopK(emb).toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/q28_cosine_topk.parquet")
    annLsh(emb).toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q29_ann_lsh.parquet")
    annIvf(emb).toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q35_ann_ivf.parquet")
    embedNearDup(emb).toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/q36_embed_neardup.parquet")
    val (kmRows, kmCents, _) = kmeans(emb)
    kmRows.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/q50_kmeans.parquet")
    kmCents.toSeq.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/q50_centroids.parquet")
    semDedup(emb).toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/q59_semdedup.parquet")
  }
}
