package graft

import graft.corpus.CorpusGen
import graft.crawl.{BloomAggregator, CuckooFilter, CuckooShardFilter}
import graft.urls.UrlHash
import org.apache.spark.sql.functions._

/** Sketch coverage: A2's UDAF bloom form and A4's CountMinSketch cheap
  * hot-host pass (SURVEY.md §2.4). */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("BloomAggregator UDAF: per-shard blooms with no false negatives, bounded FPP") {
    val n = 20000
    val hashes = (0 until n).map(i => UrlHash.hash64(s"https://h$i.example/p$i"))
    val df = hashes.toDF("url_hash")
      .withColumn("shard", pmod(col("url_hash"), lit(4L)))
    val agg = udaf(new BloomAggregator(n.toLong, 0.01))
    val shards = df.groupBy("shard").agg(agg(col("url_hash")).as("bloom"))
      .as[(Long, Array[Byte])].collect()
      .map { case (s, b) => s -> BloomAggregator.deserialize(b) }.toMap
    assert(shards.size == 4)
    // no false negatives, ever
    hashes.foreach { h =>
      assert(shards((((h % 4) + 4) % 4)).mightContainLong(h))
    }
    // observed FPP ≤ 2× nominal on unseen keys
    val probes = (0 until 20000).map(i => UrlHash.hash64(s"https://unseen$i.example/x"))
    val fp = probes.count(h => shards((((h % 4) + 4) % 4)).mightContainLong(h))
    assert(fp <= probes.size * 0.02, s"observed FPP ${fp.toDouble / probes.size}")
  }

  test("CountMinSketch pre-pass finds the Zipf-hot hosts (A4 scale path)") {
    val fx = CorpusGen.ensure(spark, CorpusGen.Smoke)
    val hosting = CorpusGen.hosting(spark, fx)
    val cms = hosting.stat.countMinSketch(col("host"), eps = 0.005, confidence = 0.99, seed = 42)
    val exact = hosting.groupBy("host").count()
      .as[(String, Long)].collect().toMap
    val hottest = exact.maxBy(_._2)
    // CMS never under-counts; estimate within eps * total of the truth
    val est = cms.estimateCount(hottest._1)
    assert(est >= hottest._2)
    assert(est <= hottest._2 + (0.005 * exact.values.sum).toLong + 1)
  }

  test("CuckooFilter: no false negatives, bounded FPP, delete works") {
    val n = 20000
    val cf = CuckooFilter.create(n)
    val keys = (0 until n).map(i => UrlHash.hash64(s"https://h$i.example/p$i"))
    keys.foreach(k => assert(cf.put(k), s"insert failed below capacity (occ=${cf.occupancy})"))
    // no false negatives — the J1 two-phase invariant
    keys.foreach(k => assert(cf.mightContain(k)))
    // bounded false positives on disjoint probes (16-bit fingerprints:
    // nominal ~2*4/2^16 per bucket pair; assert a loose 2% bound)
    val probes = (0 until n).map(i => UrlHash.hash64(s"https://absent$i.example/x$i"))
    val fp = probes.count(cf.mightContain)
    assert(fp.toDouble / n < 0.02, s"FPP too high: $fp/$n")
    // deletion — the capability blooms lack. Since the round-3 fix,
    // put() stores one copy PER INSERTED KEY (no dedup), so this holds
    // deterministically even for distinct keys aliasing to the same
    // bucket-pair + fingerprint (pre-fix it was probabilistically flaky:
    // an aliased pair shared one copy — review finding).
    val removed = keys.take(1000)
    removed.foreach(k => assert(cf.remove(k)))
    val still = removed.count(cf.mightContain)
    assert(still.toDouble / removed.size < 0.02, s"removed keys still maybe-present: $still")
    keys.drop(1000).foreach(k => assert(cf.mightContain(k), "delete must not evict other keys"))
  }

  test("CuckooFilter: removing an ALIASED key keeps its partner (no false negative)") {
    // find a key that aliases an already-inserted one through the
    // filter's own observable behavior: mightContain(x) before x was
    // ever inserted means a copy of x's fingerprint already sits in x's
    // bucket pair — exactly the aliasing the round-3 put() fix is for
    // (pre-fix, put(x) would dedup against the partner's copy and
    // remove(x) would then delete the PARTNER's only copy).
    val cf = CuckooFilter.create(40000)
    val inserted = scala.collection.mutable.ArrayBuffer.empty[Long]
    var aliased: Option[Long] = None
    var i = 0
    while (aliased.isEmpty && i < 40000) {
      val k = UrlHash.hash64(s"https://alias$i.example/")
      if (cf.mightContain(k)) aliased = Some(k)
      else { assert(cf.put(k)); inserted += k }
      i += 1
    }
    assert(aliased.isDefined, "no aliased key found in 40k candidates")
    val x = aliased.get
    assert(cf.put(x)) // stores x's own copy next to the partner's
    assert(cf.remove(x))
    inserted.foreach(k =>
      assert(cf.mightContain(k),
        "deleting an aliased key must not create a false negative for another key"))
  }

  test("CuckooShardFilter saturates conservatively (never a false negative)") {
    val small = CuckooFilter.create(64)
    val f = new CuckooShardFilter(small)
    val keys = (0 until 5000).map(i => UrlHash.hash64(s"https://sat$i.example/"))
    keys.foreach(f.put) // overload far past capacity → saturation
    assert(f.isSaturated)
    keys.foreach(k => assert(f.mightContain(k))) // degraded to always-maybe
  }

  test("BloomShardCache: a long crawl's superseded shard versions are evicted; " +
      "evicted entries reload correct content") {
    // a 1000-round crawl writes ~P new immutable shard files per round —
    // far more than the executor cache's MaxEntries (128). Eviction must
    // bound the footprint, and a later re-get of an evicted path (e.g. a
    // resume probing an old round's shard) must reload the REAL file, not
    // stale or wrong content. Paths are content-unique by construction
    // (uuid names), so a stale hit for a NEW round's file is impossible;
    // this pins the other direction.
    import graft.crawl.{BloomShardCache, HadoopConfSer, ShardFilter}
    val conf = new HadoopConfSer(spark.sparkContext.hadoopConfiguration)
    val dir = new java.io.File("target/test-shardcache")
    dir.mkdirs()
    val n = 300 // > MaxEntries
    val paths = (0 until n).map { i =>
      val f = ShardFilter.create("bloom", 100L, 0.01)
      f.put(i.toLong)
      val p = new java.io.File(dir, s"shard-ev-$i.bin")
      val out = new java.io.DataOutputStream(new java.io.FileOutputStream(p))
      try f.writeTo(out) finally out.close()
      p.getAbsolutePath
    }
    paths.zipWithIndex.foreach { case (p, i) =>
      assert(BloomShardCache.get(p, conf).mightContain(i.toLong))
    }
    assert(BloomShardCache.size <= 128,
      s"cache grew to ${BloomShardCache.size} entries — eviction broken")
    // the first paths were evicted by now; re-get must reload from disk
    // with the right content (its own key present, sibling keys absent —
    // a mixed-up entry would contain the wrong singleton)
    assert(BloomShardCache.get(paths(0), conf).mightContain(0L))
    assert(!BloomShardCache.get(paths(1), conf).mightContain(299L))
  }
}
