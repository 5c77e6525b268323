package graft.crawl

import java.io.{DataInputStream, DataOutputStream}

/** A cuckoo filter over 64-bit keys — the "cuckoo" alternative of the
  * north-star's "partitioned bloom/cuckoo URL-seen set" (BASELINE.json:6).
  *
  * Standard construction (Fan et al., "Cuckoo Filter: Practically Better
  * Than Bloom", CoNEXT 2014 — public paper): 4-slot buckets of 16-bit
  * fingerprints, two candidate buckets per key with the partial-key
  * displacement rule `b2 = b1 XOR hash(fp)`, bounded eviction (500
  * kicks). Compared to the bloom shards it adds DELETE support and
  * better space at low FPP (~7 bits/key at 3% vs bloom's ~10 at 1%);
  * like the bloom tier it has NO false negatives, so it is legal as the
  * J1 prefilter (exactness still comes from the anti-join tier).
  *
  * Not thread-safe (one filter per shard task, like the bloom shards).
  */
final class CuckooFilter private (
    val numBuckets: Int, // power of two
    private val table: Array[Char]) extends Serializable { // 4 slots per bucket; 0 = empty

  import CuckooFilter._

  private def bucketBase(b: Int): Int = b * SlotsPerBucket
  private def mask: Int = numBuckets - 1

  /** Fingerprint in [1, 0xFFFF] (0 is the empty slot marker). */
  private def fingerprint(key: Long): Char = {
    val h = mix(key, 0x9E3779B97F4A7C15L)
    val fp = ((h >>> 48) & 0xFFFF).toInt
    (if (fp == 0) 1 else fp).toChar
  }

  private def bucketOf(key: Long): Int = (mix(key, 0xC2B2AE3D27D4EB4FL) & mask).toInt

  private def altBucket(b: Int, fp: Char): Int = (b ^ (mix(fp.toLong, 0x165667B19E3779F9L)).toInt) & mask

  private def bucketContains(b: Int, fp: Char): Boolean = {
    val base = bucketBase(b)
    table(base) == fp || table(base + 1) == fp || table(base + 2) == fp || table(base + 3) == fp
  }

  private def tryInsert(b: Int, fp: Char): Boolean = {
    val base = bucketBase(b)
    var i = 0
    while (i < SlotsPerBucket) {
      if (table(base + i) == 0) { table(base + i) = fp; return true }
      i += 1
    }
    false
  }

  /** Insert; false when the filter is saturated (caller should resize —
    * the engine sizes shards up front like the bloom capacity).
    *
    * Deliberately stores a copy per call, even when an equal fingerprint
    * already sits in the bucket pair: deletion support REQUIRES
    * duplicates (Fan et al. §3.2) — round 2 deduped on insert, so two
    * distinct keys aliasing to the same bucket-pair+fingerprint shared
    * one copy and removing one key silently removed the other (a false
    * negative, the one thing the J1 prefilter must never produce).
    * Callers insert each url_hash once (deltas are exact-deduped), so
    * duplicate copies arise only from genuine aliasing collisions and
    * stay bounded. */
  def put(key: Long): Boolean = {
    val fp0 = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, fp0)
    if (tryInsert(b1, fp0) || tryInsert(b2, fp0)) return true
    // displace: bounded random-walk eviction
    var b = if ((mix(key, 0x27D4EB2F165667C5L) & 1L) == 0L) b1 else b2
    var fp = fp0
    var kicks = 0
    var rng = mix(key, 0x85EBCA77C2B2AE63L)
    while (kicks < MaxKicks) {
      val base = bucketBase(b)
      rng = mix(rng, 0x9E3779B97F4A7C15L)
      val slot = (rng & 3L).toInt
      val evicted = table(base + slot)
      table(base + slot) = fp
      fp = evicted
      b = altBucket(b, fp)
      if (tryInsert(b, fp)) return true
      kicks += 1
    }
    false
  }

  def mightContain(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucketOf(key)
    bucketContains(b1, fp) || bucketContains(altBucket(b1, fp), fp)
  }

  /** Delete ONE copy of the key's fingerprint — the capability blooms
    * lack (e.g. retiring URLs when a host is removed from the crawl).
    * Only legal for keys actually inserted (standard cuckoo contract). */
  def remove(key: Long): Boolean = {
    val fp = fingerprint(key)
    def removeFrom(b: Int): Boolean = {
      val base = bucketBase(b)
      var i = 0
      while (i < SlotsPerBucket) {
        if (table(base + i) == fp) { table(base + i) = 0.toChar; return true }
        i += 1
      }
      false
    }
    val b1 = bucketOf(key)
    removeFrom(b1) || removeFrom(altBucket(b1, fp))
  }

  def occupancy: Double = table.count(_ != 0).toDouble / table.length

  def writeTo(out: DataOutputStream): Unit = {
    out.writeInt(numBuckets)
    var i = 0
    while (i < table.length) { out.writeChar(table(i)); i += 1 }
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** splitmix64-style avalanche (public-domain construction). */
  private[crawl] def mix(x0: Long, salt: Long): Long = {
    var x = x0 + salt
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Capacity-sized like BloomFilter.create: ~95% max load over 4-slot
    * buckets; numBuckets rounded to a power of two for the XOR rule. */
  def create(expectedItems: Long): CuckooFilter = {
    val neededBuckets = math.max(2L, (expectedItems / (SlotsPerBucket * 0.95)).toLong + 1)
    val numBuckets = java.lang.Long.highestOneBit(neededBuckets * 2 - 1).toInt match {
      case n if n < neededBuckets => (n * 2).toInt
      case n => n
    }
    new CuckooFilter(numBuckets, new Array[Char](numBuckets * SlotsPerBucket))
  }

  def readFrom(in: DataInputStream): CuckooFilter = {
    val numBuckets = in.readInt()
    val table = new Array[Char](numBuckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = in.readChar(); i += 1 }
    new CuckooFilter(numBuckets, table)
  }
}
