package graft.urls

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit URL identity — exactly Spark's `xxhash64(col)` built-in
  * (XXH64 with seed 42 over UTF-8 bytes), callable from driver-side /
  * oracle code so the sequential model and the engine agree bit-for-bit
  * (BASELINE.json:6 "RFC 3986 normalize + xxHash64").
  */
object UrlHash {
  def hash64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUTF8String(u, 42L)
  }
}
