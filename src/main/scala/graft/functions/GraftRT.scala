package graft.functions

import graft.urls.{UrlCanon, UrlExtract}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static runtime entry points for generated code.
  *
  * A top-level Scala object with no companion class gets static forwarder
  * methods, so whole-stage-codegen'd Java can call
  * `graft.functions.GraftRT.canonUTF8(...)` directly — the custom
  * expressions in [[GraftExpressions]] stay inside the codegen stage
  * instead of falling back to interpreted eval.
  */
object GraftRT {

  def canonUTF8(url: UTF8String, base: UTF8String): UTF8String = {
    if (url == null) return null
    // zero-allocation fast path: an absolute URL that is PROVABLY already
    // canonical passes through untouched (no UTF8String→String→UTF8String
    // round-trip — that allocation churn was the measured memory-bus
    // ceiling on multi-core scaling, BENCH/BASELINE.md). The byte scan is
    // conservative: any feature needing normalization falls through.
    if (isCanonicalAscii(url)) return url
    val r = UrlCanon.canonicalize(url.toString, if (base == null) null else base.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** True only when `canonicalize(u, *) == u` is guaranteed: lowercase
    * http(s) scheme, lowercase reg-name host (no userinfo, no IPv6
    * literal), non-default port, a present path with no "." / ".."
    * segments, no percent-escapes, no fragment, no empty query, printable
    * ASCII throughout. Property-tested against the canonicalizer. */
  def isCanonicalAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    def b(j: Int): Int = u.getByte(j) & 0xFF
    if (n < 8 || b(0) != 'h' || b(1) != 't' || b(2) != 't' || b(3) != 'p') return false
    var i = 0
    var defPort: String = null
    if (b(4) == ':' && b(5) == '/' && b(6) == '/') { i = 7; defPort = "80" }
    else if (b(4) == 's' && n >= 9 && b(5) == ':' && b(6) == '/' && b(7) == '/') { i = 8; defPort = "443" }
    else return false
    val hostStart = i
    while (i < n && { val c = b(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '.' || c == '-' }) i += 1
    if (i == hostStart) return false
    if (i < n && b(i) == ':') { // explicit port: digits, not the default
      i += 1
      val ps = i
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == ps) return false
      if (i - ps == defPort.length) {
        var k = 0
        var same = true
        while (k < defPort.length) { if (b(ps + k) != defPort.charAt(k)) same = false; k += 1 }
        if (same) return false
      }
    }
    if (i >= n || b(i) != '/') return false // canonical form always has a path
    var inQuery = false
    while (i < n) {
      val c = b(i)
      if (c < 0x21 || c > 0x7E || c == '%' || c == '#') return false
      if (!inQuery) {
        if (c == '?') inQuery = true
        else if (c == '/' && i + 1 < n && b(i + 1) == '.') {
          val j = i + 2
          if (j >= n || b(j) == '/' || b(j) == '?') return false // "/." segment
          if (b(j) == '.' && (j + 1 >= n || b(j + 1) == '/' || b(j + 1) == '?')) return false // ".."
        }
      }
      i += 1
    }
    b(n - 1) != '?' // a bare trailing '?' would be stripped
  }

  def hostUTF8(canonical: UTF8String): UTF8String =
    if (canonical == null) null
    else UTF8String.fromString(UrlCanon.hostOf(canonical.toString))

  def pathUTF8(canonical: UTF8String): UTF8String =
    if (canonical == null) null
    else UTF8String.fromString(UrlCanon.pathOf(canonical.toString))

  def extractUTF8(text: UTF8String): ArrayData = {
    val links = UrlExtract.extract(if (text == null) null else text.toString)
    val out = new Array[Any](links.length)
    var i = 0
    while (i < links.length) { out(i) = UTF8String.fromString(links(i)); i += 1 }
    new GenericArrayData(out)
  }
}
