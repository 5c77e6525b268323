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
    if (base != null) {
      // single-allocation fast path for the OTHER half of extracted
      // links (round 3): a plain relative reference against a provably
      // canonical base resolves by byte concatenation — RFC 3986 §5.2.2
      // collapses to prefix(base) + ref when the ref needs no percent,
      // case, or dot-segment normalization. Property-tested equal to
      // the full canonicalizer whenever it applies.
      val fast = fastResolveAscii(url, base)
      if (fast != null) return fast
    }
    val r = UrlCanon.canonicalize(url.toString, if (base == null) null else base.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Byte-level resolve of a relative reference against a canonical
    * base; null = not eligible (caller falls back to the full parser).
    *
    * Eligible refs are printable ASCII with no '%', '#' or ':' (a ':'
    * could start a scheme or an odd authority form), not
    * protocol-relative ("//…"), with no "." / ".." segments, not ending
    * in a bare '?' (which canonicalize strips), and — for
    * path-relative refs — not starting with '.': for those,
    * canonicalize(ref, base) is exactly
    *   base.take(prefixEnd) ++ ref
    * where prefixEnd is the end of the base's authority (ref starts
    * with '/') or one past the last '/' of the base's path (§5.2.3
    * merge). The base must itself pass [[isCanonicalAscii]], which
    * guarantees scheme/host/port are already normal and its path has
    * no dot segments. */
  def fastResolveAscii(ref: UTF8String, base: UTF8String): UTF8String = {
    val n = ref.numBytes()
    if (n == 0 || !isCanonicalAscii(base)) return null
    def b(j: Int): Int = ref.getByte(j) & 0xFF
    var i = 0
    var inQuery = false
    while (i < n) {
      val c = b(i)
      if (c < 0x21 || c > 0x7E || c == '%' || c == '#') return null
      if (!inQuery) {
        if (c == '?') inQuery = true
        else if (c == ':') return null
        else if (c == '/' && i + 1 < n && b(i + 1) == '.') {
          // "/." or "/.." segment → needs remove_dot_segments
          val j = i + 2
          if (j >= n || b(j) == '/' || b(j) == '?') return null
          if (b(j) == '.' && (j + 1 >= n || b(j + 1) == '/' || b(j + 1) == '?')) return null
        }
      }
      i += 1
    }
    if (b(n - 1) == '?') return null // canonicalize drops a bare trailing '?'
    val absolute = b(0) == '/'
    if (absolute && n >= 2 && b(1) == '/') return null // protocol-relative: authority swap
    if (!absolute && b(0) == '.') return null // "."/".."/"./…"/"../…" lead segments
    // base prefix: end of authority (first '/' — isCanonicalAscii
    // guarantees one), or one past the last path '/' for relative refs
    val bn = base.numBytes()
    def bb(j: Int): Int = base.getByte(j) & 0xFF
    var p = if (bb(4) == ':') 7 else 8 // http:// vs https://
    while (p < bn && bb(p) != '/') p += 1
    val prefixEnd =
      if (absolute) p
      else {
        var q = p
        var last = p
        while (q < bn && bb(q) != '?') { if (bb(q) == '/') last = q; q += 1 }
        last + 1
      }
    val out = new Array[Byte](prefixEnd + n)
    org.apache.spark.unsafe.Platform.copyMemory(base.getBaseObject, base.getBaseOffset,
      out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, prefixEnd)
    org.apache.spark.unsafe.Platform.copyMemory(ref.getBaseObject, ref.getBaseOffset,
      out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + prefixEnd, n)
    UTF8String.fromBytes(out)
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
