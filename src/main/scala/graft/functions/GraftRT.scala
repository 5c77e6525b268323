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
    * with '/'), the end of the base's path (query-only "?…" refs keep
    * the full base path per §5.2.2, dropping the base's own query), or
    * one past the last '/' of the base's path (§5.2.3
    * merge). The base must itself pass [[isCanonicalAscii]], which
    * guarantees scheme/host/port are already normal and its path has
    * no dot segments. */
  def fastResolveAscii(ref: UTF8String, base: UTF8String): UTF8String = {
    val n = ref.numBytes()
    if (n == 0) return null
    def b(j: Int): Int = ref.getByte(j) & 0xFF
    // leading-byte disqualifiers FIRST: most ineligible refs (lead
    // "."/".." segments, protocol-relative, scheme'd absolutes — which
    // hit the ':' check within a few bytes) bail before paying either
    // the full ref scan or the base validation. Link mixes are mostly
    // ineligible renderings, so this ordering is what keeps the fast
    // path a net win on real corpora, not just on eligible-only input.
    val absolute = b(0) == '/'
    // query-only ref ("?page=2"): §5.2.2 keeps the FULL base path and
    // replaces only the query — a different prefix rule than the
    // last-segment merge below (round-3 review fix: the merge rule
    // silently dropped the base's last path segment for these)
    val queryOnly = b(0) == '?'
    if (absolute && n >= 2 && b(1) == '/') return null // protocol-relative: authority swap
    if (!absolute && b(0) == '.') return null // "."/".."/"./…"/"../…" lead segments
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
    if (!isCanonicalAscii(base)) return null // base must be provably canonical
    // base prefix: end of authority (first '/' — isCanonicalAscii
    // guarantees one), or one past the last path '/' for relative refs
    val bn = base.numBytes()
    def bb(j: Int): Int = base.getByte(j) & 0xFF
    var p = if (bb(4) == ':') 7 else 8 // http:// vs https://
    while (p < bn && bb(p) != '/') p += 1
    val prefixEnd =
      if (absolute) p
      else if (queryOnly) {
        // full base path, base's own query (if any) dropped
        var q = p
        while (q < bn && bb(q) != '?') q += 1
        q
      } else {
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

  /** Byte-level link extraction, equivalent by construction (and by
    * property test) to [[graft.urls.UrlExtract.extract]] — the PINNED
    * grammar's reference implementation, which stays as the sequential
    * oracle. This path skips the UTF8String→String decode, the two
    * regex matchers, and the per-link String→UTF8String re-encode that
    * dominated the steady-state link-extraction stage (extract_urls
    * runs once per exploded text span — the hottest kernel after
    * canonicalize). Two phases mirror the two matchers exactly:
    * ascending non-overlapping `href="…"` value ranges first (resume
    * after the closing quote; a missing close quote ends the phase —
    * no quote pair can follow), then ascending non-overlapping
    * `\bhttps?://[^\s"'<>]+` runs (ASCII word-boundary before the
    * 'h'; resume at match end), suppressed when they START inside an
    * href value (two-pointer — both lists ascend), merged by start
    * offset with href first on ties (the oracle's stable sort), each
    * with trailing `[.,;)]` stripped and empties dropped. ASCII
    * delimiters cannot occur inside UTF-8 continuation bytes, so byte
    * ranges equal the oracle's char ranges verbatim. */
  def extractUTF8(text: UTF8String): ArrayData = {
    val n = text.numBytes()
    if (n < 7) return EMPTY_ARRAY // shortest link: http:// + 1 char
    def b(j: Int): Int = text.getByte(j) & 0xFF
    def isWordByte(c: Int): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
    // Java's \b word predicate without UNICODE_CHARACTER_CLASS is
    // `ch == '_' || Character.isLetterOrDigit(ch)` on the CODE POINT
    // (Pattern.Bound) — Unicode letters before the 'h' kill the
    // boundary, so a non-ASCII predecessor must be decoded, not treated
    // as a boundary byte (caught by the property test: "préhttps://…").
    def isWordBefore(idx: Int): Boolean = {
      val c = b(idx - 1)
      if (c < 0x80) isWordByte(c)
      else {
        var s = idx - 1
        while (s > 0 && (b(s) & 0xC0) == 0x80) s -= 1
        val lead = b(s)
        val len = idx - s
        val cp =
          if (lead >= 0xC0 && lead < 0xE0 && len == 2)
            ((lead & 0x1F) << 6) | (b(s + 1) & 0x3F)
          else if (lead >= 0xE0 && lead < 0xF0 && len == 3)
            ((lead & 0x0F) << 12) | ((b(s + 1) & 0x3F) << 6) | (b(s + 2) & 0x3F)
          else if (lead >= 0xF0 && lead < 0xF8 && len == 4)
            ((lead & 0x07) << 18) | ((b(s + 1) & 0x3F) << 12) |
              ((b(s + 2) & 0x3F) << 6) | (b(s + 3) & 0x3F)
          else -1 // malformed: the regex would see U+FFFD (not a word char)
        cp >= 0 && Character.isLetterOrDigit(cp)
      }
    }
    def isAbsStop(c: Int): Boolean = // Java \s (ASCII) plus "'<>
      c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r' ||
        c == '"' || c == '\'' || c == '<' || c == '>'
    // phase 1: href value ranges
    var hs = EMPTY_INT; var he = EMPTY_INT; var nh = 0
    var i = 0
    while (i + 7 <= n) { // href=" + closing quote
      if ((b(i) | 0x20) == 'h' && (b(i + 1) | 0x20) == 'r' && (b(i + 2) | 0x20) == 'e' &&
        (b(i + 3) | 0x20) == 'f' && b(i + 4) == '=' && b(i + 5) == '"') {
        var j = i + 6
        while (j < n && b(j) != '"') j += 1
        if (j >= n) i = n // unterminated: no quote pair can follow
        else {
          if (nh == hs.length) { hs = grow(hs); he = grow(he) }
          hs(nh) = i + 6; he(nh) = j; nh += 1
          i = j + 1
        }
      } else i += 1
    }
    // phase 2: absolute URLs
    var as = EMPTY_INT; var ae = EMPTY_INT; var na = 0
    i = 0
    while (i + 7 <= n) {
      if ((b(i) | 0x20) == 'h' && (i == 0 || !isWordBefore(i)) &&
        (b(i + 1) | 0x20) == 't' && (b(i + 2) | 0x20) == 't' && (b(i + 3) | 0x20) == 'p') {
        var j = i + 4
        if (j < n && (b(j) | 0x20) == 's') j += 1
        if (j + 3 < n && b(j) == ':' && b(j + 1) == '/' && b(j + 2) == '/' &&
          !isAbsStop(b(j + 3))) { // [^…]+ needs ≥1 byte
          var e = j + 4
          while (e < n && !isAbsStop(b(e))) e += 1
          if (na == as.length) { as = grow(as); ae = grow(ae) }
          as(na) = i; ae(na) = e; na += 1
          i = e
        } else i += 1
      } else i += 1
    }
    if (nh == 0 && na == 0) return EMPTY_ARRAY
    // merge by start (href first on ties), suppress abs inside hrefs,
    // strip trailing punctuation, drop empties
    val res = new Array[Any](nh + na)
    var k = 0; var ih = 0; var ia = 0; var sup = 0
    def emit(s: Int, e0: Int): Unit = {
      var e = e0
      while (e > s && { val c = b(e - 1); c == '.' || c == ',' || c == ';' || c == ')' }) e -= 1
      if (e > s) {
        val arr = new Array[Byte](e - s)
        org.apache.spark.unsafe.Platform.copyMemory(text.getBaseObject, text.getBaseOffset + s,
          arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, e - s)
        res(k) = UTF8String.fromBytes(arr); k += 1
      }
    }
    while (ih < nh || ia < na) {
      if (ia >= na || (ih < nh && hs(ih) <= as(ia))) { emit(hs(ih), he(ih)); ih += 1 }
      else {
        val s = as(ia)
        while (sup < nh && he(sup) <= s) sup += 1
        if (!(sup < nh && hs(sup) <= s)) emit(s, ae(ia))
        ia += 1
      }
    }
    if (k == 0) EMPTY_ARRAY
    else if (k == res.length) new GenericArrayData(res)
    else new GenericArrayData(java.util.Arrays.copyOf(res.asInstanceOf[Array[AnyRef]], k))
  }

  private val EMPTY_INT = new Array[Int](0)
  private val EMPTY_ARRAY = new GenericArrayData(new Array[Any](0))
  private def grow(a: Array[Int]): Array[Int] =
    java.util.Arrays.copyOf(a, math.max(4, a.length * 2))
}
