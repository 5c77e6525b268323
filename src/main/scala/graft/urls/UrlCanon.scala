package graft.urls

/** RFC 3986 URL canonicalization, hand-rolled for determinism.
  *
  * Implements the normalization mandated by BASELINE.json:6 ("canonicalizes
  * URLs (RFC 3986 normalize + xxHash64)"): relative-reference resolution
  * (RFC 3986 §5.2), remove_dot_segments (§5.2.4), case normalization of
  * scheme + host (§6.2.2.1), percent-encoding normalization (§6.2.2.2 —
  * uppercase hex digits, decode unreserved characters), default-port
  * stripping, fragment removal.
  *
  * PINNED choices (reference source unavailable — SURVEY.md §0): query kept
  * verbatim (percent-normalized, NOT sorted); lone "?" dropped; empty path
  * with authority → "/"; userinfo kept as-is; invalid %-sequences left
  * untouched; only http/https with non-empty host are canonical (everything
  * else → null).
  *
  * All methods are pure and deterministic; `canonicalize` is the single
  * entry point shared by the Spark engine (via UDF / Catalyst expression in
  * graft.functions) and the sequential test oracle, so the two cannot
  * diverge.
  */
object UrlCanon {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** §6.2.2.2: uppercase %XX hex; decode %XX when it encodes an unreserved
    * character. Invalid sequences pass through unchanged. */
  def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h1 = hexVal(s.charAt(i + 1)); val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4) | h2
          if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
          else {
            sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** §5.2.4 remove_dot_segments, verbatim from the RFC algorithm. */
  def removeDotSegments(path: String): String = {
    var in = path
    val out = new StringBuilder(path.length)
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSegment(out) }
      else if (in == "/..") { in = "/"; trimLastSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        // move first segment (incl. leading "/" if present) to output
        var j = if (in.startsWith("/")) 1 else 0
        while (j < in.length && in.charAt(j) != '/') j += 1
        out.append(in.substring(0, j))
        in = in.substring(j)
      }
    }
    out.toString
  }

  private def trimLastSegment(out: StringBuilder): Unit = {
    var k = out.length - 1
    while (k >= 0 && out.charAt(k) != '/') k -= 1
    out.setLength(math.max(k, 0))
  }

  /** Parsed generic-syntax URI. `authority == null` means no "//" present;
    * `query == null` means no "?" present. Fragment is always discarded. */
  final case class Parts(scheme: String, authority: String, path: String, query: String)

  /** Split a URI reference into parts (RFC 3986 appendix B semantics,
    * without regex). Fragment is stripped. Scheme may be null (relative
    * reference). */
  def parse(raw0: String): Parts = {
    if (raw0 == null) return null
    var raw = raw0.trim
    val hash = raw.indexOf('#')
    if (hash >= 0) raw = raw.substring(0, hash)
    // scheme
    var scheme: String = null
    var rest = raw
    val colon = raw.indexOf(':')
    if (colon > 0) {
      var ok = isAlpha(raw.charAt(0))
      var i = 1
      while (ok && i < colon) {
        val c = raw.charAt(i)
        ok = isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
        i += 1
      }
      if (ok) { scheme = raw.substring(0, colon).toLowerCase; rest = raw.substring(colon + 1) }
    }
    // authority
    var authority: String = null
    if (rest.startsWith("//")) {
      var j = 2
      while (j < rest.length && rest.charAt(j) != '/' && rest.charAt(j) != '?') j += 1
      authority = rest.substring(2, j)
      rest = rest.substring(j)
    }
    // query
    var query: String = null
    val qm = rest.indexOf('?')
    var path = rest
    if (qm >= 0) { query = rest.substring(qm + 1); path = rest.substring(0, qm) }
    Parts(scheme, authority, path, query)
  }

  private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** Normalize an authority: lowercase host, strip default port for the
    * scheme, keep userinfo verbatim. Returns null if the host is empty. */
  private def normAuthority(auth: String, scheme: String): String = {
    var userinfo = ""
    var hostport = auth
    val at = auth.lastIndexOf('@')
    if (at >= 0) { userinfo = auth.substring(0, at + 1); hostport = auth.substring(at + 1) }
    var host = hostport
    var port = ""
    if (hostport.startsWith("[")) { // IPv6 literal
      val close = hostport.indexOf(']')
      if (close >= 0) {
        host = hostport.substring(0, close + 1)
        val tail = hostport.substring(close + 1)
        if (tail.startsWith(":")) port = tail.substring(1)
      }
    } else {
      val c = hostport.lastIndexOf(':')
      if (c >= 0) { host = hostport.substring(0, c); port = hostport.substring(c + 1) }
    }
    // reg-name normalization [PINNED]: decode percent-escapes of
    // unreserved chars + uppercase the rest (same §6.2.2 rule as
    // paths), lowercase everything outside escapes, then IDN-encode
    // literal non-ASCII labels to punycode (percent-encoded non-ASCII
    // bytes stay percent-encoded — they never reach IDN). Bracketed
    // IPv6 literals skip all of this (handled above: lowercase only).
    if (!host.startsWith("[")) {
      if (host.indexOf('%') >= 0) host = normalizePercent(host)
      host = canonHostCase(host)
      if (host.exists(_ > '\u007f')) {
        // re-run the percent+case normalization on the IDN output: IDN's
        // nameprep case-folds everything (including preserved escape hex,
        // %C3 -> %c3), so the raw output would not be a fixed point of
        // canonicalize (round-2 review repro) — normalizePercent restores
        // uppercase hex, canonHostCase lowercases the rest
        host =
          try canonHostCase(normalizePercent(
            java.net.IDN.toASCII(host, java.net.IDN.ALLOW_UNASSIGNED)))
          catch { case _: IllegalArgumentException => return null }
      }
    } else host = host.toLowerCase
    if (host.isEmpty) return null
    val defaultPort = if (scheme == "http") "80" else if (scheme == "https") "443" else ""
    val portPart =
      if (port.isEmpty || port == defaultPort) "" else ":" + port
    userinfo + host + portPart
  }

  /** Lowercase a reg-name host outside percent-escapes, preserving the
    * (already-uppercased) escape hex — lowercasing blindly would flip
    * `%C3` to `%c3` and break idempotency. */
  private def canonHostCase(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        sb.append('%').append(s.charAt(i + 1)).append(s.charAt(i + 2))
        i += 3
      } else { sb.append(Character.toLowerCase(c)); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** §5.3 recomposition minus fragment, with normalization applied. */
  private def recompose(scheme: String, authority: String, path: String, query: String): String = {
    val sb = new StringBuilder(64)
    sb.append(scheme).append("://").append(authority)
    val p = if (path.isEmpty) "/" else path
    sb.append(p)
    if (query != null && query.nonEmpty) sb.append('?').append(query)
    sb.toString
  }

  /** §5.2.3 merge of base path and relative path. */
  private def mergePaths(baseAuthority: String, basePath: String, refPath: String): String = {
    if (baseAuthority != null && basePath.isEmpty) "/" + refPath
    else {
      val slash = basePath.lastIndexOf('/')
      if (slash < 0) refPath else basePath.substring(0, slash + 1) + refPath
    }
  }

  /** Canonicalize an absolute URL (no base). Returns null when the result
    * is not a valid absolute http(s) URL with a host. */
  def canonicalize(url: String): String = canonicalize(url, null)

  /** Canonicalize `url`, resolving it against canonical absolute `base`
    * when `url` is a relative reference (RFC 3986 §5.2.2). Returns null for
    * invalid / non-http(s) results. */
  def canonicalize(url: String, base: String): String = {
    if (url == null) return null
    val r = parse(url)
    if (r == null) return null
    var scheme = r.scheme
    var authority = r.authority
    var path = r.path
    var query = r.query

    if (scheme == null) {
      // relative reference — need a base
      if (base == null) return null
      val b = parse(base)
      if (b == null || b.scheme == null || b.authority == null) return null
      scheme = b.scheme
      if (r.authority != null) {
        authority = r.authority
        path = removeDotSegments(r.path)
      } else {
        authority = b.authority
        if (r.path.isEmpty) {
          path = b.path
          if (r.query == null) query = b.query
        } else if (r.path.startsWith("/")) {
          path = removeDotSegments(r.path)
        } else {
          path = removeDotSegments(mergePaths(b.authority, b.path, r.path))
        }
      }
    } else {
      if (authority == null) return null // http:foo — not a crawlable URL
      path = removeDotSegments(path)
    }

    if (scheme != "http" && scheme != "https") return null
    val normAuth = normAuthority(authority, scheme)
    if (normAuth == null) return null
    // decode-then-remove (RFC 3986 §6.2.2): percent-decoding unreserved
    // octets can SURFACE dot segments ("%2e%2e" → ".."), so dot-segment
    // removal must run again on the decoded path or the output is not a
    // fixed point of canonicalization ("/%2e%2e/p" → "/../p" which would
    // re-canonicalize to "/p" and hash differently — round-3 review).
    // For %2e-free paths the second pass is a no-op.
    val normPath = removeDotSegments(normalizePercent(path))
    val normQuery = if (query == null) null else normalizePercent(query)
    recompose(scheme, normAuth, normPath, normQuery)
  }

  /** Host component of a canonical URL (empty string when absent).
    * Only called on canonicalize() output, so the shape is known. */
  def hostOf(canonical: String): String = {
    if (canonical == null) return ""
    val i = canonical.indexOf("://")
    if (i < 0) return ""
    var j = i + 3
    val at = {
      var k = j; var found = -1
      while (k < canonical.length && canonical.charAt(k) != '/' && canonical.charAt(k) != '?') {
        if (canonical.charAt(k) == '@') found = k
        k += 1
      }
      found
    }
    if (at >= 0) j = at + 1
    // IPv6 bracket literal: host runs to the matching ']' (inclusive),
    // matching normAuthority — a ':' inside the brackets is part of the
    // address, not a port separator
    if (j < canonical.length && canonical.charAt(j) == '[') {
      val close = canonical.indexOf(']', j)
      if (close >= 0) return canonical.substring(j, close + 1)
    }
    var end = j
    while (end < canonical.length && canonical.charAt(end) != '/' &&
      canonical.charAt(end) != ':' && canonical.charAt(end) != '?') end += 1
    canonical.substring(j, end)
  }

  /** Path component of a canonical URL ("/" minimum). */
  def pathOf(canonical: String): String = {
    if (canonical == null) return ""
    val i = canonical.indexOf("://")
    if (i < 0) return ""
    var j = canonical.indexOf('/', i + 3)
    if (j < 0) return "/"
    val q = canonical.indexOf('?', j)
    if (q < 0) canonical.substring(j) else canonical.substring(j, q)
  }
}
