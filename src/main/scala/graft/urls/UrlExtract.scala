package graft.urls

import scala.collection.mutable.ArrayBuffer
import java.util.regex.Pattern

/** Link extraction from text spans — the "parse-extract" half of the
  * reference's fetch-parse-extract loop (BASELINE.json:6).
  *
  * PINNED grammar (FIXTURES.md "URL grammar"): absolute URLs matching
  * `\bhttps?://[^\s"'<>]+` plus relative references taken from
  * `href="..."` attribute values; trailing punctuation `[.,;)]` stripped;
  * matches emitted in document order (by start offset); an absolute URL
  * that lies inside an already-captured href attribute value is not
  * double-counted.
  *
  * This object is the single implementation used by both the Spark
  * expression/UDF path and the sequential test oracle.
  */
object UrlExtract {

  private val Abs = Pattern.compile("(?i)\\bhttps?://[^\\s\"'<>]+")
  private val Href = Pattern.compile("(?i)href=\"([^\"]*)\"")

  private def stripTrailing(u: String): String = {
    var end = u.length
    while (end > 0) {
      val c = u.charAt(end - 1)
      if (c == '.' || c == ',' || c == ';' || c == ')') end -= 1 else return u.substring(0, end)
    }
    u.substring(0, end)
  }

  /** All link strings in `text`, in document order, trailing punctuation
    * stripped, duplicates preserved (dedup happens downstream). */
  def extract(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    // (start, end, url)
    val hits = new ArrayBuffer[(Int, Int, String)]()
    val hm = Href.matcher(text)
    while (hm.find()) hits += ((hm.start(1), hm.end(1), hm.group(1)))
    val ranges = hits.toArray // href value ranges, ascending by construction
    val am = Abs.matcher(text)
    while (am.find()) {
      val s = am.start
      val inside = ranges.exists { case (rs, re, _) => s >= rs && s < re }
      if (!inside) hits += ((s, am.end, am.group))
    }
    hits.sortBy(_._1).iterator
      .map(h => stripTrailing(h._3))
      .filter(_.nonEmpty)
      .toArray
  }
}
