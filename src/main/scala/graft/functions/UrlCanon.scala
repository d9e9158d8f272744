package graft.functions

import java.util.Locale

/** URL canonicalization — the step before exact-URL dedup in a crawl
  * pipeline: two spellings of the same resource must map to one key or
  * url-keyed dedup/joins silently fragment.
  *
  * The spec is SYNTACTIC (no java.net.URI resolution, whose quirks differ
  * across JDKs), applied only to strings containing "://":
  *   - scheme and authority lowercased;
  *   - default ports stripped (`:80` for http, `:443` for https);
  *   - the fragment dropped;
  *   - an empty path becomes "/";
  *   - tracking params removed (`utm_*`, `gclid`, `fbclid` keys) and the
  *     remaining query params STABLY sorted by key (original order kept
  *     among equal keys); an emptied query drops its '?';
  *   - anything without "://" passes through unchanged (not a URL).
  */
object UrlCanon {

  /** Strip a default-port suffix only where it IS a port: the host left
    * behind must be colon-free (after any userinfo '@') or a bracketed
    * IPv6 literal — a colon-bearing unbracketed remainder means the
    * ":80"/":443" tail was part of something else, and chopping it would
    * corrupt the key (round-4 review; conservative: leave it unchanged). */
  private def stripDefaultPort(auth: String, suffix: String): String =
    if (!auth.endsWith(suffix)) auth
    else {
      val host = auth.substring(0, auth.length - suffix.length)
      val hostPart = host.substring(host.lastIndexOf('@') + 1)
      if (hostPart.endsWith("]") || hostPart.indexOf(':') < 0) host else auth
    }

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || key == "gclid" || key == "fbclid"

  private def keyOf(param: String): String = {
    val eq = param.indexOf('=')
    if (eq >= 0) param.substring(0, eq) else param
  }

  def canonicalKernel(url: String): String = {
    if (url == null) return null
    val si = url.indexOf("://")
    if (si < 0) return url
    val scheme = url.substring(0, si).toLowerCase(Locale.ROOT)
    val rest = url.substring(si + 3)
    var ai = 0
    while (ai < rest.length && rest.charAt(ai) != '/' &&
      rest.charAt(ai) != '?' && rest.charAt(ai) != '#') ai += 1
    var auth = rest.substring(0, ai).toLowerCase(Locale.ROOT)
    if (scheme == "http") auth = stripDefaultPort(auth, ":80")
    else if (scheme == "https") auth = stripDefaultPort(auth, ":443")
    val tail = rest.substring(ai)
    val hi = tail.indexOf('#')
    val noFrag = if (hi >= 0) tail.substring(0, hi) else tail
    val qi = noFrag.indexOf('?')
    var path = if (qi >= 0) noFrag.substring(0, qi) else noFrag
    if (path.isEmpty) path = "/"
    val sb = new java.lang.StringBuilder(scheme).append("://").append(auth).append(path)
    if (qi >= 0) {
      val query = noFrag.substring(qi + 1)
      if (query.nonEmpty) {
        val kept = query.split("&", -1).filterNot(p => isTracking(keyOf(p)))
        if (kept.nonEmpty) {
          // scala sortBy is stable: equal keys keep their original order
          sb.append('?').append(kept.sortBy(keyOf).mkString("&"))
        }
      }
    }
    sb.toString
  }
}
