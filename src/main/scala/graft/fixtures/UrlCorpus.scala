package graft.fixtures

import scala.util.Random

/** Deterministic corpus for the URL-canonicalization surface (x31): each
  * index yields a CANONICAL url (composed first — that IS the expected
  * answer) and a MESSY spelling derived from it by spec-reversible
  * transforms: random upper-casing of scheme/host, a default port, an
  * appended fragment, injected tracking params, and a shuffled query
  * order. Generation-time truth — the expected string is never computed
  * by running the canonicalizer.
  */
object UrlCorpus {

  private val hosts = Array("example.com", "news.site.org", "data.example.net",
    "blog.corp.io", "archive.example.com")
  private val segs = Array("articles", "2024", "posts", "view", "item", "docs")
  private val keys = Array("id", "page", "ref", "sort", "q", "lang")
  private val vals = Array("1", "42", "abc", "new", "old", "x7")

  private def upperSome(s: String, rng: Random): String = {
    val sb = new java.lang.StringBuilder(s)
    (0 until sb.length).foreach { i =>
      if (rng.nextInt(3) == 0) sb.setCharAt(i, Character.toUpperCase(sb.charAt(i)))
    }
    sb.toString
  }

  /** One url by index: (messy url, expected canonical url). */
  def lineAt(seed: Long, i: Long): (String, String) = {
    val rng = FixtureGen.rngFor(seed, i)
    val scheme = if (rng.nextInt(3) == 0) "http" else "https"
    val host = hosts(rng.nextInt(hosts.length))
    val nSeg = rng.nextInt(3)
    val path =
      if (nSeg == 0) "/"
      else (0 until nSeg).map(_ => segs(rng.nextInt(segs.length))).mkString("/", "/", "")
    // distinct keys so the stable sort's equal-key order never matters
    val nParams = rng.nextInt(4)
    val chosen = rng.shuffle(keys.toSeq).take(nParams)
      .map(k => s"$k=${vals(rng.nextInt(vals.length))}")
    val sortedParams = chosen.sortBy(p => p.substring(0, p.indexOf('=')))
    val canonical = scheme + "://" + host + path +
      (if (sortedParams.isEmpty) "" else sortedParams.mkString("?", "&", ""))

    // derive the messy spelling
    val messyScheme = upperSome(scheme, rng)
    var messyAuth = upperSome(host, rng)
    if (rng.nextInt(3) == 0)
      messyAuth += (if (scheme == "http") ":80" else ":443")
    val tracking = Seq(s"utm_source=feed${rng.nextInt(9)}",
      s"utm_campaign=c${rng.nextInt(9)}", "gclid=g123", "fbclid=f456")
    val nTrack = rng.nextInt(3)
    val messyParams = rng.shuffle(chosen ++ rng.shuffle(tracking).take(nTrack))
    val frag = if (rng.nextInt(3) == 0) s"#sec${rng.nextInt(9)}" else ""
    val messyPath = if (path == "/" && rng.nextInt(2) == 0) "" else path
    val messy = messyScheme + "://" + messyAuth + messyPath +
      (if (messyParams.isEmpty) "" else messyParams.mkString("?", "&", "")) + frag
    (messy, canonical)
  }
}
