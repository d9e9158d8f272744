package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import scala.util.Try

/** ScalaCheck sweep of the URL canonicalization kernel against a
  * java.net.URI-based PARTIAL oracle (VERDICT r4 #7): the kernel is
  * hand-rolled string slicing, and the generation-truth corpus (x31)
  * cannot reach every adversarial corner — userinfo containing ':',
  * IPv6 literals with percent-encoded zone ids, %-encoded case, '?'
  * inside the fragment, repeated '?'. Where URI parses both the raw and
  * the canonical form, the two must agree on every component the spec
  * preserves; the structural properties (idempotence, passthrough,
  * tracking removal, stable key sort) hold unconditionally.
  */
object UrlCanonProperties extends Properties("graft.urlcanon") {

  private val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp", "hTtPs")
  private val userinfo = Gen.oneOf("", "user@", "u:ser@", "U:sEr:x@", "%41dmin@")
  private val host = Gen.oneOf(
    "example.com", "EXAMPLE.com", "sub.Example.ORG", "127.0.0.1",
    "[2001:db8::1]", "[2001:DB8::1]", "[fe80::1%25eth0]", "xn--nxasmq6b.example")
  private val port = Gen.oneOf("", ":80", ":443", ":8080", ":8443")
  private val path = Gen.oneOf(
    "", "/", "/a/b", "/A/B", "/a%2Fb", "/p%41th", "/a//b/", "/%2e%2E/x")
  private val query = Gen.oneOf(
    "", "?", "?b=2&a=1", "?utm_source=x&a=1", "?utm_source=x", "?a=1?b=2",
    "?a", "?a=&a=2&A=3", "?gclid=1&fbclid=2&z=9", "?k=%41&K=a")
  private val fragment = Gen.oneOf("", "#f", "#f?x=1", "#?", "#a#b", "#%20")

  private val url: Gen[String] = for {
    s <- scheme; u <- userinfo; h <- host; p <- port
    pa <- path; q <- query; f <- fragment
  } yield s"$s://$u$h$p$pa$q$f"

  private def queryKeys(canon: String): Seq[String] = {
    val qi = canon.indexOf('?')
    if (qi < 0) Seq.empty
    else canon.substring(qi + 1).split("&", -1).toSeq
      .map(p => { val e = p.indexOf('='); if (e >= 0) p.substring(0, e) else p })
  }

  property("idempotent on every input") = Prop.forAll(url) { u =>
    val c = UrlCanon.canonicalKernel(u)
    UrlCanon.canonicalKernel(c) == c
  }

  property("non-URL strings pass through unchanged") =
    Prop.forAll(Gen.oneOf("", "not a url", "a?b#c", "host.com/path", "mailto:x@y")) {
      s => UrlCanon.canonicalKernel(s) == s
    }

  property("no tracking keys survive; surviving keys are sorted") =
    Prop.forAll(url) { u =>
      val keys = queryKeys(UrlCanon.canonicalKernel(u))
      keys.forall(k => !(k.startsWith("utm_") || k == "gclid" || k == "fbclid")) &&
        keys == keys.sorted
    }

  property("components agree with java.net.URI where it parses both forms") =
    Prop.forAll(url) { u =>
      val c = UrlCanon.canonicalKernel(u)
      (for { raw <- Try(new java.net.URI(u)); can <- Try(new java.net.URI(c)) } yield {
        val hostOk = raw.getHost == null ||
          can.getHost != null && can.getHost.equalsIgnoreCase(raw.getHost)
        val defaultPort = raw.getScheme.toLowerCase match {
          case "http" => 80; case "https" => 443; case _ => -1
        }
        val portOk =
          if (raw.getPort == defaultPort) can.getPort == -1
          else can.getPort == raw.getPort
        val fragOk = can.getRawFragment == null
        val pathOk = {
          val rp = Option(raw.getRawPath).getOrElse("")
          val cp = Option(can.getRawPath).getOrElse("")
          cp == (if (rp.isEmpty) "/" else rp)
        }
        val schemeOk = can.getScheme == raw.getScheme.toLowerCase
        val userOk = raw.getRawUserInfo == null ||
          can.getRawUserInfo != null &&
            can.getRawUserInfo.equalsIgnoreCase(raw.getRawUserInfo)
        hostOk && portOk && fragOk && pathOk && schemeOk && userOk
      }).getOrElse(true) // partial oracle: skip shapes URI cannot parse
    }
}
