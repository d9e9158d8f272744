package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from Catalyst via [[StaticInvoke]] — scalac emits
  * static forwarders for a top-level object, which StaticInvoke's codegen
  * calls directly inside WholeStageCodegen: no UDF closure, no
  * serialization boundary.
  *
  * NULL SEMANTICS (deliberate, round-3 review note): the expressions are
  * built with `propagateNull = true` — SQL-idiomatic `f(NULL) = NULL`,
  * like every Spark built-in. The in-kernel null guards below therefore
  * never fire through the SQL surface (they serve direct JVM callers) and
  * a null-text row yields NULL simhash/langid/…, NOT 0L/"und". Pipelines
  * that want the JVM-kernel defaults coalesce explicitly (as
  * ExtractPipeline does for lang). */
object NativeKernels {
  def simhash64(s: UTF8String): Long =
    if (s == null) 0L else Dedup.simhashKernel(s.toString)

  def fingerprint64(s: UTF8String): Long =
    if (s == null) 0L else TextAnalysis.fingerprintKernel(s.toString)

  def langId(s: UTF8String): UTF8String =
    UTF8String.fromString(TextAnalysis.langIdKernel(if (s == null) null else s.toString))

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** True iff the text contains at least one simhash token — i.e. any
    * non-whitespace char under the SAME tokenizer simhashKernel uses
    * (Character.isWhitespace). Token-less texts all hash to sig 0L, so
    * [[Dedup.simhashPairs]] must give them NO chunks (degenerate-clique
    * guard, VERDICT r3 #1). */
  def hasTokens(s: UTF8String): Boolean = {
    if (s == null) return false
    // scan raw UTF-8 bytes first: any ASCII non-whitespace byte decides
    // without materializing a String (this guard runs over the whole
    // corpus ahead of the signature kernel). Only a text whose leading
    // ASCII chars are all whitespace up to a multi-byte char pays the
    // decode (non-ASCII whitespace like U+2028 exists, so bytes alone
    // can't prove the negative).
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) {
        if (!Character.isWhitespace(b.toChar)) return true
        i += 1
      } else {
        val str = s.toString
        var j = 0
        while (j < str.length) {
          if (!Character.isWhitespace(str.charAt(j))) return true
          j += 1
        }
        return false
      }
    }
    false
  }

  /** Syntactic URL canonicalization ([[UrlCanon]] spec) — the key
    * normalizer ahead of exact-URL dedup and url-keyed joins. */
  def canonicalizeUrl(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(UrlCanon.canonicalKernel(s.toString))

  /** Whole-kernel extraction as a scalar function: html bytes + lang →
    * extracted text ("" on failure). Pure SQL pipelines can then run
    * `SELECT graft_extract(html, lang) FROM web_pages`. */
  def extractText(html: Array[Byte], lang: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.core.Extractor.default
        .extract("", html, if (lang == null) "" else lang.toString).text)

  /** Failure-taxonomy companion of [[extractText]]. */
  def extractFailure(html: Array[Byte], lang: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.core.Extractor.default
        .extract("", html, if (lang == null) "" else lang.toString).failure)
}

/** Column constructors for the native kernels (preferred over the UDF
  * variants in [[Dedup]]/[[TextAnalysis]] on hot paths — same results,
  * codegen-friendly plan). */
object NativeFunctions {

  private def invoke(name: String, dt: DataType, args: Column*): Column =
    GraftColumnBridge.column(StaticInvoke(
      NativeKernels.getClass,
      dt,
      name,
      args.map(c => GraftColumnBridge.expression(c)),
      inputTypes = Nil,
      propagateNull = true,
      returnNullable = false))

  def simhash64(c: Column): Column = invoke("simhash64", LongType, c)
  def fingerprint64(c: Column): Column = invoke("fingerprint64", LongType, c)
  def langId(c: Column): Column = invoke("langId", StringType, c)
  def hamming64(a: Column, b: Column): Column = invoke("hamming64", IntegerType, a, b)
  def hasTokens(c: Column): Column = invoke("hasTokens", BooleanType, c)
  def canonicalizeUrl(c: Column): Column = invoke("canonicalizeUrl", StringType, c)
}
