package graft.spark

import graft.fixtures.FixtureGen
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed synthetic corpus — `spark.range(n)` + per-index deterministic
  * generation, so the corpus is born partitioned and never sits on the
  * driver (works unchanged at 10^9 rows on a real cluster).
  */
object Corpus {

  final case class Page(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte], text: String, lang: String)
  final case class PageWithExpected(
      url: String, warc_ts: java.sql.Timestamp, html: Array[Byte], text: String, lang: String,
      expected_text: String, expected_failure: String)

  /** The web_pages input table (BASELINE.json input_hint shape). */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 0): DataFrame =
    pagesRange(spark, 0L, n, seed, partitions)

  /** An index slice of the same deterministic corpus — for staging
    * incremental arrivals (a second batch of pages "landing" after a
    * first drain) without regenerating or filtering the full range. */
  def pagesRange(
      spark: SparkSession, from: Long, until: Long,
      seed: Long = 42L, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    spark.range(from, until, 1L, parts).map { i =>
      val f = FixtureGen.fixtureAt(seed, i)
      Page(f.url, f.warc_ts, f.html, f.text, f.lang)
    }.toDF()
  }

  /** Pages + the generation-time answer key (for oracle joins in tests). */
  def pagesWithExpected(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 0): DataFrame =
    pagesWithExpectedRange(spark, 0L, n, seed, partitions)

  def pagesWithExpectedRange(
      spark: SparkSession, from: Long, until: Long,
      seed: Long = 42L, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    spark.range(from, until, 1L, parts).map { i =>
      val f = FixtureGen.fixtureAt(seed, i)
      PageWithExpected(f.url, f.warc_ts, f.html, f.text, f.lang, f.expected.text, f.expected.failure)
    }.toDF()
  }

  /** Docs for a testdata sf dir name, e.g. ".../sf0.01" → 1000 docs/sf-unit. */
  def docsForSf(sfDir: String): Long = {
    // proper numeric pattern: "sf0.01.bak" must parse 0.01, not throw on
    // a trailing-dot capture (round-3 review finding)
    val m = "sf([0-9]+(?:\\.[0-9]+)?)".r.findFirstMatchIn(sfDir)
    val sf = m.flatMap(x => scala.util.Try(x.group(1).toDouble).toOption)
      .getOrElse(0.01)
    math.max(200L, (sf * 100000).toLong)
  }
}
