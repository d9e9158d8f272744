package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("graft_* functions usable from pure SQL, agree with the Scala API") {
    val s = spark; import s.implicits._
    Seq("the quick brown fox", "der Hund ist nicht da und das ist gut so")
      .toDF("text").createOrReplaceTempView("t")
    val rows = spark.sql(
      """SELECT graft_simhash(text) AS sh, graft_fingerprint(text) AS fp,
        |       graft_langid(text) AS lang,
        |       graft_hamming(graft_simhash(text), graft_simhash(text)) AS h0
        |FROM t""".stripMargin).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getInt(3) == 0)
    }
    assert(rows(1).getString(2) == "de")
    // agrees with the Scala Column API
    val viaApi = spark.table("t")
      .select(graft.functions.NativeFunctions.simhash64(org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(0)).toSeq == viaApi)
  }

  test("pure-SQL extraction pipeline: graft_extract/graft_failure") {
    Corpus.pages(spark, 150).createOrReplaceTempView("web_pages")
    val agg = spark.sql(
      """SELECT graft_failure(html, lang) AS failure, count(*) AS n,
        |       sum(length(graft_extract(html, lang))) AS chars
        |FROM web_pages GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val byFailure = agg.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFailure("ok") > 100)
    assert(byFailure.keySet.subsetOf(Set("ok", "empty", "unsupported_payload", "parse_error", "oversize")))
    // SQL output byte-identical to the answer key
    Corpus.pagesWithExpected(spark, 150).createOrReplaceTempView("expected")
    val bad = spark.sql(
      """SELECT count(*) AS bad FROM web_pages p JOIN expected e ON p.url = e.url
        |WHERE graft_extract(p.html, p.lang) <> e.expected_text""".stripMargin)
      .collect()(0).getLong(0)
    assert(bad == 0)
  }

  test("null propagation through SQL registration") {
    val r = spark.sql("SELECT graft_simhash(CAST(NULL AS STRING)) AS x").collect()(0)
    assert(r.isNullAt(0))
  }

  test("wrong arity raises an analysis-time error, not a task failure") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hamming(1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("argument") ||
      e.getMessage.contains("graft_hamming"))
  }
}
