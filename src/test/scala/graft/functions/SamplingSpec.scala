package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("sampling-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus(n: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map(i =>
      (i.toLong, Seq("en", "de", "zh")(i % 3), (i * 37 % 100).toLong))
      .toDF("doc_id", "lang", "n_chars")
  }

  test("hashSample: deterministic, layout-independent, threshold-monotone") {
    val df = corpus(600)
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(Sampling.hashSample(df, "doc_id", 0.3))
    val b = ids(Sampling.hashSample(df.repartition(7), "doc_id", 0.3))
    assert(a == b, "kept set must not depend on the physical split layout")
    // roughly the rate, exactly reproducible
    assert(a.size > 120 && a.size < 240, s"size=${a.size}")
    // a smaller rate keeps a SUBSET (the hash threshold moves; membership
    // of unaffected ids does not) — the property that makes rate changes
    // auditable at corpus scale
    val c = ids(Sampling.hashSample(df, "doc_id", 0.1))
    assert(c.subsetOf(a))
  }

  test("stratifiedSample: keep rule is bit-exact vs the oracle mirror") {
    val df = corpus(300)
    val rates = Map("en" -> 0.5, "zh" -> 0.35)
    val got = Sampling.stratifiedSample(df, "doc_id", "lang", rates, defaultRate = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (0 until 300).filter { i =>
      val rate = rates.getOrElse(Seq("en", "de", "zh")(i % 3), 0.8)
      java.lang.Math.floorMod(
        graft.verify.AnswerKeys.xxh64LongMirror(i.toLong), 1000000L) < (rate * 1000000L).toLong
    }.map(_.toLong).toSet
    assert(got == expected)
  }

  test("capPerStratum: exact top-k per stratum with ties, nulls, many partitions") {
    val s = spark; import s.implicits._
    // ties on ord (forces the id tiebreak), a null-ord row, a null stratum
    val rows: Seq[(java.lang.Long, String, java.lang.Long)] =
      (0L until 40L).map(i => (java.lang.Long.valueOf(i),
        if (i % 7 == 0) null else Seq("en", "de")( (i % 2).toInt ),
        if (i == 13) null else java.lang.Long.valueOf(i % 5))) // heavy ties
    val df = rows.toDF("doc_id", "lang", "n_chars").repartition(7)
    val got = Sampling.capPerStratum(df, "doc_id", "lang", "n_chars", k = 4)
      .collect().map(r => (Option(r.get(1)).map(_.toString).orNull, r.getLong(0))).toSet
    // brute-force expectation under the documented rule:
    // (ord desc with null ranked as -Inf, id asc), top 4 per stratum
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (lang, rs) =>
      rs.sortBy { case (id, _, nc) =>
        (if (nc == null) Double.PositiveInfinity
         else -nc.doubleValue, id.longValue)
      }.take(4).map(r => (lang, r._1.longValue))
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("packSequences: capacity respected, layout-independent, oversize isolated") {
    val s = spark; import s.implicits._
    // token sizes exercising: oversize (700 > 512), exact fit, zeros
    val df = (0L until 60L).map(i =>
      (i, if (i == 7) 700L else if (i == 11) 512L else i * 13 % 200))
      .toDF("doc_id", "bpe")
    val packed = Sampling.packSequences(df, "doc_id", "bpe",
      capacity = 512L, numGroups = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(packed.size == 60)
    // identical assignment under a different physical layout
    val packed2 = Sampling.packSequences(df.repartition(7), "doc_id", "bpe",
      capacity = 512L, numGroups = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(packed == packed2, "packing must not depend on the split layout")
    // no bin over capacity, except an oversize doc's own bin (which FFD
    // may legally top up with zero-token docs — exempt those)
    packed.toSeq.groupBy { case (_, (g, b, _)) => (g, b) }.foreach {
      case ((g, b), members) =>
        val tot = members.map(_._2._3).sum
        assert(tot <= 512L || members.count(_._2._3 > 0L) == 1,
          s"bin ($g,$b) holds $tot tokens: $members")
    }
    // the oversize doc shares its bin with (at most) zero-token docs only
    val (g7, b7, _) = packed(7L)
    val mates = packed.filter { case (id, (g, b, _)) => g == g7 && b == b7 && id != 7L }
    assert(mates.values.forall(_._3 == 0L), s"oversize bin mates: $mates")
  }

  test("capPerStratum: the prune stage is shuffle-free (100 TB contract)") {
    // the per-partition bounded-heap prune must run where the data sits;
    // the only exchange is the window's, over <= k*partitions survivors —
    // otherwise a 2-language corpus funnels through 2 reducers
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.MapPartitionsExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val q = Sampling.capPerStratum(corpus(200), "doc_id", "lang", "n_chars", k = 5)
      val plan = q.queryExecution.executedPlan
      val prunes = plan.collect { case m: MapPartitionsExec => m }
      assert(prunes.nonEmpty, s"expected the heap-prune mapPartitions:\n$plan")
      prunes.foreach(m => assert(
        m.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"the prune stage must not shuffle:\n$plan"))
      assert(plan.collect { case e: ShuffleExchangeExec => e }.size == 1,
        s"expected exactly the window's exchange:\n$plan")
      assert(q.count() >= 0)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("cap/pack: non-integral id fails loudly, never casts to null (ADVICE r4)") {
    val s = spark; import s.implicits._
    val byUrl = (0 until 10).map(i => (s"https://ex.com/$i", 100L, "en"))
      .toDF("url", "n_chars", "lang")
    val e1 = intercept[IllegalArgumentException](
      Sampling.packSequences(byUrl, "url", "n_chars", capacity = 512L, numGroups = 4))
    assert(e1.getMessage.contains("packSequences") && e1.getMessage.contains("xxhash64"))
    val e2 = intercept[IllegalArgumentException](
      Sampling.capPerStratum(byUrl, "url", "lang", "n_chars", k = 3))
    assert(e2.getMessage.contains("capPerStratum"))
    // the documented remediation works: re-keyed ids pack fine
    val rekeyed = byUrl.withColumn("id", xxhash64(col("url")))
    assert(Sampling.packSequences(rekeyed, "id", "n_chars", 512L, 4).count() == 10L)
    // scale-0 decimals (warehouse BIGINT surrogates) cast exactly and pass
    val dec = byUrl.withColumn("id",
      xxhash64(col("url")).cast("decimal(20,0)"))
    assert(Sampling.packSequences(dec, "id", "n_chars", 512L, 4).count() == 10L)
    assert(Sampling.capPerStratum(dec, "id", "lang", "n_chars", k = 3).count() == 3L)
  }
}
