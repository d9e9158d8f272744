package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck sweep of the cleaning operators against brute-force
  * single-node oracles. These two changed most in round 5 (size-gated
  * offender membership, HLL broadcast gate), so beyond the targeted
  * specs the whole semantic surface is swept: random corpora with
  * random shared-line pools and random n-gram overlap, engine verdicts
  * (hash-based, distributed) vs plain string counting. */
object DedupProperties extends Properties("graft.cleaning") {

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("cleaning-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val pool = (0 until 8).map(i => s"shared line number $i")

  private val docsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(0, 50)
    rows <- Gen.listOfN(n, for {
      lines <- Gen.choose(0, 6)
      parts <- Gen.listOfN(lines, Gen.frequency(
        2 -> Gen.oneOf(pool),
        3 -> Gen.choose(0, 100000).map(x => s"unique content $x"),
        1 -> Gen.const("")))
    } yield parts.mkString("\n"))
  } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("dropBoilerplateLines == string-counting oracle at any minDocs") =
    Prop.forAll(docsGen, Gen.choose(2, 6)) { (docs, minDocs) =>
      docs.isEmpty || {
        val s = spark; import s.implicits._
        val got = Dedup.dropBoilerplateLines(
            docs.toDF("doc_id", "text"), "doc_id", "text", minDocs)
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3)))
          .toMap
        val lineDocs = new scala.collection.mutable.HashMap[String, Set[Long]]()
        docs.foreach { case (id, t) =>
          t.split("\n", -1).distinct.foreach(l =>
            lineDocs.update(l, lineDocs.getOrElse(l, Set.empty) + id)) }
        val offenders = lineDocs.filter(_._2.size >= minDocs).keySet
        docs.forall { case (id, t) =>
          val lines = t.split("\n", -1)
          val kept = lines.filterNot(offenders)
          got(id) == ((kept.mkString("\n"), lines.length, lines.length - kept.length))
        }
      }
    }

  private val wordDocsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, Gen.listOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta")).map(_.mkString(" ")))
  } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("contaminatedIds == brute n-gram intersection oracle") =
    Prop.forAll(wordDocsGen, Gen.choose(1, 4)) { (docs, n) =>
      val s = spark; import s.implicits._
      val (bench, corpus) = docs.partition(_._1 % 5 == 0)
      (bench.isEmpty || corpus.isEmpty) || {
        val got = Decontaminate.contaminatedIds(
            corpus.toDF("doc_id", "text"), "doc_id", "text",
            bench.toDF("doc_id", "text"), "text", n)
          .collect().map(_.getLong(0)).toSet
        def grams(t: String): Set[Seq[String]] = {
          val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
          if (toks.length < n) Set.empty
          else toks.sliding(n).map(_.toSeq).toSet
        }
        val benchGrams = bench.flatMap(b => grams(b._2)).toSet
        val want = corpus.filter(c => grams(c._2).exists(benchGrams)).map(_._1).toSet
        got == want
      }
    }
}
