package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck sweep of the sampler kernels' pure invariants against
  * brute-force oracles — the corners the targeted SamplingSpec cases
  * don't enumerate (random strata skew, duplicate order values, zero
  * and oversize token counts, tiny and large k). Uses a shared local
  * session; each property compares the distributed operator against a
  * plain single-node recompute. */
object SamplingProperties extends Properties("graft.sampling") {

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("sampling-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val corpusGen: Gen[Seq[(Long, String, Double)]] = for {
    n <- Gen.choose(0, 120)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 400L)
      stratum <- Gen.oneOf("en", "de", "zh", "xx")
      ord <- Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.const(0.0), Gen.const(-0.0))
    } yield (id, stratum, ord))
  } yield rows.distinctBy(_._1) // unique ids (the operators' contract)

  property("capPerStratum == per-stratum sort-take at any k and layout") =
    Prop.forAll(corpusGen, Gen.choose(1, 8), Gen.choose(1, 8)) { (rows, k, parts) =>
      val s = spark; import s.implicits._
      val df = rows.toDF("id", "stratum", "ord").repartition(parts)
      val got = Sampling.capPerStratum(df, "id", "stratum", "ord", k)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.map { case (id, st, ord) =>
          (id, st, if (ord == 0.0) 0.0 else ord) // the -0.0 normalization
        }.sortBy { case (id, _, ord) => (-ord, id) }.take(k)
      }.map(r => (r._1, r._2)).toSet
      got == want
    }

  property("packSequences: capacity respected, every doc packed once, layout-free") =
    Prop.forAll(
      Gen.listOf(for {
        id <- Gen.choose(0L, 300L)
        tokens <- Gen.oneOf(Gen.choose(0L, 600L), Gen.const(0L))
      } yield (id, tokens)).map(_.distinctBy(_._1)),
      Gen.choose(1, 6)) { (docs, parts) =>
      val s = spark; import s.implicits._
      val df = docs.toDF("id", "tokens").repartition(parts)
      val packed = Sampling.packSequences(df, "id", "tokens", capacity = 512L, numGroups = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      val packedIds = packed.map(_._1).toSeq.sorted
      val binLoads = packed.groupBy(p => (p._2, p._3)).map { case (_, ps) =>
        (ps.map(_._4).sum, ps.map(_._4).max) }
      packedIds == docs.map(_._1).sorted && // every doc exactly once
        binLoads.forall { case (sum, mx) => sum <= 512L || mx > 512L } // only oversize docs overflow a bin
    }

  property("hashSample: membership is a pure id predicate (layout/rate-monotone)") =
    Prop.forAll(
      Gen.listOf(Gen.choose(0L, 500L)).map(_.distinct),
      Gen.choose(0.0, 1.0), Gen.choose(1, 6)) { (ids, rate, parts) =>
      val s = spark; import s.implicits._
      val df = ids.toDF("id").repartition(parts)
      val kept = Sampling.hashSample(df, "id", rate).collect().map(_.getLong(0)).toSet
      val keptAgain = Sampling.hashSample(ids.reverse.toDF("id"), "id", rate)
        .collect().map(_.getLong(0)).toSet
      val superset = Sampling.hashSample(df, "id", math.min(1.0, rate + 0.3))
        .collect().map(_.getLong(0)).toSet
      kept == keptAgain && kept.subsetOf(superset)
    }
}
