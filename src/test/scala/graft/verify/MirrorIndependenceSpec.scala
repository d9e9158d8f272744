package graft.verify

import graft.functions.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** The x6/x7/x9/x20 answer keys come from INDEPENDENT re-implementations
  * (AnswerKeys.simhashMirror/langIdMirror/fingerprintMirror/
  * bpeTokenCountMirror \u2014 VERDICT r2 #4); this spec pins bit-equivalence of
  * mirror vs kernel on adversarial inputs, so the driver's oracle compare
  * verifies kernel MATH, not just Spark plumbing, while staying green.
  */
class MirrorIndependenceSpec extends AnyFunSuite {

  // unicode whitespace (isWhitespace vs regex-\s divergence candidates),
  // NBSP (not whitespace), surrogate pairs, combining marks, Nl/No numbers,
  // contractions incl. order-sensitive ('s before 're), long texts past the
  // 2000-char langid window, window boundaries for the 8-char fingerprint
  private val adversarial: Seq[String] = Seq(
    "", " ", "a", "1234567", "12345678", "123456789",
    "hello world", "  leading and trailing  ",
    "tab\tand\nnewline\randvtabff",
    "line\u2028sep\u2029para\u0085nel", // isWhitespace-but-not-regex-\s
    "nbsp\u00A0glued", // NBSP: NOT whitespace, NOT \s
    "emoji \uD83D\uDE00 and astral \uD835\uDC9C letters",
    "lone surrogate \uD83D cut and \uDE00 tail",
    "combining e\u0301 acute and a\u05B7 mark",
    "it's we're they'll I'd you've I'm can't",
    "'s 're 'll alone '' ' x'y",
    "digits 123 mixed12 \u216B roman \u00B2 super", // Nl and No numbers
    "punct!!! runs??? ---- (a) [b] {c}",
    "  double  spaces   \u4E09\u4E2A\u6C49\u5B57 \u4E2D\u6587 \u6DF7\u5408 text",
    "\u05E9\u05DC\u05D5\u05DD \u05E2\u05D5\u05DC\u05DD hebrew text here",
    "\u0627\u0644\u0633\u0644\u0627\u0645 \u0639\u0644\u064A\u0643\u0645 arabic",
    "\u043F\u0440\u0438\u0432\u0435\u0442 \u043C\u0438\u0440 cyrillic",
    "der die das und ist nicht mit ein",
    "le la les de et est un une",
    ("the and of to in is that it was for " * 250), // > 2000 chars
    ("x" * 1999) + " the the the the", // langid window boundary
    "a'b'c''d", "' ", " '", "don't stop believing")

  private val fuzz: Seq[String] = {
    val rng = new scala.util.Random(20260816L)
    val alphabet = "ab c.12'\t\n\u00A0\u2028\u05D0\u4E00\u0301e" +
      "\uD83D\uDE00" // random draws break pair adjacency -> lone surrogates
    (1 to 300).map { _ =>
      val len = rng.nextInt(64)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(alphabet.charAt(rng.nextInt(alphabet.length))))
      sb.toString // may contain lone surrogates \u2014 both sides must agree anyway
    }
  }

  private def all = adversarial ++ fuzz

  test("ngramHashesMirror == Decontaminate.wordNgramHashes on adversarial + fuzz inputs") {
    import graft.functions.Decontaminate
    Seq(1, 2, 4).foreach { n =>
      all.foreach { s =>
        assert(AnswerKeys.ngramHashesMirror(s, n) ==
          Decontaminate.wordNgramHashes(s, n).toSet,
          s"n=$n input=${s.take(40)}")
      }
      assert(AnswerKeys.ngramHashesMirror(null, n) ==
        Decontaminate.wordNgramHashes(null, n).toSet)
    }
  }

  test("simhashMirror == Dedup.simhashKernel on adversarial + fuzz inputs") {
    all.foreach(s => assert(AnswerKeys.simhashMirror(s) == Dedup.simhashKernel(s),
      s"simhash diverged on: ${s.take(60)}"))
  }

  test("fingerprintMirror == TextAnalysis.fingerprintKernel") {
    all.foreach(s => assert(AnswerKeys.fingerprintMirror(s) == TextAnalysis.fingerprintKernel(s),
      s"fingerprint diverged on: ${s.take(60)}"))
  }

  test("langIdMirror == TextAnalysis.langIdKernel") {
    all.foreach(s => assert(AnswerKeys.langIdMirror(s) == TextAnalysis.langIdKernel(s),
      s"langid diverged on: ${s.take(60)}"))
  }

  test("bpeTokenCountMirror == TextAnalysis.bpeTokenCountKernel (and the regex spec)") {
    all.foreach { s =>
      assert(AnswerKeys.bpeTokenCountMirror(s) == TextAnalysis.bpeTokenCountKernel(s),
        s"bpe diverged on: ${s.take(60)}")
    }
  }

  test("shingle/minhash/band/jaccard mirrors == Dedup kernels") {
    all.foreach { s =>
      assert(AnswerKeys.shingleSetMirror(s, 5).sameElements(Dedup.shingleSet(s, 5)),
        s"shingles diverged on: ${s.take(60)}")
      assert(AnswerKeys.minhashMirror(s, 5, 64).sameElements(Dedup.minhashKernel(s, 5, 64)),
        s"minhash diverged on: ${s.take(60)}")
    }
    // band hashes over mirrored signatures
    adversarial.foreach { s =>
      val sig = Dedup.minhashKernel(s, 5, 64)
      assert(AnswerKeys.bandHashesMirror(sig, 16, 4).sameElements(Dedup.bandHashes(sig, 16, 4)))
    }
    // jaccard over text pairs
    val texts = adversarial.filter(_.length >= 5)
    texts.zip(texts.tail :+ texts.head).foreach { case (a, b) =>
      assert(AnswerKeys.jaccardMirror(a, b, 5) == Dedup.jaccardKernel(a, b, 5),
        s"jaccard diverged on: ${a.take(30)} / ${b.take(30)}")
      assert(AnswerKeys.jaccardMirror(a, a, 5) == 1.0)
    }
    assert(AnswerKeys.jaccardMirror("", "", 5) == Dedup.jaccardKernel("", "", 5))
    assert(AnswerKeys.jaccardMirror("abcdefgh", "", 5) == Dedup.jaccardKernel("abcdefgh", "", 5))
  }

  test("lshBucketMirror == Similarity.lshBucketKernel (IEEE-order-sensitive)") {
    val rng = new scala.util.Random(77L)
    (1 to 200).foreach { _ =>
      val dim = 1 + rng.nextInt(64)
      val v = Array.fill(dim)((rng.nextFloat() - 0.5f) * 4f)
      (0 until 4).foreach { t =>
        assert(AnswerKeys.lshBucketMirror(v, 8, 0x5EED0000L + t) ==
          graft.functions.Similarity.lshBucketKernel(v.toSeq, 8, 0x5EED0000L + t))
        assert(AnswerKeys.lshBucketMirror(v, 12, 0x5EED0000L + t) ==
          graft.functions.Similarity.lshBucketKernel(v.toSeq, 12, 0x5EED0000L + t))
      }
    }
    // zero vector: all dots are exactly 0.0 => every sign bit set
    assert(AnswerKeys.lshBucketMirror(Array.fill(8)(0f), 8, 0x5EED0000L) ==
      graft.functions.Similarity.lshBucketKernel(Seq.fill(8)(0f), 8, 0x5EED0000L))
  }

  test("xxh64LongMirror == Spark xxhash64(longCol) bit-for-bit") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("mirror-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64}
    val rng = new scala.util.Random(123L)
    val ids = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L) ++
      (1 to 200).map(_ => rng.nextLong())
    val got = ids.toDF("id").select(col("id"), xxhash64(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(id => assert(AnswerKeys.xxh64LongMirror(id) == got(id),
      s"xxh64 diverged on $id"))
  }

  test("trainIvfCentroidsMirror == Similarity.trainIvfCentroids bit-for-bit") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("mirror-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val rng = new scala.util.Random(456L)
    val vecs = (0L until 120L).map(i =>
      (i, Array.fill(12)((rng.nextFloat() - 0.5f) * 3f)))
    val df = vecs.toDF("vec_id", "embedding")
    // trainSample below n (real subsetting) and above (whole set)
    Seq(50, 10000).foreach { ts =>
      val engine = graft.functions.Similarity.trainIvfCentroids(
        df, nLists = 8, trainSample = ts)
      val mirror = AnswerKeys.trainIvfCentroidsMirror(vecs, nLists = 8, trainSample = ts)
      assert(engine.length == mirror.length)
      engine.zip(mirror).zipWithIndex.foreach { case ((e, m), c) =>
        assert(e.length == m.length, s"centroid $c dim")
        e.zip(m).foreach { case (x, y) =>
          assert(java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y), s"centroid $c diverged (ts=$ts)")
        }
      }
    }
    // assignment/probe mirror agrees with the engine's on the same model
    val cs = AnswerKeys.trainIvfCentroidsMirror(vecs, nLists = 8)
    vecs.foreach { case (_, v) =>
      assert(AnswerKeys.nearestCentroidsMirror(v, cs, 3) ==
        graft.functions.Similarity.nearestCentroids(v.toSeq, cs, 3))
    }
  }

  test("null handling matches") {
    assert(AnswerKeys.simhashMirror(null) == Dedup.simhashKernel(null))
    assert(AnswerKeys.fingerprintMirror(null) == TextAnalysis.fingerprintKernel(null))
    assert(AnswerKeys.langIdMirror(null) == TextAnalysis.langIdKernel(null))
    assert(AnswerKeys.bpeTokenCountMirror(null) == TextAnalysis.bpeTokenCountKernel(null))
  }
}
