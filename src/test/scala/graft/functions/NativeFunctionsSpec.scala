package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class NativeFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("native-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs() = {
    val s = spark; import s.implicits._
    Seq(
      1 -> "the quick brown fox jumps over the lazy dog",
      2 -> "der Hund ist nicht mit der Katze und das ist gut",
      3 -> "",
      4 -> "שלום עולם ספר דבר").toDF("doc_id", "text")
  }

  test("native StaticInvoke kernels agree with the UDF variants exactly") {
    val df = docs()
    val both = df.select(
      col("doc_id"),
      NativeFunctions.simhash64(col("text")).as("n_sim"),
      Dedup.simhash(col("text")).as("u_sim"),
      NativeFunctions.fingerprint64(col("text")).as("n_fp"),
      TextAnalysis.fingerprint(col("text")).as("u_fp"),
      NativeFunctions.langId(col("text")).as("n_lang"),
      TextAnalysis.langId(col("text")).as("u_lang")).collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"simhash diff doc ${r.getInt(0)}")
      assert(r.getLong(3) == r.getLong(4), s"fingerprint diff doc ${r.getInt(0)}")
      assert(r.getString(5) == r.getString(6), s"langId diff doc ${r.getInt(0)}")
    }
  }

  test("null propagation: native kernels return null for null input") {
    val df = docs().withColumn("text", when(col("doc_id") === 1, col("text")))
    val rows = df.select(col("doc_id"), NativeFunctions.simhash64(col("text")).as("s"))
      .orderBy("doc_id").collect()
    assert(!rows(0).isNullAt(1))
    assert(rows(1).isNullAt(1)) // propagateNull
  }

  test("plan: static_invoke inside WholeStageCodegen, no BatchEvalPython/UDF node") {
    val plan = docs().select(NativeFunctions.simhash64(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("static_invoke") || plan.contains("staticinvoke"), plan)
    val explained = docs().select(NativeFunctions.simhash64(col("text")))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!explained.toLowerCase.contains("batchevalpython"))
    // the round-4 url canonicalizer plans the same way
    val urlPlan = docs().select(NativeFunctions.canonicalizeUrl(col("text")))
      .queryExecution.executedPlan.toString
    assert(urlPlan.contains("static_invoke") || urlPlan.contains("staticinvoke"), urlPlan)
  }

  test("hasTokens: byte-scan fast path == isWhitespace semantics (incl. unicode ws)") {
    import org.apache.spark.unsafe.types.UTF8String
    def k(s: String) = NativeKernels.hasTokens(UTF8String.fromString(s))
    val cases = Seq(
      "" -> false, "   " -> false, "\t\n\r" -> false,
      "a" -> true, "  a" -> true, "  a  " -> true,
      "  " -> false,      // unicode line/para separators ARE whitespace
      "   　 " -> false,   // ideographic space too
      " " -> true,             // NBSP is NOT whitespace
      "   x" -> true,          // ws prefix then a real char after decode
      "שלום" -> true, "" -> false) // file/group separators are ws
    cases.foreach { case (s, want) =>
      assert(k(s) == want, s"hasTokens('${s.take(20)}') != $want")
      // spec: hasTokens ≡ exists-non-isWhitespace (the simhash tokenizer)
      assert(k(s) == s.exists(c => !Character.isWhitespace(c)))
    }
    assert(!NativeKernels.hasTokens(null))
  }

  test("hamming64 native") {
    val s = spark; import s.implicits._
    val df = Seq((0xFFL, 0x0FL)).toDF("a", "b")
    val h = df.select(NativeFunctions.hamming64(col("a"), col("b"))).head().getInt(0)
    assert(h == 4)
  }
}
