package graft.tools

import graft.spark.{Corpus, ExtractPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: run the full Spark extraction job over a synthetic corpus,
  * diff against the generation-time answer key, print the physical plan
  * and the failure taxonomy. Exit 1 on any row mismatch. */
object PipelineSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("pipeline-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val pages = Corpus.pages(spark, n)
      val extracted = ExtractPipeline.extract(spark, pages)
      extracted.explain("formatted")

      val expected = Corpus.pagesWithExpected(spark, n)
        .select(col("url"), col("expected_text"), col("expected_failure"))
      val joined = extracted.toDF().join(expected, Seq("url"), "full_outer")
      val bad = joined.filter(
        col("text").isNull || col("expected_text").isNull ||
          col("text") =!= col("expected_text") ||
          col("failure") =!= col("expected_failure"))
      val badCount = bad.count()
      println(s"rows=$n mismatches=$badCount")
      extracted.groupBy("failure").agg(count("*").as("n"), sum("n_chars").as("chars"))
        .orderBy("failure").show(false)
      if (badCount > 0) {
        bad.select("url", "failure", "expected_failure").show(5, false)
        sys.exit(1)
      }
    } finally spark.stop()
  }
}
