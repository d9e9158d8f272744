package graft.spark

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the production batch job:
  *
  * {{{
  * spark-submit --class graft.spark.ExtractMain \
  *   --conf spark.sql.extensions=graft.spark.GraftExtensions \
  *   graft.jar <inputPathOrTable> <outDir> [maxPartitions] [saltBuckets]
  * }}}
  *
  * Reads the web_pages table (parquet path here; Iceberg table name on a
  * cluster with the runtime jar), runs the committed/resumable extraction
  * job, prints the run summary. Rerunning after a failure resumes from the
  * last committed run (see [[ExtractJob]]).
  */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExtractMain <input> <outDir> [numPartitions] [saltBuckets]")
    val input = args(0)
    val outDir = args(1)
    val numPartitions = if (args.length > 2) args(2).toInt else 0
    val saltBuckets = if (args.length > 3) args(3).toInt else 16

    // on a cluster spark-submit provides master/memory; local fallback for dev
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val pages = spark.read.parquet(input)
      val cfg = ExtractPipeline.PipelineConfig(
        numPartitions = numPartitions, saltBuckets = saltBuckets)
      val result = ExtractJob.run(spark, pages, outDir, cfg)
      val lineage = ExtractJob.readLineage(spark, outDir)
      println(s"run_id=${result.runId} new_docs=${result.newDocs}")
      lineage.groupBy().sum("doc_count", "n_ok", "n_empty", "n_unsupported",
        "n_parse_error", "n_oversize").show(false)
    } finally spark.stop()
  }
}
