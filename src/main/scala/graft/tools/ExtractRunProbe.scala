package graft.tools

import graft.spark.{Corpus, ExtractJob, ExtractPipeline}
import org.apache.spark.sql.SparkSession

/** Dev tool: wall time of each protocol step inside ExtractJob.run,
  * replicated step-by-step (run() itself is not modified), for a fresh
  * run 0 and a resuming run 1 — to see where the commit protocol's
  * seconds actually go. */
object ExtractRunProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[runprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    try {
      // warm the kernel + parquet paths
      ExtractPipeline.extract(spark, Corpus.pages(spark, 500)).count()
      (1 to 2).foreach { lap =>
        val dir = graft.FsUtil.scratchDir("graft_runprobe_")
        try {
          time(s"lap $lap run0 (whole)") {
            ExtractJob.run(spark, Corpus.pages(spark, n / 2), dir)
          }
          // run 1 decomposed
          val store = new graft.spark.ParquetCheckpointStore(spark, dir)
          val runId = time(s"lap $lap nextRunId")(store.nextRunId())
          val pages = Corpus.pages(spark, n)
          val pending = time(s"lap $lap committedUrls+anti (build)") {
            store.committedUrls() match {
              case Some(done) => pages.join(done, Seq("url"), "left_anti")
              case None => pages
            }
          }
          val cfg = ExtractPipeline.PipelineConfig()
          val hotRows = time(s"lap $lap hotHostEstimates") {
            ExtractPipeline.hotHostEstimates(spark, pending, cfg)
          }
          val cfgResolved = cfg.copy(staticHotHosts = Some(hotRows.map(_._1).toSet))
          val obs = org.apache.spark.sql.Observation(s"runprobe_${lap}")
          val extracted = ExtractPipeline.extract(spark, pending, cfgResolved)
            .withColumn("partition_id", spark_partition_id())
            .observe(obs, count(lit(1)).as("docs"))
          val path = s"$dir/extracted/run_id=$runId"
          time(s"lap $lap extract+write") {
            extracted.write.mode("overwrite").parquet(path)
          }
          time(s"lap $lap lineage") {
            ExtractJob.lineageAgg(spark.read.parquet(path))
              .write.mode("overwrite").parquet(s"$dir/lineage/run_id=$runId")
          }
          time(s"lap $lap hot_hosts write") {
            graft.spark.MetaParquet.writeHotHosts(s"$dir/hot_hosts/run_id=$runId",
              spark.sparkContext.hadoopConfiguration,
              hotRows.map { case (h, f) => ExtractJob.HotHostRow(runId, h, f, true) })
          }
          time(s"lap $lap commit") {
            store.commit(runId, obs.get("docs").asInstanceOf[Long], "probe")
          }
        } finally graft.FsUtil.deleteRecursively(new java.io.File(dir))
      }
    } finally spark.stop()
  }
}
