package graft.tools

import graft.spark.ExtractPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Child-JVM entry for one scaling measurement: a fresh heap per
  * parallelism level so GC debt from one measurement cannot bias the next
  * (the local-mode stand-in for "separate cluster runs").
  * Prints exactly one line: `RATE <docs/sec>`. */
object ScalingChild {
  def main(args: Array[String]): Unit = {
    val (Array(cpusS, corpusDir, nS, warmupS), mode) =
      if (args.length > 4) (args.take(4), args(4)) else (args, "full")
    val cpus = cpusS.toInt
    val n = nS.toLong
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val cfg0 = ExtractPipeline.PipelineConfig(
        staticHotHosts = Some(Set("hot.example.com")),
        numPartitions = cpus * 4)
      val cfg = mode match {
        case "noshuffle" => cfg0.copy(repartitionByHost = false)
        case _ => cfg0
      }
      val pages = spark.read.parquet(corpusDir)
      def job(): Unit = mode match {
        case "scanonly" =>
          pages.select(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(col("html")))).collect()
        case "exchangeonly" =>
          import org.apache.spark.sql.functions._
          pages.withColumn("host", ExtractPipeline.hostUdf(col("url")))
            .repartition(cpus * 4, col("host"))
            .select(sum(length(col("html")))).collect()
        case _ =>
          ExtractPipeline.extract(spark, pages, cfg)
            .toDF().filter(col("failure") === "ok").count()
      }
      // JIT warm-up (not timed)
      ExtractPipeline.extract(spark, pages.limit(warmupS.toInt), cfg)
        .toDF().filter(col("failure") === "ok").count()
      def gcMillis: Long = {
        var t = 0L
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .forEach(b => t += math.max(0L, b.getCollectionTime))
        t
      }
      // best of 3 timed reps: noise (GC, neighbors) is one-sided slow
      val rates = (1 to 3).map { _ =>
        val g0 = gcMillis
        val t0 = System.nanoTime()
        job()
        val secs = (System.nanoTime() - t0) / 1e9
        val r = n / secs
        System.err.println(f"rep: ${r}%.0f docs/s  wall=$secs%.1f s  gc=${(gcMillis - g0) / 1000.0}%.1f s")
        r
      }
      println(f"RATE ${rates.max}%.1f")
    } finally spark.stop()
  }
}
