package graft.tools

import graft.spark.{Corpus, ExtractPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose scaling — scan-only vs scan+kernel vs full job
  * (with exchange) at 8 and 32 threads over the same parquet corpus. */
object ScaleProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 600000L
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_bench_corpus_$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val s = session(32)
      Corpus.pages(s, n, partitions = 64).write.mode("overwrite").parquet(dir)
      s.stop()
    }
    val cfgShuffle = ExtractPipeline.PipelineConfig(staticHotHosts = Some(Set("hot.example.com")))
    val cfgNoShuffle = ExtractPipeline.PipelineConfig(repartitionByHost = false)

    def timed(label: String, cpus: Int)(body: SparkSession => Unit): Unit = {
      val s = session(cpus)
      try {
        body(s) // warm
        val t0 = System.nanoTime()
        body(s)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"$label cpus=$cpus%2d  ${n / secs}%8.0f docs/s  ($secs%.1f s)")
      } finally s.stop()
    }

    val order = if (args.length > 1 && args(1) == "rev") Seq(32, 8) else Seq(8, 32)
    order.foreach { cpus =>
      timed("scan-only      ", cpus)(s => s.read.parquet(dir).select(sum(length(col("html")))).collect())
      timed("scan+kernel    ", cpus)(s => ExtractPipeline.extract(s, s.read.parquet(dir), cfgNoShuffle)
        .toDF().filter(col("failure") === "ok").count())
      timed("full(exchange) ", cpus)(s => ExtractPipeline.extract(s, s.read.parquet(dir), cfgShuffle)
        .toDF().filter(col("failure") === "ok").count())
    }
  }
}
