package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-clock probe of the x33 composed pipeline (and x34) — times the
  * whole query at bench parallelism so stage tuning is measurable
  * outside a full bench lap. */
object X33Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[x33probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      // warm: catalog, codegen, parquet readers
      time("warmup q1")(graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count())
      def staged(label: String): Unit = {
        val t0 = System.nanoTime()
        val n = graft.spark.ProductionPipeline.run(spark,
          math.min(graft.spark.Corpus.docsForSf(sfDir), 2000L),
          (st, sec) => println(f"[x33probe]   $label $st: $sec%.2f s")).count()
        println(f"[x33probe] $label total: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      staged("x33 pass 1")
      staged("x33 pass 2")
      time("x34 pass 1")(graft.SparkEntry.queries("x34_hot_hosts")(spark, sfDir).count())
    } finally spark.stop()
  }
}
