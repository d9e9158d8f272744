package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time x17's component stages at a given sf dir to see where
  * the wall time goes (kernel, window dedup, minhash candidates, joins). */
object X17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[x17probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // warm
      graft.SparkEntry.queries("x17_training_pipeline")(spark, "/root/testdata/sf0.001").count()
      (1 to 3).foreach { i =>
        time(s"x17 full (lap $i)") {
          graft.SparkEntry.queries("x17_training_pipeline")(spark, sfDir).count()
        }
      }
      // components — mirror the CURRENT x17 shape (round-4: is_rep inside
      // the dedup window; near-dup over the rep slice of the same frame)
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val n = math.min(graft.spark.Corpus.docsForSf(sfDir), 3000L)
      val extracted = graft.spark.ExtractPipeline
        .extract(spark, graft.spark.Corpus.pages(spark, n)).toDF()
        .filter(col("failure") === "ok")
        .select(col("url"), col("text"))
        .withColumn("quality", graft.functions.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", graft.functions.NativeFunctions.langId(col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("extract+persist") { extracted.count() }
      val w = Window.partitionBy(md5(col("text")))
        .orderBy(col("is_qualified").desc, col("url"))
      val flags = extracted
        .withColumn("is_qualified", col("quality") >= 0.5)
        .withColumn("is_rep", col("is_qualified") && row_number().over(w) === 1)
      time("funnel flags (window) count") { flags.count() }
      val reps = flags.filter(col("is_rep")).select("url", "text")
      val pairs = graft.functions.Dedup.minhashPairs(reps, "url", "text", threshold = 0.8)
      time("minhashPairs count") { pairs.count() }
      time("x17 full again (cached corpus gen)") {
        graft.SparkEntry.queries("x17_training_pipeline")(spark, sfDir).count()
      }
    } finally spark.stop()
  }
}
