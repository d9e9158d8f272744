package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: sub-step timing of Dedup.minhashPairs over the x17 reps
  * frame (banding, candidate join, verify) to locate the wall cost. */
object MinhashProbe {
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
        println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val n = math.min(graft.spark.Corpus.docsForSf(sfDir), 3000L)
      val extracted = graft.spark.ExtractPipeline
        .extract(spark, graft.spark.Corpus.pages(spark, n)).toDF()
        .filter(col("failure") === "ok")
        .select(col("url").as("id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[mh] reps=${extracted.count()}")
      // warm lap
      graft.functions.Dedup.minhashPairs(extracted, "id", "text", threshold = 0.8).count()

      val shingleK = 5; val bands = 16; val rowsPerBand = 4
      val bandUdf = udf((t: String) =>
        if (t == null || t.length < shingleK) Array.empty[Long]
        else graft.functions.Dedup.bandHashes(
          graft.functions.Dedup.minhashKernel(t, shingleK, bands * rowsPerBand),
          bands, rowsPerBand))
      val banded = extracted.select(col("id"),
        posexplode(bandUdf(col("text"))).as(Seq("band", "bandHash")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("banding (count)") { println("[mh] band rows=" + banded.count()) }
      val cand = banded.as("l")
        .join(banded.as("r"), col("l.band") === col("r.band") &&
          col("l.bandHash") === col("r.bandHash") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("candidate join (count)") { println("[mh] cand=" + cand.count()) }
      banded.unpersist(false)
      time("full minhashPairs lap 2") {
        println("[mh] pairs=" + graft.functions.Dedup
          .minhashPairs(extracted, "id", "text", threshold = 0.8).count())
      }
      time("full minhashPairs lap 3") {
        graft.functions.Dedup
          .minhashPairs(extracted, "id", "text", threshold = 0.8).count()
      }
    } finally spark.stop()
  }
}
