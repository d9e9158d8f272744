package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: capture the probeMinhashIndex physical plan + index file
  * counts at the states the round-6 bucketed-write optimization claims:
  * fresh single-file-per-bucket index (no Sort on the index side), after
  * an absorbed wave (multi-file buckets: Spark drops the sort guarantee,
  * SortExec returns), and after compaction (single files again). Writes
  * the evidence to plans/<tag>/. */
object ProbePlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "r06"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Paths.get("plans", tag)
    Files.createDirectories(dir)
    val tbl = "plandump_idx_" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      val old = (1 to 40 by 2).map(i => (i.toLong, s"document number $i with shared words tail $i")).toDF("doc_id", "text")
      val wave = (2 to 40 by 2).map(i => (i.toLong, s"document number $i with shared words tail $i")).toDF("doc_id", "text")
      val probe = Seq((99L, "document number 1 with shared words tail 1")).toDF("doc_id", "text")
      def capture(name: String): Unit = {
        val q = graft.functions.Dedup.probeMinhashIndex(
          probe, "doc_id", "text", tbl, old, threshold = 0.1)
        val files = spark.table(tbl).inputFiles.length
        Files.writeString(dir.resolve(s"$name.txt"),
          s"index files: $files\n\n" + q.queryExecution.executedPlan.toString)
        println(s"[probeplan] $name: $files files")
      }
      graft.functions.Dedup.writeMinhashIndex(old, "doc_id", "text", tbl, buckets = 4)
      capture("probe_minhash_fresh_index_after")
      graft.functions.Dedup.appendToMinhashIndex(wave, "doc_id", "text", tbl, buckets = 4)
      capture("probe_minhash_after_absorb_after")
      graft.functions.Dedup.compactMinhashIndex(spark, tbl)
      capture("probe_minhash_after_compaction_after")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_retired")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.stop()
    }
  }
}
