package graft.tools

import graft.spark.Corpus
import org.apache.spark.sql.SparkSession

/** Dev tool: materialize a synthetic web_pages corpus as parquet
  * (input for ExtractMain / external drivers). Args: <outDir> [n] [seed]. */
object CorpusWrite {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = if (args.length > 1) args(1).toLong else 10000L
    val seed = if (args.length > 2) args(2).toLong else 42L
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[8]"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      Corpus.pages(spark, n, seed).write.mode("overwrite").parquet(out)
      println(s"wrote $n pages to $out")
    } finally spark.stop()
  }
}
