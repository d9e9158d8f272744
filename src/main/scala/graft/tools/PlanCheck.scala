package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the plan fragments that matter (PushedFilters, join
  * strategies, exchanges) for selected SparkEntry queries. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      Seq("q5_filter_pushdown", "q2_revenue_by_nation", "q1_pricing_summary", "x5_minhash_pairs").foreach { q =>
        val plan = graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        println(s"===== $q =====")
        plan.linesIterator
          .filter(l => l.contains("PushedFilters") || l.contains("Scan parquet") ||
            l.contains("Join") || l.contains("Exchange") || l.contains("ReadSchema") ||
            l.contains("WholeStageCodegen"))
          .take(12).foreach(l => println(l.take(220)))
      }
    } finally spark.stop()
  }
}
