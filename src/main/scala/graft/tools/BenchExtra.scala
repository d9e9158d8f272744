package graft.tools

import org.apache.spark.sql.SparkSession

/** Extra benchmark main (guide §1.4): times the SparkEntry query suite
  * with EXACTLY the Bench session/config/methodology (warm-up lap at the
  * smallest sf, two timed passes, per-query min) but WITHOUT the N-vs-4N
  * scaling block, so an iteration lap costs ~1 min instead of ~18.
  * Optional args select a query subset and a pass count. Never replaces
  * Bench for the driver; numbers cited from here are labelled as such in
  * OPTIMIZATION_r06.md.
  *
  * Usage: runMain graft.tools.BenchExtra [passes] [query ...]
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = if (args.nonEmpty) args(0).toInt else 2
    val subset = args.drop(1).toSet
    val names =
      if (subset.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
      else graft.SparkEntry.queries.keys.toSeq.filter(subset.contains).sorted

    val spark = session(cpus)
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getPath else sfDir
    }
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    def lap(): Seq[(String, Double)] = names.map { n =>
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[benchextra] $n FAILED: $e"); -1L }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val laps = (1 to passes).map(_ => lap())
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> laps.map(_(i)._2).min
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val passTotals = laps.map(l => f"${l.map(_._2).sum}%.3f").mkString("[", ",", "]")
    println(
      f"""{"metric":"suite","value":$total%.3f,"unit":"sec","queries":$qs,"pass_totals":$passTotals,"sf":"$sfDir"}""")
  }
}
