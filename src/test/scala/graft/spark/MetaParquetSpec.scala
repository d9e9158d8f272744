package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The driver-side metadata parquet path (round-6 optimization) must be
  * byte-compatible with the Spark-written layout it replaced, in BOTH
  * directions: Spark reads MetaParquet files as the same table, and
  * MetaParquet reads Spark-written files from pre-existing stores. */
class MetaParquetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("metaparquet-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("checkpoint: driver-written commits round-trip through Spark and MetaParquet") {
    val dir = tmp("meta_ckpt")
    val p = s"$dir/_checkpoint"
    MetaParquet.appendCommit(p, conf, 0L, 300L, "fp0", "2026-01-01T00:00:00Z")
    MetaParquet.appendCommit(p, conf, 1L, 200L, "compaction:0", "2026-01-02T00:00:00Z")

    // Spark sees the same table (schema names + values) the old writer produced
    val viaSpark = spark.read.parquet(p)
      .selectExpr("run_id", "doc_count", "source_fingerprint", "committed_at")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(viaSpark.toSeq == Seq(
      (0L, 300L, "fp0", "2026-01-01T00:00:00Z"),
      (1L, 200L, "compaction:0", "2026-01-02T00:00:00Z")))

    // the driver-side reader agrees
    assert(MetaParquet.readCheckpoint(p, conf).sortBy(_._1).toSeq ==
      Seq((0L, "fp0"), (1L, "compaction:0")))
  }

  test("checkpoint: MetaParquet reads Spark-written files (pre-existing stores)") {
    val dir = tmp("meta_ckpt_spark")
    val p = s"$dir/_checkpoint"
    val s = spark; import s.implicits._
    Seq((7L, 42L, "sparkfp", "2026-01-03T00:00:00Z"))
      .toDF("run_id", "doc_count", "source_fingerprint", "committed_at")
      .write.mode("append").parquet(p)
    MetaParquet.appendCommit(p, conf, 8L, 1L, "mixed", "2026-01-04T00:00:00Z")
    assert(MetaParquet.readCheckpoint(p, conf).sortBy(_._1).toSeq ==
      Seq((7L, "sparkfp"), (8L, "mixed")))
    // missing dir reads as empty, not an error
    assert(MetaParquet.readCheckpoint(s"$dir/absent", conf).isEmpty)
  }

  test("a crash mid-write leaves only an invisible temp orphan, never a truncated table") {
    val dir = tmp("meta_crash")
    val p = s"$dir/_checkpoint"
    MetaParquet.appendCommit(p, conf, 0L, 10L, "fp", "2026-01-01T00:00:00Z")
    // simulate the crash window: a dot-prefixed .tmp with a truncated
    // (footer-less) body, exactly what a killed writer leaves behind
    java.nio.file.Files.write(
      java.nio.file.Paths.get(p, ".part-dead.parquet.tmp"), Array[Byte](80, 65, 82))
    // both readers skip it; the committed record is intact
    assert(MetaParquet.readCheckpoint(p, conf).toSeq == Seq((0L, "fp")))
    assert(spark.read.parquet(p).count() == 1)
    // and a successful write leaves no temp files at all
    val names = new java.io.File(p).listFiles().map(_.getName).toSeq
    assert(names.count(_.endsWith(".tmp")) == 1) // only the planted orphan
    assert(names.count(n => n.startsWith("part-") && n.endsWith(".parquet")) == 1)
  }

  test("retired: append accumulates and interops with Spark-written rows") {
    val dir = tmp("meta_retired")
    val p = s"$dir/_retired"
    val s = spark; import s.implicits._
    Seq(0L).toDF("run_id").write.mode("append").parquet(p)
    MetaParquet.appendRetired(p, conf, Seq(1L, 2L))
    assert(MetaParquet.readRetired(p, conf) == Set(0L, 1L, 2L))
    assert(spark.read.parquet(p).collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
  }

  test("hot_hosts: nullable est_fraction and the empty-table schema survive") {
    val dir = tmp("meta_hosts")
    val p0 = s"$dir/hot_hosts/run_id=0"
    MetaParquet.writeHotHosts(p0, conf, Seq(
      ExtractJob.HotHostRow(0L, "a.example.com", 0.25, salted = true),
      ExtractJob.HotHostRow(0L, "b.example.com", null, salted = false)))
    // overwrite semantics: a second write replaces, never appends
    MetaParquet.writeHotHosts(p0, conf, Seq(
      ExtractJob.HotHostRow(0L, "a.example.com", 0.25, salted = true),
      ExtractJob.HotHostRow(0L, "b.example.com", null, salted = false)))
    val rows = spark.read.parquet(p0)
      .selectExpr("run_id", "host", "est_fraction", "salted")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)),
        r.getBoolean(3)))
      .sortBy(_._2)
    assert(rows.toSeq == Seq(
      (0L, "a.example.com", java.lang.Double.valueOf(0.25), true),
      (0L, "b.example.com", null, false)))

    // empty audit table keeps a readable schema (static-list-free runs)
    val p1 = s"$dir/hot_hosts/run_id=1"
    MetaParquet.writeHotHosts(p1, conf, Seq.empty)
    val empty = spark.read.parquet(p1)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("run_id", "host", "est_fraction", "salted"))
    // and the multi-run union read (readHotHosts' shape) still resolves
    assert(spark.read.parquet(p0, p1).count() == 2)
  }
}
