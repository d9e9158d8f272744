package graft.streaming

import graft.spark.ParquetCheckpointStore
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class StreamingNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("streaming-neardup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val base = "large language models are trained on deduplicated web text " +
    "corpora because repeated documents waste compute and bias the distribution"

  test("waves probe everything absorbed before them; replays add nothing") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snd").toString
    val tbl = "snd_idx_" + java.util.UUID.randomUUID.toString.replace("-", "")
    def drain(): Unit =
      StreamingNearDup.run(s, s"$dir/in", s"$dir/out", s"$dir/ckpt", tbl,
        buckets = 4, threshold = 0.5).awaitTermination()
    def pairs(): Seq[(Long, Long)] =
      StreamingNearDup.readPairs(s, s"$dir/out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    try {
      // wave 0: bootstrap — no earlier corpus, no pairs
      Seq((1L, base.replace("waste", "burn")), (10L, "first wave filler text"))
        .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
      drain()
      assert(pairs().isEmpty, "bootstrap wave has nothing to probe")
      // wave 1: near-dup of a wave-0 doc pairs with it; distinct doc doesn't
      Seq((2L, base.replace("compute", "budget")), (20L, "second wave other text"))
        .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
      drain()
      assert(pairs() == Seq((2L, 1L)), s"got ${pairs()}")
      // wave 2: pairs with BOTH earlier waves (1 via index-only absorb of 2)
      Seq((3L, base)).toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
      drain()
      assert(pairs() == Seq((2L, 1L), (3L, 1L), (3L, 2L)), s"got ${pairs()}")
      // no new files: a drain adds no batches, pairs unchanged
      drain()
      assert(pairs() == Seq((2L, 1L), (3L, 1L), (3L, 2L)))
      // exactly-once accounting: 3 committed batches, one per wave
      assert(new ParquetCheckpointStore(s, s"$dir/out").committedRunIds() == Seq(0L, 1L, 2L))
      // verdicts are insensitive to duplicate index rows (the documented
      // at-least-once absorb): double-absorb wave 2's doc and re-probe it
      // as a new wave — candidates duplicate, pairs do not
      graft.functions.Dedup.appendToMinhashIndex(
        Seq((3L, base)).toDF("doc_id", "text"), "doc_id", "text", tbl, buckets = 4)
      Seq((4L, base.replace("documents", "pages")))
        .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
      drain()
      val p4 = pairs().filter(_._1 == 4L)
      assert(p4 == Seq((4L, 1L), (4L, 2L), (4L, 3L)), s"got $p4")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.FsUtil.deleteRecursively(new java.io.File(dir))
    }
  }
}
