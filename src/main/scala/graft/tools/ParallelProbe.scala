package graft.tools

import graft.core.Extractor
import graft.fixtures.FixtureGen
import java.util.concurrent.atomic.AtomicLong

/** Dev tool: pure-JVM parallel scaling ceiling for generate+extract,
  * no Spark — separates kernel scalability from Spark overhead.
  * JIT-warms first, then measures each thread level twice. */
object ParallelProbe {

  private def run(threads: Int, from: Long, n: Long): Double = {
    val counter = new AtomicLong(from)
    val end = from + n
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var i = counter.getAndIncrement()
        while (i < end) {
          val f = FixtureGen.fixtureAt(42L, i)
          val r = Extractor.default.extract(f.url, f.html, f.lang)
          if (r.n_chars < 0) println("impossible") // keep r live
          i = counter.getAndIncrement()
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    n / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    println(f"warmup: ${run(16, 0, 30000)}%.0f docs/s")
    var off = 100000L
    Seq(1, 8, 32, 8, 32).foreach { threads =>
      val rate = run(threads, off, n)
      off += n
      println(f"threads=$threads%2d  docs/s=$rate%.0f")
    }
  }
}
