package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.JavaConverters._

/** Training-mix sampling for web-scale corpora: deterministic hash
  * sampling (uniform and per-stratum rates) and a skew-safe per-stratum
  * cap — the operators that turn a deduplicated crawl into a training
  * mixture (downsample over-represented languages/sources, bound any one
  * stratum's contribution).
  *
  * Scale design (10^12 docs):
  *  - sampling is a PURE FILTER on `xxhash64(id)` — no RNG state, no
  *    shuffle, bit-reproducible across runs, executors and cluster
  *    sizes, and pushable below wide transforms (`rand()` sampling is
  *    none of these: per-task state makes the kept set depend on the
  *    physical split layout);
  *  - the cap never funnels a whole stratum through one task: a
  *    shuffle-free per-partition prune (bounded heaps inside
  *    mapPartitions) reduces each stratum to at most k rows PER
  *    PARTITION before the exact global window runs over the
  *    ≤ k·partitions survivors. Low-cardinality strata (a handful of
  *    languages over 10^12 docs) would otherwise each serialize on one
  *    window reducer holding billions of rows.
  */
object Sampling {

  private val M = 1000000L

  /** The hashable id column: INTEGRAL ids are cast to long so every
    * width lands on the documented audit contract (the LONG hash,
    * AnswerKeys.xxh64LongMirror — xxhash64 hashes an int's 4 bytes
    * differently from a long's 8); any other type (string urls, …) is
    * hashed AS ITS OWN TYPE — casting a url to long would yield null for
    * every row, xxhash64(null) is one constant, and the "sample" would
    * silently keep 100% or 0% of the corpus (round-4 review). */
  private def hashableId(df: DataFrame, idCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(idCol).cast("long")
      case _ => col(idCol)
    }
  }

  /** Deterministic keep-predicate: pmod(xxhash64(id), 10^6) < rate·10^6.
    * Spark's xxhash64 (seed 42). The rate→threshold product is IEEE
    * double then truncated, on both sides of the oracle. */
  private def keeps(idCol: Column, rate: Column): Column =
    pmod(xxhash64(idCol), lit(M)) < (rate * lit(M)).cast("long")

  /** Uniform deterministic sample: keeps ≈ rate of rows, stable per id. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(keeps(hashableId(df, idCol), lit(rate)))

  /** Stratified training mix: per-stratum keep rates with a default for
    * unlisted strata. The rates map is tiny (languages, sources) so it
    * compiles to a codegen'd CASE chain — no join, and the keep set per
    * stratum is a PREFIX-stable superset/subset across rate changes (the
    * hash threshold moves, membership of unaffected ids does not). */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(keeps(hashableId(df, idCol), rateCol))
  }

  /** An id column REQUIRED to be integral, cast to long. The sibling
    * [[hashableId]] can hash any type; the cap/pack operators carry the
    * id as a primitive long, where a string id would CAST TO NULL for
    * every row and silently collapse identities to 0 (ADVICE r4) — fail
    * loudly with a remediation instead. Scale-0 decimals (the common
    * warehouse BIGINT surrogate) are accepted — the cast is exact and
    * an out-of-range value fails loudly under ANSI rather than nulling
    * (round-5 review: the first guard rejected them for no reason the
    * null-cast rationale covers). Float/double stay rejected: a
    * fractional id would silently TRUNCATE to a colliding long. */
  private def integralId(df: DataFrame, idCol: String, op: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(idCol).cast("long")
      case d: DecimalType if d.scale == 0 => col(idCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"$op requires an integral id column; '$idCol' is $other — " +
          "re-key non-integral ids first (e.g. withColumn(\"id\", xxhash64(col(\"url\"))))")
    }
  }

  /** Keep the top-k rows of each stratum by (orderCol DESC, id ASC) —
    * "cap each language at k docs, best first". Returns (id, stratum,
    * ord); ids must BE integral (checked — see [[integralId]]), orderCol
    * casts to double, strata are compared
    * by their STRING form (the column is cast — an int source id or a
    * date bucket groups by its rendering). NULL ord rows rank last (ties
    * broken by id), NULL strata form their own stratum.
    *
    * Two stages: a shuffle-free per-partition bounded-heap prune, then
    * the exact row_number window over the ≤ k·partitions survivors — the
    * window's exchange moves almost nothing, and no stratum ever funnels
    * its full corpus share through one reducer. */
  def capPerStratum(
      df: DataFrame, idCol: String, strataCol: String,
      orderCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val slim = df.select(integralId(df, idCol, "capPerStratum").as("id"),
      col(strataCol).cast("string").as("stratum"),
      col(orderCol).cast("double").as("ord"))
    // heap key ordering: FIRST element = the worst kept row. null ord maps
    // to -Infinity here AND in the window sort key below, so both stages
    // rank identically (real -Inf values tie with nulls; id breaks ties).
    val worseFirst = new java.util.Comparator[(Double, Long)] with java.io.Serializable {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }
    val pruned = slim.mapPartitions { it =>
      // a bounded PriorityQueue per stratum: head = worst kept row.
      // Duplicate (ord, id) keys are admitted natively, so fully-
      // duplicate rows each survive the prune when they fit in the top k
      // — the kept COUNT can't depend on which partition copies landed in
      val keyed = new java.util.Comparator[(Double, Long, Row)] with java.io.Serializable {
        def compare(a: (Double, Long, Row), b: (Double, Long, Row)): Int =
          worseFirst.compare((a._1, a._2), (b._1, b._2))
      }
      val heaps = new scala.collection.mutable.HashMap[String, java.util.PriorityQueue[(Double, Long, Row)]]()
      it.foreach { row =>
        val stratum = if (row.isNullAt(1)) null else row.getString(1)
        // -0.0 normalizes to 0.0: the window stage compares doubles with
        // SQL semantics (-0.0 == 0.0, tie broken by id) while
        // Double.compare orders -0.0 strictly below — un-normalized, the
        // two stages would rank differently and the result would be
        // layout-dependent (round-4 review)
        val ord =
          if (row.isNullAt(2)) Double.NegativeInfinity
          else { val v = row.getDouble(2); if (v == 0.0) 0.0 else v }
        val heap = heaps.getOrElseUpdate(stratum,
          new java.util.PriorityQueue[(Double, Long, Row)](k + 1, keyed))
        heap.offer((ord, row.getLong(0), row))
        if (heap.size > k) heap.poll() // pops the worst (maybe the newcomer)
      }
      heaps.valuesIterator.flatMap(_.iterator.asScala.map(_._3))
    }(org.apache.spark.sql.Encoders.row(slim.schema))
    val w = Window.partitionBy("stratum")
      .orderBy(coalesce(col("ord"), lit(Double.NegativeInfinity)).desc, col("id").asc)
    pruned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** Sequence packing (the pretraining step after the mix): pack docs
    * into bins of at most `capacity` tokens by first-fit-decreasing,
    * DETERMINISTICALLY — the (group, bin) of every doc is a pure function
    * of the data, independent of cluster size or split layout.
    *
    * Docs are assigned to `numGroups` LOGICAL groups by
    * `pmod(xxhash64(id), numGroups)` (not by physical partition — a
    * partition-local packing would change with the layout); each group is
    * packed independently by FFD over its docs sorted (tokens desc, id
    * asc). One exchange (the groupByKey), kernel inside. Size numGroups
    * like shuffle partitions: a group must fit one task's memory — at
    * 10^12 docs that means millions of groups, which costs nothing (the
    * group id is a hash, not a distinct-count). A doc larger than
    * `capacity` gets a bin of its own (truncation is the caller's
    * policy, not the packer's).
    *
    * Returns (id, grp, bin, tokens): bin ids are dense per group in FFD
    * creation order. */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, numGroups: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(numGroups > 0, s"numGroups must be positive, got $numGroups")
    val spark = df.sparkSession
    import spark.implicits._
    // null ids carry no identity to hash or emit — dropped (documented);
    // a null token count packs as 0 (PackDoc's primitive fields would
    // otherwise kill the job on the first null, unlike capPerStratum's
    // graceful null handling)
    val idL = integralId(df, idCol, "packSequences")
    val slim = df.filter(col(idCol).isNotNull)
      .select(idL.as("id"),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("tokens"),
        pmod(xxhash64(idL), lit(numGroups.toLong)).as("grp"))
      .as[PackDoc]
    slim.groupByKey(_.grp)
      .flatMapGroups { (grp, it) =>
        // FFD: sort (tokens desc, id asc), first bin with room, else new.
        // The first-fit scan is linear in bins — size numGroups so a
        // group holds ~10^4 docs and the scan stays trivial per task.
        val docs = it.toArray.sortBy(p => (-p.tokens, p.id))
        val room = new scala.collection.mutable.ArrayBuffer[Long]()
        docs.iterator.map { p =>
          var b = 0
          while (b < room.length && room(b) < p.tokens) b += 1
          if (b == room.length) room += (capacity - p.tokens).max(0L)
          else room(b) -= p.tokens
          (p.id, grp, b, p.tokens)
        }
      }
      .toDF("id", "grp", "bin", "tokens")
  }

  /** Packing input row (public: Spark codegen instantiates it). */
  final case class PackDoc(id: Long, tokens: Long, grp: Long)
}
