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
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v_emb"))
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

  /** Random-hyperplane LSH bucket id (nBits sign bits). */
  def lshBucketKernel(vec: Seq[Float], nBits: Int, seed: Long): Int = {
    var bucket = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * planeValue(seed, b, d); d += 1 }
      if (dot >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** ANN top-k: candidates share an LSH bucket with the query (multi-table:
    * `tables` independent hashings to boost recall), exact cosine inside. */
  def lshTopK(
      vectors: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketUdf = udf((v: Seq[Float], t: Int) => lshBucketKernel(v, nBits, 0x5EED0000L + t))
    def withBuckets(df: DataFrame, id: String, emb: String) =
      df.select(col(idCol).as(id), col(vecCol).as(emb))
        .withColumn("table", explode(sequence(lit(0), lit(tables - 1))))
        .withColumn("bucket", bucketUdf(col(emb), col("table")))
    val v = withBuckets(vectors, "vec_id", "v_emb")
    val q = withBuckets(queries, "query_id", "q_emb")
    val cand = v.join(q, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "q_emb", "v_emb")
      .dropDuplicates("query_id", "vec_id")
      .withColumn("sim", cosine(col("v_emb"), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
    * k-means centroids partition the vector space; each vector lands in one
    * inverted list (cluster); a query probes only the `nProbe` nearest
    * lists. At 10^9 vectors this turns the scan into a partition-pruned
    * equi-join on cluster id (vs LSH's bucket join — both shipped, pick by
    * recall/latency needs).
    *
    * Centroids are trained ONCE (deterministic seed) on a bounded sample —
    * the broadcast-model pattern again (reference: readTuples once per
    * process, main/kd.c:645-724). */
  def ivfTopK(
      vectors: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 10000, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val spark = vectors.sparkSession
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val train = vectors.select(col(vecCol)).limit(trainSample)
      .withColumn("features", toVec(col(vecCol)))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(10)
      .fit(train.select("features"))
    val centroids = model.clusterCenters.map(_.toArray)
    val bc = spark.sparkContext.broadcast(centroids)

    def nearestLists(n: Int) = udf { (v: Seq[Float]) =>
      val cs = bc.value
      val dists = cs.indices.map { ci =>
        var d = 0.0
        var j = 0
        val c = cs(ci)
        while (j < v.length && j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        (ci, d)
      }
      dists.sortBy(_._2).take(n).map(_._1)
    }

    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v_emb"))
      .withColumn("list", nearestLists(1)(col("v_emb"))(0)) // assign: 1 list
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
      .withColumn("list", explode(nearestLists(nProbe)(col("q_emb")))) // probe: nProbe lists
    val cand = v.join(q, Seq("list"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "q_emb", "v_emb")
      .dropDuplicates("query_id", "vec_id")
      .withColumn("sim", cosine(col("v_emb"), col("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate PAIRS (the dedup flavor of ANN):
    * LSH-bucket self-join → exact cosine inside buckets → threshold.
    * Never O(n²); candidates come from an equi-join on (table, bucket). */
  def embeddingNearDupPairs(
      vectors: DataFrame, threshold: Double = 0.95,
      nBits: Int = 12, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketUdf = udf((v: Seq[Float], t: Int) => lshBucketKernel(v, nBits, 0x5EED0000L + t))
    val b = vectors.select(col(idCol).as("id"), col(vecCol).as("emb"))
      .withColumn("table", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket", bucketUdf(col("emb"), col("table")))
    val l = b.select(col("table"), col("bucket"), col("id").as("id_a"), col("emb").as("emb_a"))
    val r = b.select(col("table"), col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
    l.join(r, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "emb_a", "emb_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
