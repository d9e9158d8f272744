package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LM perplexity filtering — the third leg of the CCNet triple (line
  * dedup + langid + LM score): score every document's bits-per-char
  * under a small language model trained on a corpus sample, so quality
  * strata can drop/downweight high-perplexity (boilerplate-ish,
  * non-linguistic) documents.
  *
  * In-sandbox the model is a CHAR-BIGRAM LM (no external model files);
  * production swaps the model for a KenLM-style word n-gram — the
  * Spark shape is identical and is the part that matters here:
  *  - training reads a BOUNDED hash sample (the deterministic
  *    [[Sampling.hashSample]] rule — reproducible at any cluster size),
  *    counts transitions distributed (partial-agg groupBy), and keeps
  *    only the top `maxPairs` pairs under a total order — the model
  *    that reaches the driver is capped regardless of corpus size;
  *  - scoring broadcasts the model once and runs MAP-SIDE — the corpus
  *    is scanned once, nothing shuffles (the S6 model-load →
  *    broadcast pattern at corpus scale).
  *
  * The scoring spec (documented for the oracle mirror): transitions are
  * code points with a 0 sentinel before the first; P(next|prev) =
  * (C(prev,next) + 1) / (C(prev,·) + 65536) with C(prev,·) summed over
  * the TRUNCATED model; bits/char = Σ −log(P)/log(2) over transitions,
  * divided by the transition count; null/empty text scores 0.
  */
object LanguageModel {

  /** Broadcastable truncated bigram model. Keys pack (prev, next) code
    * points as (prev << 32) | next. */
  final case class CharLm(pairs: Map[Long, Long], prevTotals: Map[Long, Long])
      extends Serializable

  /** Code-point transition keys of a text, 0-sentinel start. */
  private[functions] def bigramKeys(text: String): Array[Long] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Long](text.length)
    var prev = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      out += (prev << 32) | cp.toLong
      prev = cp.toLong
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Train on a deterministic hash sample; keep the `maxPairs` most
    * frequent transition pairs (ties broken by key — a total order, so
    * the model is a pure function of the data at any layout). */
  def trainCharBigramLm(
      docs: DataFrame, idCol: String, textCol: String,
      sampleRate: Double = 0.1, maxPairs: Int = 100000): CharLm = {
    require(maxPairs > 0, s"maxPairs must be positive, got $maxPairs")
    val keysUdf = udf((t: String) => bigramKeys(t))
    val pairs = Sampling.hashSample(
        docs.select(col(idCol).as("id"), col(textCol).as("text")), "id", sampleRate)
      .select(explode(keysUdf(col("text"))).as("k"))
      .groupBy("k").count()
      .orderBy(col("count").desc, col("k").asc)
      .limit(maxPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val prevTotals = pairs.groupBy(_._1 >>> 32).map { case (p, ps) =>
      (p, ps.map(_._2).sum) }
    CharLm(pairs.toMap, prevTotals)
  }

  /** Bits-per-char of one text under the model (the documented spec). */
  def bitsPerCharKernel(text: String, lm: CharLm): Double = {
    val keys = bigramKeys(text)
    if (keys.isEmpty) return 0.0
    var bits = 0.0
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      val c = lm.pairs.getOrElse(k, 0L)
      val total = lm.prevTotals.getOrElse(k >>> 32, 0L)
      bits += -(math.log((c + 1L).toDouble / (total + 65536L).toDouble) / math.log(2.0))
      i += 1
    }
    bits / keys.length
  }

  /** Map-side scoring under the broadcast model: (id, bits) with bits
    * rounded to 4 (the oracle-comparison convention). */
  def scoreBitsPerChar(
      docs: DataFrame, idCol: String, textCol: String, lm: CharLm): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(lm)
    val scoreUdf = udf((t: String) => bitsPerCharKernel(t, bc.value))
    docs.select(col(idCol).as("id"),
      round(scoreUdf(col(textCol)), 4).as("bits_per_char"))
  }
}
