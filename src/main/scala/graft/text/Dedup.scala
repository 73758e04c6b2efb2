package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale document deduplication — the training-data-pipeline operators
  * the builder prompt mandates beyond the reference surface. All methods are
  * shuffle-disciplined for 100 TB operation:
  *
  *   - signatures (md5 / minhash / simhash) are computed per-row in one
  *     narrow pass (no shuffle, codegen or single UDF call);
  *   - candidate generation shuffles once on a *band* key whose cardinality
  *     is tunable (bands × buckets), never on raw text;
  *   - exact verification runs only on candidate pairs (a tiny fraction).
  */
object Dedup {

  /** Exact dedup: md5 of normalized text. Returns one row per document with
    * its canonical (minimum) doc id per fingerprint group — the standard
    * keep-first policy. Single hash-aggregate shuffle on the fingerprint. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("fingerprint"))
    docs
      .withColumn("fingerprint", md5(col(textCol)))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col(idCol), col("fingerprint"), col("canonical_id"), col("group_size"))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Deterministic 64-bit string hash (FNV-1a) — reimplemented here so
    * signatures are stable across Spark versions (xxhash64 seed semantics
    * are version-pinned). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Character shingles of the lowercased text. */
  def shingles(text: String, size: Int): Array[Long] = {
    val t = text.toLowerCase
    if (t.length < size) Array(fnv1a64(t))
    else {
      val out = new Array[Long](t.length - size + 1)
      var i = 0
      while (i + size <= t.length) {
        out(i) = fnv1a64(t.substring(i, i + size))
        i += 1
      }
      out
    }
  }

  /** MinHash signature: H independent permutations h_i(x) = a_i*x + b_i
    * (odd multipliers from a seeded splitmix), min over shingle hashes. */
  def minhashSignature(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val sh = shingles(text, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < numHashes) {
      // splitmix64-derived per-hash coefficients (deterministic)
      var z = (i + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val a = z | 1L
      val b = z ^ (z >>> 31)
      var j = 0
      var m = Long.MaxValue
      while (j < sh.length) {
        val v = a * sh(j) + b
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  private def minhashUdf(numHashes: Int, shingleSize: Int) =
    udf((text: String) => minhashSignature(text, numHashes, shingleSize))

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → minhash → band → bucket-join: signatures banded into
    * `bands` groups of `rows` values; documents sharing any band bucket are
    * candidates; candidates verified by estimated Jaccard (matching
    * signature fraction) ≥ `threshold`.
    *
    * @return (a_id, b_id, est_jaccard) with a_id < b_id
    */
  def minhashLsh(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      bands: Int = 16, rows: Int = 8, shingleSize: Int = 5,
      threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rows
    val withSig = docs
      .select(col(idCol).as("_id"), col(textCol).as("_text"))
      .withColumn("sig", minhashUdf(numHashes, shingleSize)(col("_text")))
      .drop("_text")
    // band key: hash of the signature slice — one shuffle on (band, key)
    val banded = withSig.select(col("_id"), col("sig"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> hash(slice(sig, b * $rows + 1, $rows)))")).as(Seq("band", "bucket")))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("a_id", "b_id")
    pairs
      .withColumn("est_jaccard",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / size(sig_a)"))
      .where(col("est_jaccard") >= threshold)
      .select("a_id", "b_id", "est_jaccard")
  }

  /** 64-bit SimHash over word tokens (weight 1 each). */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        val h = fnv1a64(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val simhashUdf = udf((text: String) => simhash64(text))

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxHamming.
    * Candidate generation by 16-bit band equality (4 bands): any pair with
    * Hamming ≤ 3 shares at least one exact band (pigeonhole), so the
    * band-join finds all such pairs without an all-pairs comparison. */
  def simhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole guarantees recall only for hamming ≤ 3")
    val withSim = docs.select(col(idCol).as("_id"), simhashUdf(col(textCol)).as("simhash"))
    val banded = withSim.select(col("_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), " +
        "b -> (simhash >> (b * 16)) & 65535)")).as(Seq("band", "bucket")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact word-n-gram Jaccard similarity for candidate pairs (the
    * verification stage after any LSH screen). Takes a pair DataFrame
    * (a_id, b_id) plus the docs table; joins text in twice, computes exact
    * Jaccard over word n-gram sets in a single UDF. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val jac = udf((a: String, b: String) => {
      def grams(s: String): Set[Seq[String]] =
        s.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(n).map(_.toSeq).toSet
      val ga = grams(a)
      val gb = grams(b)
      val inter = ga.intersect(gb).size.toDouble
      val union = ga.union(gb).size.toDouble
      if (union == 0) 1.0 else inter / union
    })
    val d = docs.select(col(idCol), col(textCol))
    pairs
      .join(d.withColumnRenamed(idCol, "a_id").withColumnRenamed(textCol, "_ta"), "a_id")
      .join(d.withColumnRenamed(idCol, "b_id").withColumnRenamed(textCol, "_tb"), "b_id")
      .withColumn("jaccard", jac(col("_ta"), col("_tb")))
      .drop("_ta", "_tb")
  }
}
