package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k; the corpus side is broadcast
  *     when small, and the dot products are pure higher-order-function
  *     expressions (`zip_with` + `aggregate`) — whole-stage codegen, no UDF.
  *   - `lshTopK`: random-hyperplane LSH bucketing (deterministic planes
  *     derived from a seed, computed per-row with no shuffle) → candidates
  *     share a bucket → exact rerank; queries left under-filled fall back
  *     to brute force. The scale path: bucket join shuffles only
  *     (query, bucket) keys, never the all-pairs cross product.
  */
object Ann {

  /** Cosine similarity of two ARRAY<FLOAT/DOUBLE> columns as a pure
    * Catalyst expression (codegen; no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact top-k cosine neighbours for each query vector.
    * @param queries (q_id, q_vec)
    * @param corpus  (c_id, c_vec)
    * @return (q_id, c_id, cos_sim, rank), rank 1 = most similar; the query
    *         row itself is excluded when ids collide.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      broadcastCorpus: Boolean = true): DataFrame = {
    val c = if (broadcastCorpus) broadcast(corpus) else corpus
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    queries.crossJoin(c)
      .where(col("q_id") =!= col("c_id"))
      .withColumn("cos_sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "cos_sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    var z = seed + plane.toLong * 0x9e3779b97f4a7c15L + dim.toLong * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Sign-bit bucket of a vector under `nPlanes` seeded hyperplanes. */
  def lshBucket(vec: Seq[Float], nPlanes: Int, seed: Long): Long = {
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) {
        dot += vec(d) * planeComponent(seed, p, d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Approximate top-k: LSH bucket candidates + exact rerank + brute-force
    * fallback for under-filled queries. With `nTables` independent hash
    * tables, recall rises without widening any single bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 12, nTables: Int = 4, seed: Long = 42L): DataFrame = {
    val bucketUdf = udf((vec: Seq[Float], table: Int) =>
      lshBucket(vec, nPlanes, seed + table * 7919L))
    val tables = (0 until nTables).map(lit(_))
    def withBuckets(df: DataFrame, vecCol: String): DataFrame =
      df.withColumn("table", explode(array(tables: _*)))
        .withColumn("bucket", bucketUdf(col(vecCol), col("table")))

    val qb = withBuckets(queries, "q_vec")
    val cb = withBuckets(corpus, "c_vec")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    val candidates = qb.join(cb, Seq("table", "bucket"))
      .where(col("q_id") =!= col("c_id"))
      .select("q_id", "q_vec", "c_id", "c_vec").dropDuplicates("q_id", "c_id")
      .withColumn("cos_sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "cos_sim", "rank")

    // queries that found < k candidates fall back to exact search
    val counts = candidates.groupBy("q_id").agg(count(lit(1)).as("n"))
    val underfilled = queries.join(counts.where(col("n") < k), Seq("q_id"), "left_semi")
      .unionByName(queries.join(counts, Seq("q_id"), "left_anti"))
    val fallback = bruteForceTopK(underfilled, corpus, k)
    candidates.join(underfilled.select("q_id"), Seq("q_id"), "left_anti")
      .unionByName(fallback)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via LSH blocking +
    * exact verification (the embedding-cosine near-dup of the prompt). */
  def nearDuplicatePairs(corpus: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 12, nTables: Int = 4, seed: Long = 42L): DataFrame = {
    val bucketUdf = udf((vec: Seq[Float], table: Int) =>
      lshBucket(vec, nPlanes, seed + table * 7919L))
    val tables = (0 until nTables).map(lit(_))
    val b = corpus.withColumn("table", explode(array(tables: _*)))
      .withColumn("bucket", bucketUdf(col("c_vec"), col("table")))
    b.as("a").join(b.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.c_id") < col("b.c_id"))
      .select(col("a.c_id").as("a_id"), col("b.c_id").as("b_id"),
        col("a.c_vec").as("va"), col("b.c_vec").as("vb"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .where(col("cos_sim") >= threshold)
      .select("a_id", "b_id", "cos_sim")
  }
}
