package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, as a training-data pipeline needs them:
  *  - bruteForceTopK: exact cosine top-k — the correctness baseline; cost
  *    |Q|·|C|, fine when the query set is small or as the final re-rank.
  *  - lshTopK: random-hyperplane LSH (Charikar signs) — corpus hashed once
  *    into 2^planes buckets, candidates meet only within their bucket (+
  *    optional multi-probe neighbors), exact re-rank inside. This is the
  *    scale path: the bucket join is a hash shuffle, never a cross join.
  *
  * Hyperplanes are pseudo-random but *deterministic* (hash-derived), so
  * results are reproducible across runs and partitionings.
  */
object Similarity {

  /** Exact cosine similarity between two numeric arrays (sequential fold,
    * deterministic). NULL on zero-norm input.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / nullif(na * nb, lit(0.0))
  }

  /** Exact top-k neighbors for every query row against the corpus.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane components in [-1, 1]:
    * component i of plane j is a scaled hash of (j, i). Materialized as a
    * literal matrix at plan time — zero per-row cost beyond the dot.
    */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until dim).map { i =>
        val h = scala.util.hashing.byteswap64(j.toLong * 1000003L + i)
        (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
      }
    }

  /** Sign-bucket of a vector under the hyperplane set: bit j = sign of
    * dot(v, plane_j). 2^nPlanes buckets.
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    ps.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeLit, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN top-k with multi-probe: corpus is hashed once into sign
    * buckets; each query probes its own bucket plus every bucket within
    * hamming distance 1 (flip one plane's sign — the standard multi-probe
    * trick that buys back recall without growing the corpus index). The
    * candidate join shuffles on bucket id; re-rank inside is exact. For
    * neighbors at angle θ, single-bucket recall is (1−θ/π)^nPlanes;
    * multi-probe adds the one-flip terms.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64, multiProbe: Boolean = true): DataFrame = {
    val probesFor: Column => Column = bucket =>
      if (multiProbe)
        array_union(array(bucket),
          transform(sequence(lit(0), lit(nPlanes - 1)),
            j => bucket.bitwiseXOR(call_function("shiftleft", lit(1L), j))))
      else array(bucket)

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket0", lshBucket(col("qv"), nPlanes, dim))
      .withColumn("bucket", explode(probesFor(col("bucket0"))))
      .drop("bucket0")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes, dim))
    val scored = q.join(c,
        q("bucket") === c("bucket") && col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
