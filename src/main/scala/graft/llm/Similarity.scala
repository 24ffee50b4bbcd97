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

  /** Exact cosine similarity between two numeric arrays — the native
    * flat-loop kernel (sketches.CosineSimilarityExpr via the registry;
    * value-identical to the lambda fold below, locked by spec). NULL on
    * zero-norm or length-mismatched input.
    */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** The interpreted lambda formulation — kept as the independent
    * reference implementation for the equivalence spec.
    */
  def cosineLambda(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / nullif(na * nb, lit(0.0))
  }

  /** Exact top-k neighbors for every query row against the corpus.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k.
    *
    * |Q|·|C| work — the correctness baseline and final re-rank, guarded
    * against accidental corpus-scale use (maxProduct bounds the pair
    * count; lshTopK is the scale path).
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxProduct: Long = 100000000L): DataFrame = {
    val nq = queries.count()
    val nc = corpus.count()
    require(nq * nc <= maxProduct,
      s"bruteForceTopK is O(|Q|·|C|) and got $nq × $nc pairs (bound $maxProduct): " +
        "use lshTopK for corpus-scale search, or pass maxProduct after sizing the slice")
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
    * dot(v, plane_j). 2^nPlanes buckets. Native flat-loop kernel
    * (sketches.LshSignBucket; same deterministic plane matrix as
    * [[lshBucketLambda]], locked by spec).
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    call_function("lsh_sign_bucket", vec, lit(nPlanes), lit(dim))

  /** The interpreted lambda formulation — the equivalence spec's
    * independent reference implementation.
    */
  def lshBucketLambda(vec: Column, nPlanes: Int, dim: Int): Column = {
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
  /** @param hotBucketCap corpus buckets wider than this are SALTED: a hot
    *   bucket of width w splits into ⌈w/cap⌉ hash cells and each probing
    *   query replicates across those cells, so no join partition exceeds
    *   ~cap corpus rows while the candidate set stays EXACTLY the same
    *   (each corpus row lives in one cell; the query visits all of them).
    *   Sign-bucket skew is the known failure mode of hyperplane LSH on
    *   clustered embeddings — this bounds it without losing recall.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64, multiProbe: Boolean = true,
      hotBucketCap: Int = 100000): DataFrame = {
    val probesFor: Column => Column = bucket =>
      if (multiProbe)
        array_union(array(bucket),
          transform(sequence(lit(0), lit(nPlanes - 1)),
            j => bucket.bitwiseXOR(call_function("shiftleft", lit(1L), j))))
      else array(bucket)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes, dim))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket0", lshBucket(col("qv"), nPlanes, dim))
      .withColumn("bucket", explode(probesFor(col("bucket0"))))
      .drop("bucket0")
    bucketedTopK(c, q, k, hotBucketCap)
  }

  /** The shared tail of every bucketed ANN variant: salt hot corpus
    * buckets into ⌈w/cap⌉ cells with query replication (identical
    * candidate set, bounded join partition width), join on (bucket, salt),
    * exact cosine re-rank, top-k per query.
    *
    * @param c (bucket, neighbor_id, cv) — one row per corpus vector per
    *          index cell it lives in
    * @param q (bucket, query_id, qv) — one row per query per probed cell
    */
  private def bucketedTopK(c: DataFrame, q: DataFrame, k: Int,
      hotBucketCap: Int): DataFrame = {
    // bucket-size table stays tiny (≤ #cells) — broadcast to both sides; a
    // query probing a bucket absent from the corpus joins away for free.
    val bucketSizes = c.groupBy("bucket")
      .agg(count(lit(1)).as("__bw"))
      .withColumn("__nsplit",
        greatest(ceil(col("__bw").cast("double") / hotBucketCap), lit(1L)).cast("bigint"))
      .select(col("bucket"), col("__nsplit"))
    val cSalted = c.join(broadcast(bucketSizes), "bucket")
      .withColumn("__salt", pmod(xxhash64(col("neighbor_id")), col("__nsplit")))
      .drop("__nsplit")
    val qSalted = q
      .join(broadcast(bucketSizes), "bucket")
      .withColumn("__salt", explode(sequence(lit(0L), col("__nsplit") - 1)))
      .drop("__nsplit")
    // corpus-side keys renamed so the join references distinct attributes
    // (both sides pass through bucketSizes — avoids lineage-ambiguity
    // resolution and its "trivially true predicate" warnings).
    val scored = qSalted.join(
        cSalted.withColumnRenamed("bucket", "bucket_r").withColumnRenamed("__salt", "__salt_r"),
        col("bucket") === col("bucket_r") && col("__salt") === col("__salt_r") &&
          col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the centroid-partitioned scale path, the
    * standard alternative to hyperplane LSH when embeddings cluster (an
    * IVF cell adapts to the data distribution where hyperplane buckets do
    * not). Deterministic, k-means-free construction suited to a pure
    * relational engine:
    *
    *  1. centroids = the nlist corpus vectors with the smallest
    *     xxhash64(id) — a deterministic pseudo-random sample, broadcast;
    *  2. every corpus vector joins the (broadcast) centroid table and is
    *     assigned to its best cell with max_by(cell, cos) — one map-side
    *     partial aggregation, NO shuffle of the n×nlist scored rows;
    *  3. each query probes its nprobe best cells (tiny: |Q|×nlist window);
    *  4. the shared bucketedTopK tail: salted hash join on cell id +
    *     exact re-rank.
    *
    * Recall grows with nprobe/nlist; candidates ≈ n·nprobe/nlist.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      hotBucketCap: Int = 100000): DataFrame = {
    require(nprobe <= nlist, "nprobe cannot exceed nlist")
    val centroids = corpus
      .select(col(idCol).as("cell_src"), col(vecCol).as("centroid"))
      .withColumn("__h", xxhash64(col("cell_src")))
      .orderBy(col("__h").asc, col("cell_src").asc)
      .limit(nlist)
      .withColumn("bucket", row_number().over(
        Window.orderBy(col("__h").asc, col("cell_src").asc)).cast("long"))
      .select(col("bucket"), col("centroid"))
    ivfFrom(queries, corpus, idCol, vecCol, k, centroids, nprobe, hotBucketCap)
  }

  /** IVF probe over TRAINED cells: same plan as [[ivfTopK]] but the cell
    * table comes from [[Kmeans.train]] (columns (cluster, centroid, …))
    * instead of a hashed corpus sample — centroids adapted to the data
    * distribution, the standard train-then-probe inverted-file build.
    */
  def ivfTopKTrained(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: DataFrame, nprobe: Int = 4,
      hotBucketCap: Int = 100000): DataFrame =
    ivfFrom(queries, corpus, idCol, vecCol, k,
      centroids.select(col("cluster").cast("long").as("bucket"),
        col("centroid").cast("array<double>").as("centroid")),
      nprobe, hotBucketCap)

  private def ivfFrom(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: DataFrame, nprobe: Int,
      hotBucketCap: Int): DataFrame = {
    // deterministic tie-break: equal-cos cells (duplicate sampled
    // centroids happen on duplicate-heavy corpora) resolve to the highest
    // bucket id, never to partial-agg arrival order
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__cos", cosine(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("bucket"), struct(col("__cos"), col("bucket"))).as("bucket"),
        first(col("cv")).as("cv"))
      .select(col("bucket"), col("neighbor_id"), col("cv"))

    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__cos", cosine(col("qv"), col("centroid")))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("bucket").asc)
    val q = qScored
      .withColumn("__pr", row_number().over(qw))
      .filter(col("__pr") <= nprobe)
      .select(col("bucket"), col("query_id"), col("qv"))

    bucketedTopK(c, q, k, hotBucketCap)
  }
}
