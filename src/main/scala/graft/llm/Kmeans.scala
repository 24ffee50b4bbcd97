package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spherical k-means over an embedding column — the centroid
  * TRAINER the IVF tier was missing ([[Similarity.ivfTopK]] samples corpus
  * vectors as cells; trained centroids adapt cell boundaries to the data
  * distribution, the standard inverted-file construction: train, then
  * assign, then probe).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - assignment is a MAP-ONLY stage: the k centroids travel into every
  *    task as literals (k·dim doubles — bounded by the `k` parameter, the
  *    same boundedness argument as ivfTopK's broadcast centroid table).
  *    No join, no shuffle: each row computes k cosines and keeps the
  *    argmax.
  *  - each Lloyd update is ONE mergeable aggregation: `reduce_agg` folds
  *    every partition's vectors into a running elementwise sum (O(dim)
  *    state per cluster per partition, map-side combined), so the shuffle
  *    carries k × partitions rows — never the corpus.
  *  - cosine is scale-invariant, so centroids stay UNNORMALIZED sums
  *    (mean = sum/n has the same argmax) — no division, no extra pass,
  *    and on integer-valued vectors the update is exact.
  *
  * Determinism: hyperparameter-free given the corpus — init is either the
  * k smallest `xxhash64(id)` rows (pseudo-random but reproducible, the
  * [[Similarity.ivfTopK]] sampling rule) or the k smallest ids
  * (`initByLowestId`, the oracle-friendly form), ties in assignment break
  * to the HIGHEST cluster id (the ivf convention), and re-running a task
  * recomputes identical values — retry-safe, partitioning-independent.
  */
object Kmeans {

  /** Best (cluster, cos) per row against a bounded literal centroid list —
    * the map-only kernel shared by train and [[assign]]. Rows whose cosine
    * is NULL against every centroid (zero-norm or wrong-dimension vectors)
    * are dropped: they have no meaningful cell.
    */
  private def bestOf(v: Column, centroids: Seq[(Long, Seq[Double])]): Column =
    array_max(array(centroids.map { case (c, cen) =>
      struct(Similarity.cosine(v, typedLit(cen)).as("cos"), lit(c).as("cluster"))
    }: _*))

  /** Assign every corpus vector to its highest-cosine centroid.
    * `centroids` is a small (cluster, centroid) frame — e.g. [[train]]'s
    * output — collected to the driver (bounded by k) and applied as a
    * map-only projection. Output: (id, cluster, cos).
    */
  def assign(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, maxK: Int = 65536): DataFrame = {
    val cents = collectCentroids(centroids, maxK)
    val best = bestOf(col("__v"), cents)
    corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__best", best)
      .filter(col("__best.cos").isNotNull)
      .select(col("id"), col("__best.cluster").as("cluster"), col("__best.cos").as("cos"))
  }

  /** `iters` rounds of Lloyd's algorithm at cosine distance.
    * Returns one row per cluster 1..k: (cluster, centroid, n) where
    * `centroid` is the elementwise SUM of the members after the final
    * round (unnormalized — cosine users need no mean) and `n` the final
    * member count. A cluster that captures no vectors keeps its previous
    * centroid and reports n = 0 (the FAISS empty-cell rule, not a crash).
    *
    * @param initByLowestId deterministic-by-id init (oracle-replicable in
    *   plain SQL); default = k smallest xxhash64(id), a reproducible
    *   pseudo-random sample like [[Similarity.ivfTopK]]'s.
    */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, dim: Int = 64, initByLowestId: Boolean = false): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(iters >= 1, "iters must be at least 1")
    val spark = corpus.sparkSession
    val vecs = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val initOrd =
        if (initByLowestId) Seq(col("id").asc)
        else Seq(xxhash64(col("id")).asc, col("id").asc)
      var cents: Seq[(Long, Seq[Double])] = vecs
        .orderBy(initOrd: _*).limit(k).collect()
        .zipWithIndex
        .map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](1).toIndexedSeq) }
      require(cents.nonEmpty, "k-means needs at least one valid input vector")
      var counts: Map[Long, Long] = Map.empty
      val zeros = s"array_repeat(CAST(0 AS DOUBLE), $dim)"
      for (_ <- 1 to iters) {
        val assigned = vecs
          .withColumn("__best", bestOf(col("v"), cents))
          .filter(col("__best.cos").isNotNull)
          .select(col("__best.cluster").as("cluster"), col("v"))
        // one mergeable aggregation: per-cluster elementwise vector sum
        // (O(dim) state, map-side combined) + member count
        val updated = assigned
          .groupBy(col("cluster"))
          .agg(
            expr(s"""reduce_agg(v, $zeros,
                    |  (s, x) -> zip_with(s, x, (a, b) -> a + b),
                    |  (s, t) -> zip_with(s, t, (a, b) -> a + b))""".stripMargin).as("centroid"),
            count(lit(1)).as("n"))
          .collect()
          .map(r => r.getLong(0) -> (r.getSeq[Double](1).toIndexedSeq, r.getLong(2)))
          .toMap
        cents = cents.map { case (c, old) =>
          c -> updated.get(c).map(_._1).getOrElse(old) // empty cell: keep
        }
        counts = cents.map { case (c, _) => c -> updated.get(c).map(_._2).getOrElse(0L) }.toMap
      }
      val out = cents.map { case (c, cen) => (c, cen, counts.getOrElse(c, 0L)) }
      spark.createDataFrame(out).toDF("cluster", "centroid", "n")
    } finally vecs.unpersist()
  }

  /** [[assign]] for LARGE centroid tables: a broadcast join + map-side
    * argmax instead of a literal expression array. The literal form's
    * expression tree grows with k (codegen method-size limits bite around
    * k ≈ 1000); this form broadcasts the centroid frame, computes one
    * cosine per (row, centroid) in the streamed nested-loop join, and
    * reduces to the per-row argmax with `max_by` — PARTIAL aggregation
    * runs map-side, so the shuffle carries one row per corpus vector,
    * never the n × k join output. Same (cos DESC, cluster DESC ties →
    * highest cluster wins) convention as [[assign]], spec-locked equal.
    * Compute is inherently n × k cosines either way; this variant removes
    * the expression-size ceiling, not the arithmetic.
    */
  def assignByJoin(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids
      .select(col("cluster").cast("long").as("__c"),
        col("centroid").cast("array<double>").as("__cen")))
    corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(cents)
      .withColumn("__cos", Similarity.cosine(col("__v"), col("__cen")))
      .filter(col("__cos").isNotNull)
      .groupBy(col("id"))
      .agg(max(struct(col("__cos").as("cos"), col("__c").as("cluster"))).as("__best"))
      .select(col("id"), col("__best.cluster").as("cluster"),
        col("__best.cos").as("cos"))
  }

  /** (cluster, centroid) rows → bounded driver-side list, cluster-sorted. */
  private def collectCentroids(
      centroids: DataFrame, maxK: Int): Seq[(Long, Seq[Double])] = {
    val rows = centroids
      .select(col("cluster").cast("long"), col("centroid").cast("array<double>"))
      .limit(maxK + 1).collect()
    require(rows.length <= maxK,
      s"assign expects a bounded centroid table (> $maxK rows found); " +
        "raise maxK only if the centroid list genuinely fits the driver")
    rows.map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).sortBy(_._1)
  }
}
