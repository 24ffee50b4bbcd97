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

  /** [[assign]] rung 3, for centroid tables in the TENS OF THOUSANDS:
    * an IVF probe over the centroid table itself, composing the
    * [[Similarity]] tier's inverted-file construction with [[assign]]'s
    * literal-expression kernel. Rungs, by k:
    *
    *  1. [[assign]] — k literal cosines per row, codegen ceiling ≈ 1000;
    *  2. [[assignByJoin]] — broadcast join lifts the expression ceiling,
    *     but compute stays n × k cosines (flop-bound once k ≳ 4096 — the
    *     SemDeDup "k ∝ n" rule makes this the binding constraint);
    *  3. this — a deterministic coarse quantizer of `nlist` cells over
    *     the centroids (the [[Similarity.ivfTopK]] hashed-sample rule);
    *     each VECTOR scores only the centroids in its `nprobe` best
    *     cells: n × (nlist + k·nprobe/nlist) cosines, √(n·k)-ish when
    *     nlist ≈ √k.
    *
    * Everything before the final aggregation is MAP-ONLY: the coarse
    * cells travel as literals (bounded by nlist, the [[assign]]
    * argument), per-row probe selection is an array sort over nlist
    * entries, and centroid cell membership is a k-row frame salted on
    * hot cells ([[Similarity]]'s hotBucketCap discipline) and joined on
    * cell id. The one corpus-wide shuffle is the same one row per vector
    * [[assignByJoin]] pays (map-side-combined max). Ties resolve (cos,
    * cluster) to the HIGHEST cluster — the shared convention, so with
    * nprobe = nlist the output is EXACTLY [[assignByJoin]]'s
    * (spec-locked); at nprobe < nlist it is approximate with recall
    * measured in KmeansSpec. Vectors with no valid cosine (zero-norm /
    * wrong dimension) are dropped, as in [[assign]].
    */
  def assignByAnn(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame,
      nlist: Int = 64, nprobe: Int = 8, hotCellCap: Int = 100000): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    val cents = centroids.select(col("cluster").cast("long").as("cluster"),
      col("centroid").cast("array<double>").as("cen"))
    // coarse quantizer: the nlist centroids with the smallest
    // xxhash64(cluster) — a deterministic pseudo-random sample, collected
    // driver-side (bounded by nlist) and applied as literals
    val coarseSeq: Seq[(Long, Seq[Double])] = cents
      .withColumn("__h", xxhash64(col("cluster")))
      .orderBy(col("__h").asc, col("cluster").asc)
      .limit(nlist).collect()
      .zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](1).toIndexedSeq) }
    require(coarseSeq.nonEmpty, "assignByAnn needs a non-empty centroid table")
    // each centroid lives in its best coarse cell (map-only literal argmax;
    // ties -> highest cell id, the shared convention)
    val members = cents
      .withColumn("__best", bestOf(col("cen"), coarseSeq))
      .filter(col("__best.cos").isNotNull)
      .select(col("__best.cluster").as("cell"), col("cluster"), col("cen"))
    // cell-width table (≤ nlist rows, broadcast): hot cells split into
    // ⌈w/cap⌉ salt values; probes replicate across them, so no join
    // partition exceeds ~cap centroids while candidates stay identical
    val cellSizes = members.groupBy("cell").agg(count(lit(1)).as("__w"))
      .withColumn("__nsplit",
        greatest(ceil(col("__w").cast("double") / hotCellCap), lit(1L)).cast("bigint"))
      .select(col("cell"), col("__nsplit"))
    val mSalted = members.join(broadcast(cellSizes), "cell")
      .withColumn("__salt", pmod(xxhash64(col("cluster")), col("__nsplit")))
      .drop("__nsplit")
    // per-vector probe list, map-side: score all nlist cells as a literal
    // struct array, sort, keep the nprobe best (cos DESC, cell DESC) —
    // no window, no shuffle of the n × nlist scored rows
    val scoredCells = array(coarseSeq.map { case (cell, cen) =>
      struct(Similarity.cosine(col("__v"), typedLit(cen)).as("cos"), lit(cell).as("cell"))
    }: _*)
    val probes = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cell",
        explode(slice(reverse(array_sort(filter(scoredCells, s => s.getField("cos").isNotNull))),
          1, nprobe).getField("cell")))
    val pSalted = probes.join(broadcast(cellSizes), "cell")
      .withColumn("__salt", explode(sequence(lit(0L), col("__nsplit") - 1)))
      .drop("__nsplit")
    pSalted
      .join(mSalted.withColumnRenamed("cell", "__cell_r").withColumnRenamed("__salt", "__salt_r"),
        col("cell") === col("__cell_r") && col("__salt") === col("__salt_r"))
      .withColumn("__cos", Similarity.cosine(col("__v"), col("cen")))
      .filter(col("__cos").isNotNull)
      .groupBy(col("id"))
      .agg(max(struct(col("__cos").as("cos"), col("cluster").as("cluster"))).as("__best"))
      .select(col("id"), col("__best.cluster").as("cluster"), col("__best.cos").as("cos"))
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
