package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftColumns

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k with a BROADCAST of the (small)
  * query set — map-side only, no shuffle except the final per-query top-k
  * aggregation. Scale paths: SRP-LSH buckets and IVF cells shrink the
  * pair space from N×Q to bucket-local joins.
  *
  * All pairwise scoring goes through the codegen `cosine_sim` /
  * `srp_band` Catalyst expressions ([[graft.functions.VectorKernels]]) —
  * primitive double loops, no interpreted higher-order functions in any
  * per-pair hot path.
  */
object Similarity {

  /** Cosine similarity of two array<float> columns — codegen primitive
    * loop per pair (bit-identical to the previous fold form: sequential
    * double accumulation over dims). */
  def cosine(a: Column, b: Column): Column = GraftColumns.cosineSim(a, b)

  /** Brute-force top-k: for each query vector (small set, broadcast),
    * rank all corpus vectors by cosine. Deterministic tie-break on id.
    *
    * Scale shape: the query set is collected + broadcast as primitive
    * arrays; each corpus partition scores its rows locally (tight double
    * loop, no boxing, no N x Q row materialization) and emits only its
    * per-partition top-k per query; the final exact top-k reduces
    * (partitions x Q x k) tiny rows — same plan a 1000-executor cluster
    * wants. Dot products accumulate sequentially over dims in double, so
    * results are bit-identical to the naive column-expression form. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val qIds = qRows.map(_._1)
    val qVecs = qRows.map { case (_, v) => v.map(_.toDouble) }
    val qNorms = qVecs.map(v => math.sqrt(v.map(x => x * x).sum))
    val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms))

    val partialTopK = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val (ids, vecs, norms) = bc.value
        // per-query bounded heaps: (sim asc, neighbor desc) at head = worst
        val ord = Ordering.by[(Double, Long), (Double, Long)] { case (s, n) => (-s, n) }
        val heaps = Array.fill(ids.length)(mutable.PriorityQueue.empty[(Double, Long)](ord))
        rows.foreach { case (cid, cvecF) =>
          val cvec = new Array[Double](cvecF.length)
          var d = 0
          while (d < cvecF.length) { cvec(d) = cvecF(d).toDouble; d += 1 }
          var cn = 0.0
          d = 0
          while (d < cvec.length) { cn += cvec(d) * cvec(d); d += 1 }
          val cnorm = math.sqrt(cn)
          var qi = 0
          while (qi < ids.length) {
            if (ids(qi) != cid) {
              val qv = vecs(qi)
              var dot = 0.0
              d = 0
              while (d < qv.length) { dot += qv(d) * cvec(d); d += 1 }
              val sim = dot / (norms(qi) * cnorm)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((sim, cid))
              else {
                val (ws, wn) = h.head // worst kept
                if (sim > ws || (sim == ws && cid < wn)) { h.dequeue(); h.enqueue((sim, cid)) }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (sim, nid) => (ids(qi), nid, sim) }
        }
      }
      .toDF("query_id", "neighbor_id", "sim")

    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    partialTopK
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** Sign-random-projection bucket id (nPlanes-bit signature) — codegen
    * kernel, one primitive pass over dims for all planes. `dimCount` is
    * retained for source compatibility; the kernel reads the array length. */
  def srpBucket(dimCount: Int, nPlanes: Int = 12, seed: Long = 42L)(vec: Column): Column =
    GraftColumns.srpBand(vec, planeOffset = 0, nPlanes = nPlanes, seed = seed)

  /** Embedding-cosine near-duplicate pairs — the corpus-scale shape:
    * banded SRP-LSH (bands × planesPerBand sign signatures; a pair is a
    * candidate if it collides in ANY band — recall strictly dominates a
    * single table with the same planesPerBand) with the same hot-bucket
    * suppression as [[Dedup.lshCandidatePairs]]: each (band, sig) bucket
    * materializes its (bounded) member list once and expands pairs
    * in-row, so a degenerate bucket can never go quadratic. Candidates
    * are deduped across bands BEFORE scoring; exact cosine (codegen
    * kernel) verifies >= threshold.
    *
    * Expected bucket size ~ N * bands / 2^planesPerBand; choose
    * planesPerBand so that stays under maxBucket at the target corpus
    * size, and maxBucket caps the damage when the data is adversarial.
    * The cap's drop is observable like [[Dedup.simhashPairs]]: pass an
    * Observation as `suppressed` and read `suppressed_buckets` /
    * `suppressed_rows` after the first action. Same AQE caveat as there:
    * an entirely-empty result drops the metrics node (empty map — never
    * false zeros); exclude AQEPropagateEmptyRelation for delivery in
    * that edge. */
  def embeddingNearDups(vectors: DataFrame, dimCount: Int, threshold: Double = 0.95,
      nPlanes: Int = 8, bands: Int = 4, maxBucket: Int = 4096, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      suppressed: Option[org.apache.spark.sql.Observation] = None,
      hotKeyPrefilter: Boolean = false): DataFrame = {
    // one row per (vector, band): band b uses planes [b*nPlanes, (b+1)*nPlanes)
    val sigs = vectors.select(col(idCol).as("id"), posexplode(array(
      (0 until bands).map(b => GraftColumns.srpBand(col(vecCol), b * nPlanes, nPlanes, seed)): _*
    )).as(Seq("band", "sig")))
    // capped bucket expansion (ids only — vectors join back for scoring);
    // count-first shared shape: Dedup.cappedBuckets (buffers bounded by
    // maxBucket, suppression metrics ride the count aggregation)
    val buckets = Dedup.cappedBuckets(sigs, Seq("band", "sig"),
      col("id"), maxBucket, suppressed, hotKeyPrefilter)
    val candidates = buckets
      // pair_explode: direct (i, j>i) pair rows — the old posexplode +
      // explode(slice) shape duplicated the members array per exploded
      // row, O(m^2) array elements per bucket (EmbedProbe: 10-18 s of a
      // 50 M-pair corpus's expansion stage)
      .select(graft.functions.GraftColumns.pairExplode(col("members"))
        .as(Seq("id_a", "id_b")))
      // duplicate ids would otherwise self-pair at cosine 1.0
      .where(col("id_a") < col("id_b"))
    val deduped = Dedup.sortedDistinct(candidates) // dedup across bands before any pairwise scoring
    val vecs = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
    deduped
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Persisted IVF coarse quantizer — the production lifecycle at corpus
    * scale is fit ONCE on a bounded sample, save, then reuse across many
    * query batches over a cell-assigned corpus that is itself a persisted
    * artifact (assignment is incremental: new corpus partitions are
    * assigned as they arrive, never re-assigning the world). The fused
    * [[ivfTopK]] remains as the one-shot convenience and is literally
    * `query(assign(corpus, fit(corpus)), …)` — AnnSpec pins the
    * equivalence and the save/load round-trip. */
  final case class IvfModel(centroids: Array[Array[Double]]) {
    def nLists: Int = centroids.length

    /** Durable centroids: one (cell, centroid) row each — trivially tiny
      * (nLists x dim doubles), readable by anything that reads parquet. */
    def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
      import spark.implicits._
      centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("cell", "centroid")
        .repartition(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    }
  }

  object IvfModel {
    /** Train the coarse quantizer on a bounded seeded sample (the
      * quantizer needs cluster geometry, not the full corpus — at 10^12
      * rows it sees ~maxTrain vectors). Random init (seeded): k-means||
      * costs ~k extra passes over the training sample for marginal
      * quantizer quality at nLists << sample size (recall gates in
      * AnnSpec hold either way). */
    def fit(corpus: DataFrame, nLists: Int = 16, maxTrain: Int = 100000,
        idCol: String = "vec_id", vecCol: String = "embedding"): IvfModel = {
      import org.apache.spark.ml.linalg.Vectors
      import org.apache.spark.ml.clustering.KMeans
      val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
      val n = corpus.count()
      val fraction = math.min(1.0, maxTrain.toDouble / math.max(n, 1L))
      val trainRows =
        if (fraction >= 1.0) corpus else corpus.sample(withReplacement = false, fraction, 42L)
      val train = trainRows.select(col(idCol).as("id"), toVec(col(vecCol)).as("features"))
      val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10)
        .setInitMode("random").fit(train)
      IvfModel(model.clusterCenters.map(_.toArray))
    }

    def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfModel = {
      import spark.implicits._
      val rows = spark.read.parquet(path)
        .select(col("cell").cast("int"), col("centroid"))
        .as[(Int, Array[Double])].collect().sortBy(_._1)
      require(rows.nonEmpty, s"no centroids at $path")
      require(rows.map(_._1).toSeq == (0 until rows.length),
        s"centroid cells at $path are not dense 0..${rows.length - 1}")
      IvfModel(rows.map(_._2))
    }
  }

  /** Cell-assign a corpus against a fixed quantizer — the CORPUS-SIZED
    * stage: primitive double loops in mapPartitions (no interpreted UDF
    * in the hot path); sequential strict-< scan keeps the lowest index on
    * distance ties, matching the query side's (distance, index) sort.
    * Output (neighbor_id, cvec, cell) is the persistable artifact: write
    * it partitioned by cell and future query batches prune to their
    * probed cells; appending a new corpus slice assigns ONLY that slice.
    * Ids must be NUMERIC (cast to long) — bruteForceTopK's contract. */
  def ivfAssign(corpus: DataFrame, model: IvfModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcCentroids = spark.sparkContext.broadcast(model.centroids)
    corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cents = bcCentroids.value
        it.map { case (id, v) =>
          var bestI = 0
          var bestD = Double.MaxValue
          var i = 0
          while (i < cents.length) {
            val c = cents(i)
            var d = 0.0
            var j = 0
            while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; bestI = i }
            i += 1
          }
          (id, v, bestI)
        }
      }.toDF("neighbor_id", "cvec", "cell")
  }

  /** Query a cell-assigned corpus (the [[ivfAssign]] schema, fresh or
    * reloaded from its persisted form): each query scores only its
    * nProbe nearest cells. The query side stays a UDF — |Q| rows by
    * contract. Returns the bruteForceTopK schema; recall depends on
    * nProbe (benchmarked, not oracle-gated). */
  def ivfQuery(assigned: DataFrame, model: IvfModel, queries: DataFrame, k: Int = 5,
      nProbe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = assigned.sparkSession
    val bcCentroids = spark.sparkContext.broadcast(model.centroids)
    val nearestCells = udf((a: Seq[Float]) => {
      val v = a.map(_.toDouble).toArray
      bcCentroids.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(x => (x._1, x._2)).take(nProbe).map(_._2)
    })
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      explode(nearestCells(col(vecCol))).as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.select(col("query_id"), col("neighbor_id"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** One-shot IVF ANN: fit + assign + query fused. Correct per call, but
    * the WRONG lifecycle for repeated use at scale — refitting the
    * quantizer and re-assigning the corpus per query batch is exactly
    * what the split [[IvfModel.fit]]/[[ivfAssign]]/[[ivfQuery]] path
    * exists to avoid. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, nLists: Int = 16,
      nProbe: Int = 4, maxTrain: Int = 100000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val model = IvfModel.fit(corpus, nLists, maxTrain, idCol, vecCol)
    ivfQuery(ivfAssign(corpus, model, idCol, vecCol), model, queries, k, nProbe, idCol, vecCol)
  }

  /** All XOR masks within hamming distance <= depth of 0 over nPlanes
    * bits, ascending by popcount — the multiprobe ball. Driver-side and
    * tiny (sum of C(nPlanes, i), e.g. 211 at 20 planes / depth 2). */
  def probeMasks(nPlanes: Int, depth: Int): Seq[Long] =
    (0 to depth).flatMap(d =>
      (0 until nPlanes).combinations(d).map(_.foldLeft(0L)((m, b) => m | (1L << b))))

  /** LSH-bucketed ANN: query joins only the buckets within hamming
    * distance <= probeDepth of its own SRP signature. Approximate:
    * recall benchmarked vs brute force (AnnSpec recall/cost curve).
    *
    * Bucket-occupancy math (how to size nPlanes/probeDepth at corpus
    * scale): uniform expected bucket size is N / 2^nPlanes, and a query
    * scores ~ probes * N / 2^nPlanes candidates where probes =
    * sum_{i<=probeDepth} C(nPlanes, i). At N = 10^9 the default single
    * table at 12 planes holds ~244k vectors per bucket — 3.2M scored per
    * query at depth 1, which is brute force in disguise. The scale
    * setting raises planes and compensates recall with a deeper probe
    * ball: 20 planes / depth 2 -> 211 probes * ~954/bucket ~ 201k
    * (0.02% of the corpus), 24 planes / depth 2 -> 301 * ~60 ~ 18k.
    * Recall at equal scan budget is higher with more planes + deeper
    * probes than with fewer planes (AnnSpec pins the monotonicity on the
    * test embeddings). Unlike the pair-join ops, a skewed bucket here is
    * NOT quadratic — the broadcast join's output is bounded by corpus
    * rows x probes-per-bucket, linear in N — so no maxBucket is needed;
    * skew only inflates one query's scan cost. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dimCount: Int, k: Int = 5,
      nPlanes: Int = 12, probeDepth: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = srpBucket(dimCount, nPlanes)(col(vecCol))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), bucket.as("bucket"))
    // multiprobe: query probes every bucket in its hamming ball
    val probes = array(probeMasks(nPlanes, probeDepth).map(lit): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"), bucket.as("qb"))
      .withColumn("bucket", explode(transform(probes, f => col("qb").bitwiseXOR(f))))
      .drop("qb")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .select(col("query_id"), col("neighbor_id"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
