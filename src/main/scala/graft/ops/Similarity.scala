package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k with a BROADCAST of the (small)
  * query set — map-side only, no shuffle except the final per-query top-k
  * aggregation. Scale path: random-hyperplane LSH buckets so the pair
  * space shrinks from N×Q to bucket-local joins; both return identical
  * top-k for the verified configurations (LSH is recall<1 by design and
  * is benchmarked, not oracle-gated).
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns (zip_with +
    * aggregate — codegen'd higher-order functions, computed in double). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

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

  /** Deterministic random hyperplanes (seeded, no Math.random): plane p,
    * dim d -> pseudo-gaussian-ish weight via a hash mix. */
  private def planeWeight(plane: Int, dim: Int, seed: Long): Double = {
    var z = seed ^ (plane.toLong * 0x9e3779b97f4a7c15L) ^ (dim.toLong * 0xbf58476d1ce4e5b9L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Sign-random-projection bucket id (nPlanes-bit signature). */
  def srpBucket(dimCount: Int, nPlanes: Int = 12, seed: Long = 42L)(vec: Column): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(zip_with(vec,
        array((0 until dimCount).map(d => lit(planeWeight(p, d, seed))): _*),
        (x, w) => x.cast("double") * w), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate pairs: SRP-LSH buckets propose
    * candidates (vectors agreeing on all nPlanes signs), exact cosine
    * verifies >= threshold. The candidate join is bucket-local — at
    * corpus scale the pair space is |bucket|^2, not N^2. */
  def embeddingNearDups(vectors: DataFrame, dimCount: Int, threshold: Double = 0.95,
      nPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucket = srpBucket(dimCount, nPlanes)(col(vecCol))
    // norms computed once per ROW (not per pair): only the dot product is
    // pairwise work inside the bucket join
    val norm = sqrt(aggregate(col(vecCol), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val b = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
      bucket.as("bucket"), norm.as("nrm"))
    val l = b.as("a"); val r = b.as("b")
    val dot = aggregate(zip_with(col("a.vec"), col("b.vec"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    l.join(r, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", dot / (col("a.nrm") * col("b.nrm")))
      .where(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** IVF (inverted-file) ANN — the classic scale path: a coarse k-means
    * quantizer (MLlib, fixed seed) partitions the corpus into nLists
    * cells; a query scores only its nProbe nearest cells. Returns the
    * same schema as bruteForceTopK; recall depends on nProbe (benchmarked,
    * not oracle-gated). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, nLists: Int = 16,
      nProbe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._

    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val train = corpus.select(col(idCol).as("id"), toVec(col(vecCol)).as("features"))
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10).fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    def nearestCells(n: Int) = udf((a: Seq[Float]) => {
      val v = a.map(_.toDouble).toArray
      bcCentroids.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(x => (x._1, x._2)).take(n).map(_._2)
    })

    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      nearestCells(1)(col(vecCol))(0).as("cell"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      explode(nearestCells(nProbe)(col(vecCol))).as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.select(col("query_id"), col("neighbor_id"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** LSH-bucketed ANN: query joins only its bucket (+ optional multiprobe
    * by flipping one bit). Approximate: recall benchmarked vs brute force. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dimCount: Int, k: Int = 5,
      nPlanes: Int = 12, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = srpBucket(dimCount, nPlanes)(col(vecCol))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), bucket.as("bucket"))
    // multiprobe: query probes its bucket and the nPlanes 1-bit-flip buckets
    val probes = array((lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))): _*)
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
