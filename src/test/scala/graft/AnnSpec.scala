package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Similarity

/** Similarity-search invariants: brute force is the exact baseline; the
  * LSH and IVF scale paths must return subsets of plausible neighbors
  * with reasonable recall on the test embeddings. */
class AnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("graft-ann")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k: k rows per query, ranks dense, sims sorted") {
    val queries = emb.where(col("vec_id") < 10)
    val res = Similarity.bruteForceTopK(emb, queries, k = 5).cache()
    assert(res.count() == 50)
    val perQuery = res.groupBy("query_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi")).collect()
    perQuery.foreach { r =>
      assert(r.getAs[Long]("n") == 5 && r.getAs[Int]("lo") == 1 && r.getAs[Int]("hi") == 5)
    }
    // rank order consistent with sim order
    val rows = res.orderBy("query_id", "rank").collect()
    rows.grouped(5).foreach { g =>
      val sims = g.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    res.unpersist()
  }

  test("IVF recall@5 vs brute force >= 0.5 with nProbe=4/16 lists") {
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall")
    // IVF sims must be true cosines: every returned pair's sim matches brute when shared
  }

  test("IVF lifecycle split: fit-once/assign-once/query-many == fused call") {
    val queries = emb.where(col("vec_id") < 10)
    val fused = Similarity.ivfTopK(emb, queries, k = 5).collect().toSet
    // the production path: one fit, one assignment, N query batches
    val model = Similarity.IvfModel.fit(emb)
    val assigned = Similarity.ivfAssign(emb, model).cache()
    try {
      val split = Similarity.ivfQuery(assigned, model, queries, k = 5).collect().toSet
      assert(split == fused)
      // query-many: a second, different batch against the SAME artifacts
      val queries2 = emb.where(col("vec_id") >= 10 && col("vec_id") < 15)
      val batch2 = Similarity.ivfQuery(assigned, model, queries2, k = 5)
      assert(batch2.select("query_id").distinct().count() == 5)
    } finally assigned.unpersist()
  }

  test("IVF model save/load round-trip; persisted cell-assigned corpus queries equal") {
    val queries = emb.where(col("vec_id") < 10)
    val model = Similarity.IvfModel.fit(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    model.save(spark, s"$dir/centroids")
    val reloaded = Similarity.IvfModel.load(spark, s"$dir/centroids")
    assert(reloaded.nLists == model.nLists)
    assert(reloaded.centroids.map(_.toVector).toVector ==
      model.centroids.map(_.toVector).toVector)
    // the assigned corpus is itself a durable artifact: write partitioned
    // by cell (future query batches prune to probed cells), read back,
    // query with the RELOADED model — identical results
    Similarity.ivfAssign(emb, model)
      .write.partitionBy("cell").parquet(s"$dir/assigned")
    val reread = spark.read.parquet(s"$dir/assigned")
      .select(org.apache.spark.sql.functions.col("neighbor_id"),
        org.apache.spark.sql.functions.col("cvec"),
        org.apache.spark.sql.functions.col("cell").cast("int").as("cell"))
    val fromDisk = Similarity.ivfQuery(reread, reloaded, queries, k = 5).collect().toSet
    val direct = Similarity.ivfTopK(emb, queries, k = 5).collect().toSet
    assert(fromDisk == direct)
  }

  test("ivfQuery over the persisted cell-partitioned corpus PRUNES cells (DPP in the plan)") {
    // the pruning claim behind the persisted-assignment lifecycle
    // (Similarity.scala scaladoc): the probe join is on the PARTITION
    // column, the probe side is broadcast, so dynamic partition pruning
    // restricts the scan to probed cells — assert it is in the executed
    // plan, not just asserted in prose
    val queries = emb.where(col("vec_id") < 10)
    val model = Similarity.IvfModel.fit(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_dpp").toString + "/assigned"
    Similarity.ivfAssign(emb, model).write.partitionBy("cell").parquet(dir)
    val reread = spark.read.parquet(dir)
    val q = Similarity.ivfQuery(reread, model, queries, k = 5)
    q.collect() // materialize so AQE finalizes the physical plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on cell in:\n$plan")
  }

  test("IVF quantizer trained on a forced 20% sample keeps recall@5 >= 0.4") {
    // the 100-TB path: KMeans sees ~maxTrain vectors, never the corpus
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = Similarity.ivfTopK(emb, queries, k = 5, maxTrain = 100)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect sampled).size.toDouble / brute.size
    assert(recall >= 0.4, s"sampled-quantizer IVF recall $recall")
  }

  test("SRP-LSH recall@5 vs brute force >= 0.4 with multiprobe at 6 planes") {
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, dimCount = 64, k = 5, nPlanes = 6)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"LSH recall $recall")
    // shared pairs carry identical rounded sims (scoring is true cosine)
    val bSims = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    Similarity.lshTopK(emb, queries, dimCount = 64, k = 5, nPlanes = 6)
      .collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(2))
        bSims.get(key).foreach(b => assert(b == r.getDouble(3), s"sim mismatch $key"))
      }
  }

  test("LSH probe-ball sizes match the documented occupancy math") {
    // probes = sum_{i<=depth} C(nPlanes, i) — the scaling knob the
    // lshTopK scaladoc sizes against 10^9 vectors
    assert(Similarity.probeMasks(12, 1).size == 13)   // 1 + 12
    assert(Similarity.probeMasks(20, 2).size == 211)  // 1 + 20 + 190
    assert(Similarity.probeMasks(24, 2).size == 301)  // 1 + 24 + 276
    assert(Similarity.probeMasks(6, 0) == Seq(0L))    // exact bucket only
    // masks are distinct and within the ball
    val ms = Similarity.probeMasks(10, 2)
    assert(ms.distinct.size == ms.size)
    assert(ms.forall(m => java.lang.Long.bitCount(m) <= 2))
  }

  test("LSH recall/cost curve: deeper probes raise recall, more planes cut cost") {
    val ss = spark; import ss.implicits._
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()

    def run(planes: Int, depth: Int): (Double, Long) = {
      val got = Similarity.lshTopK(emb, queries, dimCount = 64, k = 5,
        nPlanes = planes, probeDepth = depth)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute intersect got).size.toDouble / brute.size
      // cost = candidates scanned = sum of probed buckets' occupancies
      val sig = Similarity.srpBucket(64, planes)(col("embedding"))
      val occ = emb.select(sig.as("b")).groupBy("b").count()
        .as[(Long, Long)].collect().toMap
      val qSigs = queries.select(sig.as("b")).as[Long].collect()
      val masks = Similarity.probeMasks(planes, depth)
      val cost = qSigs.map(qb => masks.map(m => occ.getOrElse(qb ^ m, 0L)).sum).sum
      (recall, cost)
    }

    val (r61, c61) = run(6, 1)
    val (r62, c62) = run(6, 2)
    val (r102, c102) = run(10, 2)
    // deeper ball at fixed planes: candidate set is a superset, so recall
    // is monotone non-decreasing and the scan cost grows
    assert(r62 >= r61, s"recall fell with deeper probes: $r61 -> $r62")
    assert(c62 >= c61)
    // more planes at fixed depth: finer buckets -> smaller scan cost
    assert(c102 < c62, s"10 planes should scan fewer candidates: $c102 vs $c62")
    // the uniform model N/2^planes bounds the occupied-bucket mean from
    // below (occupied <= 2^planes buckets exist)
    val occupied = emb.select(Similarity.srpBucket(64, 6)(col("embedding")).as("b"))
      .distinct().count()
    assert(n.toDouble / occupied >= n.toDouble / (1L << 6))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val dups = Similarity.embeddingNearDups(emb, dimCount = 64, threshold = 0.8, nPlanes = 4)
      .collect()
    dups.foreach { r =>
      assert(r.getAs[Double]("sim") >= 0.8)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("banded near-dup recall dominates a single SRP table (any-band collide)") {
    def pairs(bands: Int) =
      Similarity.embeddingNearDups(emb, dimCount = 64, threshold = 0.3,
        nPlanes = 4, bands = bands)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(1) // band 0 = the planes of the old single-table config
    val banded = pairs(4)
    assert(single.subsetOf(banded), s"banded lost ${(single -- banded).size} pairs")
    assert(banded.size >= single.size)
  }

  test("near-dup sims are true cosines (match brute-force scoring)") {
    val ss = spark; import ss.implicits._
    val dups = Similarity.embeddingNearDups(emb, dimCount = 64, threshold = 0.3, nPlanes = 4)
      .collect()
    assert(dups.nonEmpty)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    dups.foreach { r =>
      val a = vecs(r.getAs[Long]("id_a")).map(_.toDouble)
      val b = vecs(r.getAs[Long]("id_b")).map(_.toDouble)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val expect = math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000) / 10000
      assert(math.abs(r.getAs[Double]("sim") - expect) < 1e-9)
    }
  }

  test("hot-bucket cap suppresses degenerate buckets instead of going quadratic") {
    val ss = spark; import ss.implicits._
    // 30 identical vectors -> one bucket of 30 in every band; cap at 10
    val same = (0L until 30L).map(i => (i, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    // empty result -> metrics ride only with AQE empty-propagation
    // excluded (see Dedup.simhashPairs scaladoc: documented AQE caveat)
    val ruleKey = "spark.sql.adaptive.optimizer.excludedRules"
    spark.conf.set(ruleKey,
      "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation")
    try {
      val obs = org.apache.spark.sql.Observation("neardup_suppressed")
      val capped = Similarity.embeddingNearDups(same, dimCount = 8, threshold = 0.9,
        nPlanes = 4, bands = 2, maxBucket = 10, suppressed = Some(obs))
      assert(capped.count() == 0) // bucket over cap -> no pairs proposed
      // the drop is not silent: both bands' degenerate buckets are reported
      assert(obs.get("suppressed_buckets").asInstanceOf[Long] == 2L)
      assert(obs.get("suppressed_rows").asInstanceOf[Long] == 60L)
    } finally spark.conf.unset(ruleKey)
    val uncapped = Similarity.embeddingNearDups(same, dimCount = 8, threshold = 0.9,
      nPlanes = 4, bands = 2, maxBucket = 4096)
    assert(uncapped.count() == 30L * 29 / 2)
  }
}
