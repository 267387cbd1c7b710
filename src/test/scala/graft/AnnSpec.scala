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

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val dups = Similarity.embeddingNearDups(emb, dimCount = 64, threshold = 0.8, nPlanes = 4)
      .collect()
    dups.foreach { r =>
      assert(r.getAs[Double]("sim") >= 0.8)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }
}
