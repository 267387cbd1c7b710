package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pinned corpus-digests for every rows-only `x_*` gate at the driver's
  * oracle tier (sf0.01): the driver's CORRECTNESS check records row
  * counts for these (no DuckDB oracle by design), so a silent VALUE
  * drift inside a constant row count would pass it — this spec closes
  * that window. [[Digest.corpusSha]] is column-order- and
  * row-order-independent, and the values were verified identical across
  * cpus=4 and cpus=32 sessions before pinning (includes the KMeans-fit
  * x_ann_ivf — deterministic under seed 42 on this input).
  *
  * Re-pinning (ONLY after an intentional semantic change, with the
  * golden/oracle suites green): run `graft.Verify /root/testdata/sf0.01
  * out` and copy the new entry from out/digests.json.
  */
class XDigestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("graft-xdigest")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val SfDir = "/root/testdata/sf0.01"

  private val Golden: Map[String, (Long, String)] = Map(
    "x_ann_ivf" -> ((50L, "4dc7dcee5bfd8dd49574ff401f7fb47027260c30c5651fd88b71ffdb6de65666")),
    "x_ann_lsh" -> ((50L, "c33dbe58a4f42ebbcb6b7d9a82d42182febd2cf64fc298d7b26c1c891d3c5c26")),
    "x_book_md" -> ((200L, "3811dd6e70a8240b3c4f572be202c65d310138f667423c880b22cbeb48b10818")),
    "x_book_xml" -> ((200L, "54c1d9780e37bded1501f519fdd7599c3901e663ecec636709f547fd2e90b801")),
    "x_embed_neardup" -> ((442L, "dc173416e39f4c1a0c6b7b4b4e64dafcfd436baa2000f2af6a9b00e0fff255d6")),
    "x_ensemble_vote" -> ((500L, "a04972f38184e77c34a2510b708b802b7439c4d1afa4e8e0049c9cd98da571b5")),
    "x_extract_docs" -> ((200L, "f2b7a1ec5a104b0e57363fbfed9fe163fdb611100169176be086d996ead2b855")),
    "x_extract_relational" -> ((31431L, "d96877dfe8ad80ff83053543b92e8e2ac7d3424f4150d36fbd7e67c764f45921")),
    "x_extract_spans" -> ((31431L, "d96877dfe8ad80ff83053543b92e8e2ac7d3424f4150d36fbd7e67c764f45921")),
    "x_grouped_spans" -> ((749L, "3b4beab1dc38b98320035712492534120030b1fdb8fcc0c6f5558e595950722c")),
    "x_grouped_xml" -> ((200L, "65b52dc6851d0a6468977cbac8eb591a7b46ad33804df34d951e89063a87dc3b")),
    "x_media_meta" -> ((1315L, "ca85872f2352bab468f8d020713d04beb286776ea3e9d53497dafe5075542548")),
    "x_norm_rules" -> ((118L, "cd908fe8049d35296225cfe57f668aeb9caea29d6d3c28c747ef4080ca41bfc8")),
    "x_phash_dedup" -> ((500L, "540f06dae6f5d0e2bc4bd081b8329e832da7ab2fa54b817457b463b7d1de470d")),
    "x_reading_order" -> ((500L, "40f19a6a27148c752cb1c2bc7e9e9c533adfda0d111fa39d22d534c14a74fa91")),
    "x_rover_vote" -> ((500L, "b9686f9dba8a7a614e64655b964686e30399c63eebecd004371405772e0a9653")),
    "x_simhash_pairs" -> ((2483L, "7e21aa2cd6e1b2b3bace2e8e98a735eeecc6e55b2483ef44457dfa1f03900fe7")),
    "x_stream_neardup" -> ((849L, "2a6f170b79d549498ae21fd8f54fb91e2944e819b1003d607086b2b484c1dbf4")),
    "x_toc_match" -> ((554L, "3675f68a8ee0f3351e97443f5814dfcb8e032782504f27a812127d8dabac9b44"))
  )

  test("every x_ query has a pinned digest (a new gate must pin one)") {
    val xNames = SparkEntry.queries.keySet.filter(_.startsWith("x_"))
    assert(xNames == Golden.keySet,
      s"unpinned: ${(xNames -- Golden.keySet).toSeq.sorted}; " +
        s"stale: ${(Golden.keySet -- xNames).toSeq.sorted}")
  }

  Golden.toSeq.sortBy(_._1).foreach { case (name, (rows, sha)) =>
    test(s"$name digest at sf0.01") {
      val (gotRows, gotSha) = Digest.corpusSha(SparkEntry.queries(name)(spark, SfDir))
      assert(gotRows == rows, s"$name rows $gotRows != pinned $rows")
      assert(gotSha == sha, s"$name sha $gotSha != pinned $sha " +
        "(value drift inside a constant row count, or an intentional " +
        "semantic change — re-pin from Verify digests.json only in the " +
        "latter case)")
    }
  }
}
