package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pinned corpus-digests for every rows-only `x_*` gate at the driver's
  * oracle tier (sf0.01): the driver's CORRECTNESS check records row
  * counts for these (no DuckDB oracle by design), so a silent VALUE
  * drift inside a constant row count would pass it — this spec closes
  * that window. [[Digest.corpusSha]] is column-order- and
  * row-order-independent but query-name- and column-NAME-sensitive
  * (digest v3: the label + sorted schema are in the hash preamble, so
  * value-identical outputs of different queries no longer share a
  * digest), and the values were verified identical across
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
    "x_ann_ivf" -> ((50L, "3c7ca42d3c09908918dcfeed106d86030025b5fad4a1341d9af26067a5093a27")),
    "x_ann_lsh" -> ((50L, "4b93da46ee3fccdf0f1f50f075ceb7407155b983eba7293ebdd5316f010fff71")),
    "x_book_md" -> ((200L, "aa78e13f2b6d027693c02d2c3813e80e81b1b79d389dc8de4a1c3ead74ab1c10")),
    "x_book_xml" -> ((200L, "7e8145435868d8d8cfc4a043f0a6909c1b3e1634342488558b7d51a3dfd2dc9b")),
    "x_embed_neardup" -> ((442L, "b063f86f60a8461b4c4e31ca066136c158a8e1b179baa489a3e50c8fcd305564")),
    "x_ensemble_vote" -> ((500L, "0e6cf74f4eecc48c5ba90fae65c5d90c725942c0fcb32e495e59f20d9e24985a")),
    "x_extract_docs" -> ((200L, "b93660b57507dbc0ba2331a3791137a67f68a1ea06c7ccaa97347f075f208c31")),
    "x_extract_relational" -> ((31431L, "07a99ecb0e5fb630ecd6901aab55da27a0ea709c62cf77e302cca9001eaebcdc")),
    "x_extract_spans" -> ((31431L, "10bc6b5a7df5b8e5976242d10d214dc6f8c2780d77bcbdd24c6cdcda91dfc9f7")),
    "x_grouped_spans" -> ((749L, "e12a3c981c81b784c79ca569433bfffade99b658c73604d590505a6e9e960893")),
    "x_grouped_xml" -> ((200L, "366fa65c0e3a07a12818db18f34417c0d85a6a94f2ad1acd69f98603cbc084bd")),
    "x_media_meta" -> ((1315L, "849dadb72ff4abdd9cb255f9bc18fbe0b1aeb5450385de99a08d5b0b0f19e9c4")),
    "x_norm_rules" -> ((118L, "6d51fe9cbebf101addd5327e1f0467ea43d30d109ee68d764730702109a60d92")),
    "x_phash_dedup" -> ((500L, "cd6c4c8b58a051635f052561ddf02e5a3bece6fd6bec7c330bbe190abdc90993")),
    "x_reading_order" -> ((500L, "869799828fa75aa5101b7f9464e28ba7153bd3b31c18a5265b9a7de7a6e7b37d")),
    "x_rover_vote" -> ((500L, "6f7f4a424ea0ba05acf6e873d2b26393c2a0c108c2550552f822eed3de5d50d6")),
    "x_simhash_pairs" -> ((2483L, "b41d66ec1ff5817155d68c827f29ecd4666db2ab91014ebf9eb7ccfcbe0503d0")),
    "x_stream_neardup" -> ((849L, "cc3b17b0cfd6d81ea954343dedb37f8e7cddeaaa7f892939935b8698b91a021b")),
    "x_toc_match" -> ((554L, "ef3255cf18a325fa61e885a0f74dbd5eeae0e2422f55b0384ffcea4707fd408d"))
  )

  test("every x_ query has a pinned digest (a new gate must pin one)") {
    val xNames = SparkEntry.queries.keySet.filter(_.startsWith("x_"))
    assert(xNames == Golden.keySet,
      s"unpinned: ${(xNames -- Golden.keySet).toSeq.sorted}; " +
        s"stale: ${(Golden.keySet -- xNames).toSeq.sorted}")
  }

  Golden.toSeq.sortBy(_._1).foreach { case (name, (rows, sha)) =>
    test(s"$name digest at sf0.01") {
      val (gotRows, gotSha) = Digest.corpusSha(SparkEntry.queries(name)(spark, SfDir), name)
      assert(gotRows == rows, s"$name rows $gotRows != pinned $rows")
      assert(gotSha == sha, s"$name sha $gotSha != pinned $sha " +
        "(value drift inside a constant row count, or an intentional " +
        "semantic change — re-pin from Verify digests.json only in the " +
        "latter case)")
    }
  }
}
