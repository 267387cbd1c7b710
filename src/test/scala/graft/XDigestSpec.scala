package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pinned corpus-digests for every rows-only `x_*` gate at TWO tiers —
  * the driver's oracle tier (sf0.01) and sf0.1: the driver's
  * CORRECTNESS check records row counts for these (no DuckDB oracle by
  * design), so a silent VALUE drift inside a constant row count would
  * pass it — this spec closes that window. The second tier closes the
  * TIER-DEPENDENT drift window the r5 verdict flagged: a behavior that
  * only changes at larger inputs (e.g. a cap boundary crossed only at
  * bigger bucket sizes, a sampling branch taken only past a size
  * threshold) passes an sf0.01-only pin. [[Digest.corpusSha]] is
  * column-order- and row-order-independent but query-name- and
  * column-NAME-sensitive (digest v3: the label + sorted schema are in
  * the hash preamble, so value-identical outputs of different queries no
  * longer share a digest), and the values were verified identical across
  * cpus=4 and cpus=32 sessions before pinning (includes the KMeans-fit
  * x_ann_ivf — deterministic under seed 42 on this input).
  *
  * Re-pinning (ONLY after an intentional semantic change, with the
  * golden/oracle suites green): run `graft.Verify /root/testdata/sf0.01
  * out` (and .../sf0.1) and copy the new entries from out/digests.json.
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
    "x_figure_mask" -> ((500L, "a7723c772264ed6622e030071ed4530dcc426d3937e7ab04ca8c085fb90922e5")),
    "x_grouped_spans" -> ((749L, "e12a3c981c81b784c79ca569433bfffade99b658c73604d590505a6e9e960893")),
    "x_grouped_xml" -> ((200L, "366fa65c0e3a07a12818db18f34417c0d85a6a94f2ad1acd69f98603cbc084bd")),
    "x_media_meta" -> ((1315L, "849dadb72ff4abdd9cb255f9bc18fbe0b1aeb5450385de99a08d5b0b0f19e9c4")),
    "x_minhash_xx64" -> ((20948L, "e7b578b21dd7eff4b9c453c9930cadd66711b5ed24e0a65f33d6c8cd60312d40")),
    "x_norm_rules" -> ((118L, "6d51fe9cbebf101addd5327e1f0467ea43d30d109ee68d764730702109a60d92")),
    "x_phash_dedup" -> ((500L, "cd6c4c8b58a051635f052561ddf02e5a3bece6fd6bec7c330bbe190abdc90993")),
    "x_reading_order" -> ((500L, "869799828fa75aa5101b7f9464e28ba7153bd3b31c18a5265b9a7de7a6e7b37d")),
    "x_rover_vote" -> ((500L, "6f7f4a424ea0ba05acf6e873d2b26393c2a0c108c2550552f822eed3de5d50d6")),
    "x_simhash_pairs" -> ((2483L, "b41d66ec1ff5817155d68c827f29ecd4666db2ab91014ebf9eb7ccfcbe0503d0")),
    "x_stream_neardup" -> ((849L, "cc3b17b0cfd6d81ea954343dedb37f8e7cddeaaa7f892939935b8698b91a021b")),
    "x_toc_match" -> ((554L, "ef3255cf18a325fa61e885a0f74dbd5eeae0e2422f55b0384ffcea4707fd408d"))
  )

  private val GoldenSf01: Map[String, (Long, String)] = Map(
    "x_ann_ivf" -> ((50L, "57b7fb6c58ff56e548279f67f8407d8763608c9b6eb762026442759cf5dc855d")),
    "x_ann_lsh" -> ((50L, "dfa308d1e7dd3b2dbdd41d1399089e301fb1e6223ba82ca16dc3b25ea0281c3d")),
    "x_book_md" -> ((2000L, "6b9b41b97e47a7f55b14ed1976f2a5e639f28cc5c20532931094c877477beecd")),
    "x_book_xml" -> ((2000L, "3cf4bb9fc3443f7cb69418ffcf04b38b19dcb29d2d8fe70585246b4e6e2abdca")),
    "x_embed_neardup" -> ((7126L, "8e6663a4d72270d3173e13fad7b79fcb8f9f2e5a649e4b28d60c70d7bb7c9f40")),
    "x_ensemble_vote" -> ((5000L, "702a8459492304d5b90092c9941740d9036ea922fd1555cbed874b5b62ccda07")),
    "x_extract_docs" -> ((2000L, "919b87c3c9b2e4cc6a8d1fd6f79d86040d0763ea8702983fc590ec57e9e31725")),
    "x_extract_relational" -> ((358348L, "d5ac4514161eab4c9583e2623b7ea68d498e70ea076365b273eb826614860f7f")),
    "x_extract_spans" -> ((358348L, "5a4f713b50fdcfcac4c50c6cbe55ca38d901bc1a7bb546a123db2a7a615d7c69")),
    "x_figure_mask" -> ((5000L, "3d17e155301665eb29ad199a89d9dc02e22a6182792907c2b993ef2a55263329")),
    "x_grouped_spans" -> ((11529L, "c2936db19f278f800579dcc4a47c9980ed258b228eb30665a7fc98ab3b80c5c4")),
    "x_grouped_xml" -> ((2000L, "2f4a8c6f4569dc38ba578f34b191ac095266a1334ed1a36b4481a835375aa185")),
    "x_media_meta" -> ((14765L, "273669bf9554dfcbc94c7ff4beebe3aacd3420fd683df934a1793c293898bb2c")),
    "x_minhash_xx64" -> ((98053L, "949243c74b48a1221bec27fe4a4834c034cfe48a1575a7f65c3902cea4c5227d")),
    "x_norm_rules" -> ((1000L, "7cd9c5af6a75134b5ecb2f1873ad83ee873d8138ce2beb9f54e54ef4560075a8")),
    "x_phash_dedup" -> ((5000L, "77a2ff5919bd242a4080b354e10c0275e8d4a3c17507b953b2d7d8fdf7f763d3")),
    "x_reading_order" -> ((5000L, "de01404e654172668809dc76dead3083b3b39db215a89f1a111368202ebaa08d")),
    "x_rover_vote" -> ((5000L, "00c153dc866f6f57ad4c314923b66f0bf624e95ec7979f5912a81023467a1928")),
    "x_simhash_pairs" -> ((221401L, "0ffec80047f389a67552ece49df3244d1c9990b3f757a15fb6f608261fb1d14f")),
    "x_stream_neardup" -> ((32800L, "354983a4c194b555defccc634e5883cc9157f5e8dbc950ca7a06a8d6ab11653e")),
    "x_toc_match" -> ((5026L, "36b87bcd1366e6854d60da6a83579f9e56477be378859f6299249b1d21bea667"))
  )

  private val Tiers = Seq(
    ("sf0.01", "/root/testdata/sf0.01", Golden),
    ("sf0.1", "/root/testdata/sf0.1", GoldenSf01))

  test("every x_ query has a pinned digest at every tier (a new gate must pin both)") {
    val xNames = SparkEntry.queries.keySet.filter(_.startsWith("x_"))
    Tiers.foreach { case (tier, _, golden) =>
      assert(xNames == golden.keySet,
        s"$tier unpinned: ${(xNames -- golden.keySet).toSeq.sorted}; " +
          s"stale: ${(golden.keySet -- xNames).toSeq.sorted}")
    }
  }

  Tiers.foreach { case (tier, dir, golden) =>
    golden.toSeq.sortBy(_._1).foreach { case (name, (rows, sha)) =>
      test(s"$name digest at $tier") {
        val (gotRows, gotSha) = Digest.corpusSha(SparkEntry.queries(name)(spark, dir), name)
        assert(gotRows == rows, s"$name rows $gotRows != pinned $rows at $tier")
        assert(gotSha == sha, s"$name sha $gotSha != pinned $sha at $tier " +
          "(value drift inside a constant row count, or an intentional " +
          "semantic change — re-pin from Verify digests.json only in the " +
          "latter case)")
      }
    }
  }
}
