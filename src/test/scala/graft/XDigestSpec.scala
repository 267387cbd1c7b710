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
    "x_ann_ivf" -> ((50L, "1803ca9e1afa056dab4daa3b19270e0ddc52ce8b1b1aae9307e2f31cf795614a")),
    "x_ann_lsh" -> ((50L, "2be30ef77801c72b8cf872e87423067bb9a48fcb2bac29ac532d3ba5dec5edda")),
    "x_book_md" -> ((200L, "14d6232084ff9f9a32b028f242b31d90565183cbdf15632f2484db51adb0f569")),
    "x_book_xml" -> ((200L, "5bd1ada453cd25dbb7ad957f387f03ab3348536b6291aaea27cc382b8c4cfa44")),
    "x_embed_neardup" -> ((442L, "229e06ffd40c5636de103bdb55a57c1467aed8c64308366b415c2f0d5fd6bea7")),
    "x_ensemble_vote" -> ((500L, "ec1366294834204db15dbba08ef6e36b864bbb1d12c9e4759dcf29f879c2fd97")),
    "x_extract_docs" -> ((200L, "bc33c73393e6dce9b08065aef7fec67d9fd44d4afac64b6d5f34a865a6b74220")),
    "x_extract_relational" -> ((31431L, "0665579e5b76dd703dffdb29f6490a04f47ebc709362b1583fc0d37f49c0754b")),
    "x_extract_spans" -> ((31431L, "0665579e5b76dd703dffdb29f6490a04f47ebc709362b1583fc0d37f49c0754b")),
    "x_grouped_spans" -> ((749L, "b998ef59244a78d0478dccc43d8651e3cdc9262ea7d8550060cba1275aff7c7d")),
    "x_grouped_xml" -> ((200L, "1ff7d9d82c105d86cc892604f47a8e586302f745a27af062720af60e96804814")),
    "x_media_meta" -> ((1315L, "7bdd5583e23d0ecb9f488462f442769e41055621864e6fa37695b3312923edb6")),
    "x_norm_rules" -> ((118L, "b72b68c94593c8e7d9010550e2ff840a53b486cc86a462848dd78fff1cda23df")),
    "x_phash_dedup" -> ((500L, "66a704d8df045fccf455a2116faf0f6b5d23a3deb1b3c314794b2c6337e02ce7")),
    "x_reading_order" -> ((500L, "b16b625415801ca445abc65c709db42816bb00fbafda2d241a01ded4283b3748")),
    "x_rover_vote" -> ((500L, "dbbac2b06714f195545bb3e6b33459639cbfb821b0ab56990104b412698be3fe")),
    "x_simhash_pairs" -> ((2483L, "bdc1d10aede0573496d8828fd51e2f1fbf6a48ee700fba65a9d1c740b9de8baa")),
    "x_stream_neardup" -> ((849L, "56be73fc76cfaddcb9037930ef2f06ccc3ade58808b2e1930e7291337c7f7434")),
    "x_toc_match" -> ((554L, "9c41531317d34c7c3b83120471900f47eeb9b98285f50a9861bb0facefb6d78e"))
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
