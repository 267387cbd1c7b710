package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.collection.mutable
import graft.ops.Dedup

/** Cross-document duplicate-span detection ([[Dedup.duplicateSpans]]):
  * hand cases (incl. astral code points), a naive-reference differential
  * over small-alphabet random corpora (small alphabet forces heavy
  * cross-doc AND within-doc window sharing — the adversarial regime for
  * the island merge), hash-family parity, input-partitioning
  * independence, and the two-shuffle plan shape. */
class DupSpansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("graft-dupspans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(docs: Seq[(Long, String)], k: Int,
      family: String = "md5"): Set[(Long, Long, Long, Long)] = {
    val ss = spark; import ss.implicits._
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), k, hashFamily = family)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  /** Plain-Scala reference: mark every k-window (by CODE POINTS) whose
    * text occurs in another doc, merge consecutive duplicated start
    * positions into maximal runs. */
  private def naive(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] = {
    def cps(s: String): Vector[Int] = s.codePoints().toArray.toVector
    val occ = mutable.Map.empty[Vector[Int], mutable.Set[Long]]
    for ((id, t) <- docs; w <- cps(t).sliding(k) if w.length == k)
      occ.getOrElseUpdate(w, mutable.Set.empty) += id
    docs.flatMap { case (id, t) =>
      val c = cps(t)
      val dup = (0 to c.length - k).filter(i => (occ(c.slice(i, i + k)) - id).nonEmpty)
      // group maximal runs of consecutive start positions
      dup.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        if (acc.nonEmpty && acc.last.last == p - 1) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }.map(run => (id, run.head + 1L, run.last + k.toLong, run.last - run.head + k.toLong))
    }.toSet
  }

  test("hand case: shared substring yields one maximal span per doc") {
    // docs share exactly "ABCDEFGHIJ" (10 chars); k=4 -> starts 5..11 in
    // doc 1 / 2..8 in doc 2 merge into one span of len 10 each
    val docs = Seq(1L -> "wxyzABCDEFGHIJmnop", 2L -> "qABCDEFGHIJr")
    assert(run(docs, 4) == Set((1L, 5L, 14L, 10L), (2L, 2L, 11L, 10L)))
  }

  test("hand case: positions and lengths are code points (astral-safe)") {
    // the only shared 3-cp window is 𠮷野家; 𠮷 is ONE position
    val docs = Seq(1L -> "αβγ𠮷野家XYZ", 2L -> "ppp𠮷野家qqq")
    val expected = Set((1L, 4L, 6L, 3L), (2L, 4L, 6L, 3L))
    assert(run(docs, 3) == expected)
    assert(naive(docs, 3) == expected)
  }

  test("within-doc-only repetition is NOT a cross-doc span; short docs absent") {
    val docs = Seq(
      1L -> "abcdXabcd",  // "abcd" twice, but only in doc 1
      2L -> "zzzzzzzz",   // no window shared with anyone
      3L -> "ab")         // shorter than k: no windows
    assert(run(docs, 4) == Set.empty)
  }

  test("differential vs naive reference: 30 small-alphabet random corpora") {
    val rnd = new scala.util.Random(20260817)
    (1 to 30).foreach { _ =>
      val docs = (0L until (3 + rnd.nextInt(10))).map { id =>
        id -> Vector.fill(rnd.nextInt(60))(('a' + rnd.nextInt(4)).toChar).mkString
      }
      val k = 3 + rnd.nextInt(3)
      val got = run(docs, k)
      val want = naive(docs, k)
      assert(got == want, s"k=$k docs=${docs.map(_._2)}")
    }
  }

  test("xxhash64 production family emits the same spans as md5") {
    val rnd = new scala.util.Random(42)
    val docs = (0L until 12L).map { id =>
      id -> Vector.fill(40 + rnd.nextInt(40))(('a' + rnd.nextInt(5)).toChar).mkString
    }
    assert(run(docs, 5, family = "xxhash64") == run(docs, 5, family = "md5"))
  }

  test("result is input-partitioning independent") {
    val ss = spark; import ss.implicits._
    val docs = (0L until 20L).map(id => id -> (s"common prefix text $id" * 3))
    val a = Dedup.duplicateSpans(docs.toDF("doc_id", "text").repartition(1), 6)
    val b = Dedup.duplicateSpans(docs.toDF("doc_id", "text").repartition(7), 6)
    assert(a.count() > 0)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("duplicateCoverage: interval union over overlapping spans; zero-span docs present") {
    val ss = spark; import ss.implicits._
    // doc 1: [1,10] u [8,15] merge to 15 chars, [20,25] adds 6 -> 21
    val spans = Seq((1L, 1L, 10L, 10L), (1L, 8L, 15L, 8L), (1L, 20L, 25L, 6L))
      .toDF("doc_id", "span_start", "span_end", "span_len")
    val docs = Seq(1L -> ("x" * 30), 2L -> "short").toDF("doc_id", "text")
    val got = Dedup.duplicateCoverage(docs, spans).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((1L, 30L, 21L, 0.7), (2L, 5L, 0L, 0.0)))
  }

  test("duplicateCoverage matches naive interval union on random corpora") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val docs = (0L until (3 + rnd.nextInt(8))).map { id =>
        id -> Vector.fill(rnd.nextInt(50))(('a' + rnd.nextInt(4)).toChar).mkString
      }
      val k = 3 + rnd.nextInt(3)
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.duplicateCoverage(df, Dedup.duplicateSpans(df, k))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = docs.map { case (id, t) =>
        val covered = naive(docs, k).collect { case (d, s, e, _) if d == id =>
          (s to e) }.flatten.toSet
        id -> covered.size.toLong
      }.toMap
      assert(got == want, s"k=$k docs=${docs.map(_._2)}")
    }
  }

  test("cutDuplicateSpans: hand case — shared middle removed, ends kept") {
    val ss = spark; import ss.implicits._
    // from the first hand case: doc 1 cuts [5,14], doc 2 cuts [2,11]
    val docs = Seq(1L -> "wxyzABCDEFGHIJmnop", 2L -> "qABCDEFGHIJr").toDF("doc_id", "text")
    val got = Dedup.cutDuplicateSpans(docs, Dedup.duplicateSpans(docs, 4))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(1L -> "wxyzmnop", 2L -> "qr"))
  }

  test("cutDuplicateSpans: zero-span doc keeps text verbatim; astral positions cut correctly") {
    val ss = spark; import ss.implicits._
    val docs = Seq(1L -> "αβγ𠮷野家XYZ", 2L -> "ppp𠮷野家qqq", 3L -> "untouched")
      .toDF("doc_id", "text")
    val got = Dedup.cutDuplicateSpans(docs, Dedup.duplicateSpans(docs, 3))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(1L -> "αβγXYZ", 2L -> "pppqqq", 3L -> "untouched"))
  }

  test("NULL text: no spans, coverage (0, 0, 0.0), clean_text empty — " +
      "every doc appears with defined values (the oracle's coalesce)") {
    val ss = spark; import ss.implicits._
    val docs = Seq(1L -> "sharedXYZW", 2L -> "sharedXYZW", 3L -> null)
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, 4)
    assert(spans.collect().forall(_.getLong(0) != 3L))
    val cov = Dedup.duplicateCoverage(docs, spans)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(cov(3L) == ((0L, 0L, 0.0)))
    val cut = Dedup.cutDuplicateSpans(docs, spans)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cut(3L) == "")
    assert(cut(1L) == "" && cut(2L) == "") // fully covered
  }

  test("cutDuplicateSpans matches naive position-set cut on random corpora") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(99)
    (1 to 10).foreach { _ =>
      val docs = (0L until (3 + rnd.nextInt(8))).map { id =>
        id -> Vector.fill(rnd.nextInt(50))(('a' + rnd.nextInt(4)).toChar).mkString
      }
      val k = 3 + rnd.nextInt(3)
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.cutDuplicateSpans(df, Dedup.duplicateSpans(df, k))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      val spans = naive(docs, k)
      val want = docs.map { case (id, t) =>
        val covered = spans.collect { case (d, s, e, _) if d == id => (s to e) }
          .flatten.toSet
        val cps = t.codePoints().toArray
        id -> cps.indices.collect { case i if !covered(i + 1L) =>
          new String(Character.toChars(cps(i))) }.mkString
      }.toMap
      assert(got == want, s"k=$k docs=${docs.map(_._2)}")
    }
  }

  test("plan: exactly 3 hash exchanges (spread, hash window, doc window) — " +
      "the final groupBy reuses the doc window's partitioning") {
    val ss = spark; import ss.implicits._
    val docs = (0L until 10L).map(id => id -> s"shared text body $id")
    val plan = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), 5)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 3, s"want 3 hash exchanges, got $exchanges:\n$plan")
  }

  test("spread=false: identical spans, one fewer exchange (the cluster-" +
      "scale path skips the corpus-text repartition)") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 8L).map { id =>
      id -> Vector.fill(40)(('a' + rnd.nextInt(4)).toChar).mkString
    }
    val df = docs.toDF("doc_id", "text").repartition(5)
    val a = Dedup.duplicateSpans(df, 4)
    val b = Dedup.duplicateSpans(df, 4, spread = false)
    // plan BEFORE any action: post-run AQE toString prints final+initial
    // sections and would double-count the exchanges
    val plan = b.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"want 2 hash exchanges without spread, got $exchanges:\n$plan")
    assert(a.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq) ==
      b.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq))
  }
}
