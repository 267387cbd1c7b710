package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Properties of the canonical corpus digest (the x_ gate primitive):
  * order-independence, null handling, unambiguous framing, and the
  * cross-plane sort order the formula promises. */
class DigestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .appName("graft-digest")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("row order and column order do not change the digest; values do") {
    val ss = spark; import ss.implicits._
    val a = Seq(("x", 1, 2.5), ("y", 2, 3.5)).toDF("s", "i", "d")
    val b = Seq(("y", 2, 3.5), ("x", 1, 2.5)).toDF("s", "i", "d")
    val c = Seq((2.5, "x", 1), (3.5, "y", 2)).toDF("d", "s", "i")
    val drift = Seq(("x", 1, 2.5), ("y", 2, 3.6)).toDF("s", "i", "d")
    assert(Digest.corpusSha(a) == Digest.corpusSha(b))
    assert(Digest.corpusSha(a) == Digest.corpusSha(c))
    assert(Digest.corpusSha(a) != Digest.corpusSha(drift))
  }

  test("framing is unambiguous: separator-bearing values cannot collide") {
    val ss = spark; import ss.implicits._
    // under a naive U+001F join these two rows serialize identically;
    // length-prefixed fields must keep them distinct
    val p = Seq(("ab", "c")).toDF("l", "r")
    val q = Seq(("a", "bc")).toDF("l", "r")
    assert(Digest.corpusSha(p) != Digest.corpusSha(q))
  }

  test("null is distinct from its sentinel text and from empty") {
    val ss = spark; import ss.implicits._
    val n = Seq((null: String, "v")).toDF("a", "b")
    val s = Seq(("␀", "v")).toDF("a", "b")
    val e = Seq(("", "v")).toDF("a", "b")
    // the sentinel collides with a LITERAL U+2400 by construction (one
    // reserved code point, documented); empty and null must not collide
    assert(Digest.corpusSha(n) == Digest.corpusSha(s))
    assert(Digest.corpusSha(n) != Digest.corpusSha(e))
  }

  test("schema identity participates: column names and label flip the digest") {
    val ss = spark; import ss.implicits._
    // value-identical outputs under different column names or different
    // query labels must NOT share a digest (the v2 window: one query
    // regressing into another's identical-valued result stayed green)
    val a = Seq(("x", 1)).toDF("s", "i")
    val renamed = Seq(("x", 1)).toDF("s", "j")
    assert(Digest.corpusSha(a) != Digest.corpusSha(renamed))
    assert(Digest.corpusSha(a, "q_one") != Digest.corpusSha(a, "q_two"))
    assert(Digest.corpusSha(a, "q_one") == Digest.corpusSha(a, "q_one"))
  }

  test("preamble framing is unambiguous vs row bytes") {
    val ss = spark; import ss.implicits._
    // a label that textually extends into the first column name must not
    // collide with the split version (length prefixes frame each part)
    val d = Seq(Tuple1("v")).toDF("ab")
    val e = Seq(Tuple1("v")).toDF("b")
    assert(Digest.corpusSha(d, "x") != Digest.corpusSha(e, "xa"))
  }

  test("rows sort by UTF-8 bytes (code points), not UTF-16 code units") {
    val ss = spark; import ss.implicits._
    // U+FFFD (BMP, high) vs U+1F600 (supplementary): Java String order
    // puts the surrogate pair FIRST; code-point order puts it LAST. The
    // digest must equal the one computed from explicitly code-point-
    // sorted input, independent of arrival order.
    val hi = "�"; val emoji = new String(Character.toChars(0x1F600))
    val d1 = Seq(Tuple1(hi), Tuple1(emoji)).toDF("s")
    val d2 = Seq(Tuple1(emoji), Tuple1(hi)).toDF("s")
    assert(Digest.corpusSha(d1) == Digest.corpusSha(d2))
    // cross-check against a directly computed reference digest
    // (preamble: empty label + the one column name 's', framed, + '\n')
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update("0:1:s\n".getBytes("UTF-8"))
    Seq(hi, emoji).map(v => s"${v.getBytes("UTF-8").length}:$v")
      .map(_.getBytes("UTF-8"))
      .sortWith((x, y) => java.util.Arrays.compareUnsigned(x, y) < 0)
      .foreach { b => md.update(b); md.update('\n'.toByte) }
    val expected = md.digest().map("%02x".format(_)).mkString
    assert(Digest.corpusSha(d1)._2 == expected)
  }
}
