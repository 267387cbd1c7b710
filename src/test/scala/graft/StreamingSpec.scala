package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.DedupStream
import graft.streaming.DedupStream.{Frame, KeptFrame}
import graft.pipeline.PhashDedup

/** Streaming dedup must equal the batch fold, including across micro-batch
  * boundaries (state = last KEPT frame persists between batches). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .appName("graft-streaming")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("flatMapGroupsWithState dedup == batch fold across micro-batches") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(7)
    val docs = (0 until 5).map { d =>
      var h = r.nextLong()
      val frames = (1 to 40).map { i =>
        if (r.nextInt(3) != 0) h ^= (r.nextLong() & (0xffffL << r.nextInt(48)))
        Frame(s"doc_$d", i, h)
      }
      s"doc_$d" -> frames
    }.toMap

    val input = MemoryStream[Frame]
    val query = DedupStream.run(input.toDS())
      .writeStream.format("memory").queryName("kept").outputMode("append").start()
    // feed in 4 micro-batches, split WITHIN docs to exercise state carry
    val all = docs.values.flatten.toVector.sortBy(f => (f.frame_idx, f.doc_id))
    all.grouped(math.max(1, all.size / 4 + 1)).foreach { batch =>
      input.addData(batch)
      query.processAllAvailable()
    }
    val got = spark.table("kept").as[KeptFrame].collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx).toVector).toMap

    docs.foreach { case (docId, frames) =>
      val expected = PhashDedup.dedupe(frames.map(f => (f.frame_idx, f.phash)))
      val gotDoc = got.getOrElse(docId, Vector.empty)
      assert(gotDoc.map(k => (k.frame_idx, k.page_num, k.phash)) == expected, s"$docId")
    }
    query.stop()
  }

  test("streaming extraction == batch extraction over the same docs") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 8).map(i => graft.io.SyntheticCorpus.genDoc(i.toLong))
    val input = MemoryStream[graft.model.InputDoc]
    val q = graft.streaming.ExtractStream.spans(input.toDS())
      .writeStream.format("memory").queryName("xspans").outputMode("append").start()
    docs.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
    val got = spark.table("xspans")
    val expected = docs.flatMap(d => graft.pipeline.Extract.extractDoc(d).spans).toDF()
    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    q.stop()
  }
}
