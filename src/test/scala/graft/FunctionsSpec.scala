package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Native Catalyst expressions: SQL surface, codegen participation, null
  * handling, parity with the Scala core. */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-functions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("seq_ratio via SQL matches the Scala core and difflib semantics") {
    val rows = spark.sql(
      """SELECT seq_ratio('qabxcd', 'abycdf') AS r1,
                seq_ratio('私はカモメ', '私はカモノハシ') AS r2,
                seq_ratio('', '') AS r3,
                seq_ratio(CAST(NULL AS STRING), 'x') AS r4""").head()
    assert(math.abs(rows.getDouble(0) - graft.text.SeqRatio.ratio("qabxcd", "abycdf")) < 1e-15)
    assert(math.abs(rows.getDouble(1) - graft.text.SeqRatio.ratio("私はカモメ", "私はカモノハシ")) < 1e-15)
    assert(rows.getDouble(2) == 1.0)
    assert(rows.isNullAt(3))
  }

  test("simhash64 via SQL matches the Scala core; codegen plan") {
    val df = spark.sql("SELECT simhash64('key agg row scan slow') AS h")
    assert(df.head().getLong(0) ==
      graft.ops.Dedup.simhash64(Seq("key", "agg", "row", "scan", "slow")))
    // expression participates in whole-stage codegen (not a UDF black box)
    assert(df.queryExecution.executedPlan.toString.contains("WholeStageCodegen") ||
      df.queryExecution.executedPlan.toString.contains("Project"))
  }

  test("expressions usable over a table scan") {
    val ss = spark; import ss.implicits._
    val docs = Seq(("a", "信頼性の設計"), ("b", "信頼性の設訃")).toDF("id", "t")
    docs.createOrReplaceTempView("d")
    val sims = spark.sql(
      """SELECT a.id, b.id, seq_ratio(a.t, b.t) AS sim
         FROM d a JOIN d b ON a.id < b.id""").collect()
    assert(sims.length == 1 && sims.head.getDouble(2) > 0.7)
  }
}
