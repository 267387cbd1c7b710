import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 plan evidence: the hot-key prefilter shape — exact per-bucket
  * counts via hash-aggregate (map-side combine), over-cap keys back as a
  * BroadcastExchange, hot rows dropped by a BroadcastHashJoin LeftAnti
  * BEFORE the bucket exchange (the hot mass never enters a shuffle). */
object PlansR6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast("string"))
    val q = graft.ops.Dedup.simhashPairs(docs, maxDist = 16, hotKeyPrefilter = true)
    q.count()
    println(q.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("HashAggregate") || l.contains("Join") ||
        l.contains("Scan") || l.contains("Window") || l.contains("Generate"))
      .mkString("\n"))
    spark.stop()
  }
}
