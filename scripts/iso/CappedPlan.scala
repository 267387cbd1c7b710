import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does ReuseExchange fire in the count-first capped shape? */
object CappedPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val q = graft.ops.Dedup.lshCandidatePairs(
      graft.ops.Dedup.minhashSignatures(docs, bands = 8, shingleK = 8), maxBucket = 50)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    println("== reuse? ==")
    println(plan.linesIterator.filter(l =>
      l.contains("ReusedExchange") || l.contains("Exchange") || l.contains("HashAggregate") ||
        l.contains("Scan") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
