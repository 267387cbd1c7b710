import org.apache.spark.sql.SparkSession
object XrelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def fused() = graft.pipeline.ExtractRelational.spans(
      graft.io.SyntheticCorpus.docsForSfDir(spark, dir), persistParsed = false).toDF()
    def persist() = graft.pipeline.ExtractRelational.spans(
      graft.io.SyntheticCorpus.docsForSfDir(spark, dir)).toDF()
    def time(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    // warmup
    fused().count(); persist().count()
    (1 to 3).foreach { r =>
      val a = time(fused().count())
      val b = time(persist().count())
      println(f"round $r fused_count=$a%.3f persist_count=$b%.3f")
    }
    spark.stop()
  }
}
