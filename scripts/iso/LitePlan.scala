object LitePlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.read.parquet("/tmp/graft_corpus_80000")
    val lite = df.select(col("doc_id"),
      col("spans.text").as("texts"), col("spans.offset").as("offsets"))
      .as[(String, Array[String], Array[Int])]
    val plan = lite.queryExecution.executedPlan.toString
    println("READSCHEMA=" + plan.linesIterator.filter(_.contains("ReadSchema")).mkString.takeRight(160))
    // timing: lite vs full deserialization, interleaved best-of-3
    def timeIt(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    def liteRun(): Long = lite.mapPartitions(_.map { case (id, texts, offsets) =>
      val lines = offsets.zip(texts).sortBy(_._1).map(_._2).toIndexedSeq
      graft.pipeline.Extract.extractDoc(graft.model.InputDoc(id,
        lines.zipWithIndex.map { case (l, i) => graft.model.Span("", l, "", i) })).span_count.toLong
    }).reduce(_ + _)
    def fullRun(): Long = spark.read.parquet("/tmp/graft_corpus_80000").as[graft.model.InputDoc]
      .mapPartitions(_.map(d => graft.pipeline.Extract.extractDoc(d).span_count.toLong)).reduce(_ + _)
    liteRun(); fullRun() // warmup
    val times = (1 to 3).flatMap(_ => Seq("lite" -> timeIt(liteRun()), "full" -> timeIt(fullRun())))
    val best = times.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    println(f"LITE_BEST=${best("lite")}%.2f FULL_BEST=${best("full")}%.2f SPEEDUP=${best("full")/best("lite")}%.2fx")
    spark.stop()
  }
}
