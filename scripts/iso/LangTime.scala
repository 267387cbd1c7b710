import org.apache.spark.sql.SparkSession

/** Spot-timing: q_langid at a given tier (best of 3 after warmup). */
object LangTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run() = graft.SparkEntry.queries("q_langid")(spark, dir).count()
    run()
    val times = (1 to 3).map { _ =>
      val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
    }
    println(f"""{"q_langid_best":${times.min}%.3f,"runs":[${times.map(t => f"$t%.3f").mkString(",")}],"sf":"$dir"}""")
    spark.stop()
  }
}
