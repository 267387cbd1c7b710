object SqlNonBmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql("SELECT seq_ratio('𠮷野家', '吉野家') AS r1, seq_ratio('第1章 𠮷野家', '第1章 吉野家') AS r2").head()
    println(f"SQL_R1=${r.getDouble(0)}%.12f (difflib 0.666666666667)")
    println(f"SQL_R2=${r.getDouble(1)}%.12f (difflib 0.857142857143)")
    spark.stop()
  }
}
