object RatioCheck {
  def main(args: Array[String]): Unit = {
    val src = scala.io.Source.fromFile("/tmp/nonbmp_ratio.json", "UTF-8").mkString
    // minimal json parse via spark? use simple regex-free manual: use spark's jackson
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(src)
    var fails = 0
    (0 until arr.size()).foreach { i =>
      val a = arr.get(i).get("a").asText()
      val b = arr.get(i).get("b").asText()
      val expect = arr.get(i).get("r").asDouble()
      val got = graft.text.SeqRatio.ratio(a, b)
      val ok = math.abs(got - expect) < 1e-9
      if (!ok) { println(f"DIFF a=${a.take(12)} expect=$expect%.6f got=$got%.6f"); fails += 1 }
    }
    println(s"ratio check done, $fails failures")
  }
}
