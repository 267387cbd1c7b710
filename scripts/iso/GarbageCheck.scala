object GarbageCheck {
  def main(args: Array[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(scala.io.Source.fromFile("/tmp/nonbmp_garbage.json", "UTF-8").mkString)
    var fails = 0
    (0 until arr.size()).foreach { i =>
      val c = arr.get(i)
      val t = c.get("t").asText()
      val lg = graft.vote.Rover.isGarbage(t, 0.9)
      val pg = graft.vote.Ensemble.isGarbagePage(t)
      val lq = graft.vote.Ensemble.isLowQuality(t)
      val nc = graft.vote.Ensemble.nonCharRatio(t)
      def chk(name: String, got: Any, exp: Any): Unit =
        if (got != exp) { println(s"case $i '$t'.take(12) $name: got $got expect $exp"); fails += 1 }
      chk("line_garbage", lg, c.get("line_garbage").asBoolean())
      chk("page_garbage", pg, c.get("page_garbage").asBoolean())
      chk("low_quality", lq, c.get("low_quality").asBoolean())
      if (math.abs(nc - c.get("non_char").asDouble()) > 1e-9)
        { println(s"case $i non_char: got $nc expect ${c.get("non_char").asDouble()}"); fails += 1 }
    }
    println(s"garbage check done, $fails failures")
  }
}
