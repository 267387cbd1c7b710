object RoverNonBmp {
  def main(args: Array[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(scala.io.Source.fromFile("/tmp/nonbmp_rover.json", "UTF-8").mkString)
    var fails = 0
    (0 until arr.size()).foreach { i =>
      val c = arr.get(i)
      val texts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val it = c.get("texts").fields()
      while (it.hasNext) { val e = it.next(); texts += ((e.getKey, e.getValue.asText())) }
      val conf = scala.collection.mutable.Map.empty[String, Double]
      val it2 = c.get("conf").fields()
      while (it2.hasNext) { val e = it2.next(); conf(e.getKey) = e.getValue.asDouble() }
      val pos = graft.vote.Rover.alignTextsCharacterLevel(texts.toVector)
      val (text, avg) = graft.vote.Rover.voteAlignedText(pos, conf.toMap)
      val okT = text == c.get("voted").asText()
      val okC = math.abs(avg - c.get("avg").asDouble()) < 1e-9
      if (!okT || !okC) { println(s"case $i DIFF: got '$text' ($avg) expect '${c.get("voted").asText()}' (${c.get("avg").asDouble()})"); fails += 1 }
    }
    println(s"rover non-bmp check done, $fails failures")
  }
}
