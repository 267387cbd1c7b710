object CfgDemo {
  def main(args: Array[String]): Unit = {
    val lines = scala.io.Source.fromFile("/tmp/episode_book.md", "UTF-8").getLines().toVector
    val doc = graft.model.InputDoc("ep",
      lines.zipWithIndex.map { case (l, o) => graft.model.Span("line", l, "", o) })
    val cfg = Some(graft.group.Sections.HeaderLevelConfig(level1 = Vector("episode")))
    val withCfg = graft.sink.GroupedXml.buildGroupedXml(doc, config = cfg)
    val noCfg = graft.sink.GroupedXml.buildGroupedXml(doc)
    def ref(p: String) = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    println("CFG_BYTE_EQUAL=" + (withCfg == ref("/tmp/episode_book.cfg.xml")))
    println("NOCFG_BYTE_EQUAL=" + (noCfg == ref("/tmp/episode_book.nocfg.xml")))
    println("CFG_CH2_HAS_PAGE5=" + withCfg.contains("<chapter number=\"2\" title=\"嵐の夜\"><!-- page 5 -->"))
    println("NOCFG_CH2_EMPTY=" + noCfg.contains("<chapter number=\"2\" title=\"嵐の夜\" />"))
    // probes: empty config == no config; case-insensitive keyword; zero number
    val empty = graft.sink.GroupedXml.buildGroupedXml(doc,
      config = Some(graft.group.Sections.HeaderLevelConfig()))
    println("EMPTY_CFG_EQUALS_NOCFG=" + (empty == noCfg))
    val upper = graft.sink.GroupedXml.buildGroupedXml(doc,
      config = Some(graft.group.Sections.HeaderLevelConfig(level1 = Vector("EPISODE"))))
    println("CASE_INSENSITIVE=" + (upper == withCfg))
    println("LSTRIP_ZERO=" + graft.group.Sections.extractNumberByKeyword("Episode 000",
      graft.group.Sections.HeaderLevelConfig(level1 = Vector("episode"))))
  }
}
