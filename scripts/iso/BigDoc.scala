object BigDoc {
  def mkDoc(nPages: Int): graft.model.InputDoc = {
    val lines = Vector.newBuilder[String]
    for (p <- 1 to nPages) {
      lines += f"--- Page $p (page_$p%04d.png) ---"
      lines += ""
      if (p % 3 == 0) lines += s"# 運用の基礎 ― 信頼性"
      lines += s"## 第${p % 9 + 1}章 何か"
      lines += s"本文${p}です。これは少し長い段落で、"
      lines += s"続きの行${p}も含みます。"
      lines += ""
      lines += s"- 項目A${p}"
      lines += s"- 項目B${p}"
      lines += ""
      lines += s"<!-- FIGURE: fig/$p.png -->"
      lines += s"**図$p** の説明"
      lines += ""
      lines += s"はじめに $p / $nPages"
      lines += ""
    }
    val ls = lines.result()
    graft.model.InputDoc("big", ls.zipWithIndex.map { case (l, i) => graft.model.Span("line", l, "", i) })
  }
  def main(args: Array[String]): Unit = {
    // warmup
    graft.pipeline.Extract.extractDoc(mkDoc(2000))
    for (n <- Seq(2000, 8000, 32000, 128000)) {
      val doc = mkDoc(n)
      val t0 = System.nanoTime()
      val r = graft.pipeline.Extract.extractDoc(doc)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pages=$n%6d lines=${doc.spans.length}%8d spans=${r.span_count}%8d sec=$sec%7.3f us_per_line=${sec * 1e6 / doc.spans.length}%6.2f")
    }
    // single huge line (1 MB) inside a paragraph
    val huge = "あ" * 1000000
    val d2 = graft.model.InputDoc("huge", Vector(
      graft.model.Span("l", "--- Page 1 (page_0001.png) ---", "", 0),
      graft.model.Span("l", "", "", 1),
      graft.model.Span("l", huge, "", 2)))
    val t0 = System.nanoTime()
    val r2 = graft.pipeline.Extract.extractDoc(d2)
    println(f"huge-line 1MB: sec=${(System.nanoTime() - t0) / 1e9}%.3f spans=${r2.span_count}")
  }
}
