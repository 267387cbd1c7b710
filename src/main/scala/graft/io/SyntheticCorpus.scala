package graft.io

import java.util.Random
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{InputDoc, Span}

/** Deterministic (seed-stable) synthetic interleaved text+media corpus with
  * the input_hint shape: (doc_id, spans:array<struct<kind,text,media_ref,
  * offset>>). One span per markdown-surface line, mirroring the book.md
  * surface the reference parses (FIXTURES.md §1).
  *
  * Generated distributed via spark.range -> map (no driver-side data), so
  * the same generator scales from 20 docs (tests) to millions (the sampled
  * stand-in for the 10^12-doc corpus). Heavy-tail pages/doc exercises the
  * skew path.
  */
object SyntheticCorpus {

  private val runningHeadVariants =
    Vector("運用の基礎 ― 信頼性", "運用の基礎 — 信頼性", "運用の基礎 - 信頼性", "運用の基礎 – 信頼性")
  private val chapterTitles =
    Vector("はじめに", "設計原則", "運用と監視", "障害対応", "継続的改善", "まとめ")
  private val words = Vector(
    "システム", "信頼性", "運用", "監視", "設計", "障害", "対応", "改善", "計測", "評価",
    "サービス", "指標", "目標", "予算", "自動化", "構成", "分析", "復旧", "検証", "記録")

  private def mix(seed: Long, idx: Long): Long = {
    var z = seed ^ (idx * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sentence(r: Random, n: Int): String =
    (0 until n).map(_ => words(r.nextInt(words.length))).mkString("") + "。"

  /** Build one document's markdown lines as (kind, text, media_ref). */
  def genLines(docIdx: Long, seed: Long = 42L): Vector[(String, String, String)] = {
    val r = new Random(mix(seed, docIdx))
    // heavy-tail page count: mostly 5-40, ~2% of docs get 150-400 pages
    val nPages =
      if (r.nextInt(50) == 0) 150 + r.nextInt(250)
      else 5 + r.nextInt(36)
    val runningHead = runningHeadVariants(r.nextInt(runningHeadVariants.length))
    val nChapters = 1 + r.nextInt(4)
    val out = Vector.newBuilder[(String, String, String)]
    def line(kind: String, text: String, media: String = ""): Unit = out += ((kind, text, media))
    def blank(): Unit = line("blank", "")

    var inSkip = false
    var chapter = 0
    for (p <- 1 to nPages) {
      line("page", f"--- Page $p (page_$p%04d.png) ---")
      blank()

      if (p == 1) {
        line("figure", "<!-- FIGURE: figures/cover.png -->", "figures/cover.png")
        line("text", "**表紙** の画像")
        blank()
        line("heading", s"# 書籍タイトル第${docIdx}巻")
        blank()
        line("meta", "1 / 1")
      } else if (p == 2 && r.nextBoolean()) {
        // TOC page with dot/dash/space leaders
        line("marker", "<!-- toc -->")
        for (c <- 1 to nChapters) {
          line("toc", s"第${c}章 ${chapterTitles(c % chapterTitles.length)} .... ${c * 10}")
          line("toc", s"${c}.1 ${words(r.nextInt(words.length))}の概要 ─── ${c * 10 + 2}")
        }
        line("marker", "<!-- /toc -->")
        blank()
      } else {
        // running head on ~70% of pages (level 1 => detected boilerplate)
        if (r.nextInt(10) < 7) {
          line("heading", s"# $runningHead")
          blank()
        }
        // occasionally a decoration heading (static exclusion pattern)
        if (r.nextInt(12) == 0) line("heading", "# ◆◆◆")

        // chapter / section headings
        if (r.nextInt(6) == 0 && chapter < nChapters) {
          chapter += 1
          line("heading", s"## 第${chapter}章 ${chapterTitles(chapter % chapterTitles.length)}")
          blank()
        }
        if (r.nextInt(4) == 0 && chapter > 0) {
          line("heading", s"### ${chapter}.${1 + r.nextInt(3)} ${words(r.nextInt(words.length))}の詳細")
          blank()
        }
        if (r.nextInt(20) == 0) line("heading", s"#### 深い見出し${r.nextInt(100)}")

        // skip/content markers, may span page boundaries (marker stack)
        if (!inSkip && r.nextInt(15) == 0) { line("marker", "<!-- skip -->"); inSkip = true }

        // paragraphs: multi-line (joined without delimiter) + continuation
        val nParas = 1 + r.nextInt(3)
        for (_ <- 0 until nParas) {
          val lines = 1 + r.nextInt(3)
          for (li <- 0 until lines) {
            val endSentence = li == lines - 1 || r.nextBoolean()
            val t = sentence(r, 3 + r.nextInt(5))
            line("text", if (endSentence) t else t.dropRight(1))
          }
          blank()
        }

        // list (2-4 items) sometimes
        if (r.nextInt(3) == 0) {
          val marker = if (r.nextBoolean()) "-" else "・"
          for (i <- 1 to 2 + r.nextInt(3)) line("list", s"$marker 項目${i}の${words(r.nextInt(words.length))}")
          blank()
        }

        // figure with caption sometimes
        if (r.nextInt(4) == 0) {
          val path = f"figures/page_$p%04d_fig1.png"
          line("figure", s"<!-- FIGURE: $path -->", path)
          line("text", s"**図$p** ${words(r.nextInt(words.length))}の構成図")
          blank()
        }

        if (inSkip && r.nextInt(5) == 0) { line("marker", "<!-- /skip -->"); inSkip = false }

        // page metadata trailer
        val chapName = chapterTitles(math.max(chapter, 1) % chapterTitles.length)
        line("meta", s"$chapName ${p} / $nPages")
      }
      blank()
    }
    out.result()
  }

  def genDoc(docIdx: Long, seed: Long = 42L): InputDoc = {
    val lines = genLines(docIdx, seed)
    val spans = lines.zipWithIndex.map { case ((kind, text, media), i) =>
      Span(kind, text, media, i)
    }
    InputDoc(f"doc_$docIdx%012x", spans)
  }

  /** Distributed generation: one task per slice of the id range. */
  def docs(spark: SparkSession, nDocs: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[InputDoc] = {
    import spark.implicits._
    spark.range(0, nDocs, 1, partitions).map(i => genDoc(i, seed))
  }

  /** Scale-factor convention used by SparkEntry/Bench: docs = sf * 20000,
    * floor 20 (sf0.001 -> 20, sf0.01 -> 200, sf0.1 -> 2000). */
  def docsForSfDir(spark: SparkSession, sfDir: String, seed: Long = 42L): Dataset[InputDoc] = {
    val sf = raw"sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    val n = math.max(20L, (sf * 20000).toLong)
    docs(spark, n, seed)
  }
}
