object Iso {
  def run(docs: Array[graft.model.InputDoc], nThreads: Int): Double = {
    val t0 = System.nanoTime()
    val idx = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until nThreads).map { _ =>
      new Thread(() => {
        var i = idx.getAndIncrement()
        while (i < docs.length) {
          graft.pipeline.Extract.extractDoc(docs(i))
          i = idx.getAndIncrement()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toInt
    val docs = (0 until nDocs).map(i => graft.io.SyntheticCorpus.genDoc(i.toLong)).toArray
    run(docs, 32) // warmup
    for (pass <- 1 to 5; t <- Seq(4, 8, 16, 32)) {
      val sec = run(docs, t)
      println(f"pass=$pass threads=$t sec=$sec%.3f docs_per_sec=${nDocs / sec}%.1f")
    }
  }
}
