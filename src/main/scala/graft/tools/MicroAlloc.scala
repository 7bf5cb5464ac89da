package graft.tools

import graft.synth.TurnGen

/** Single-threaded micro-measurement of the per-turn extraction cost:
  * wall ns/turn and allocated bytes/turn (ThreadMXBean), by dialect.
  * No Spark — isolates the core from scan/GC noise.
  *   sbt "runMain graft.tools.MicroAlloc [nTurns]"
  */
object MicroAlloc {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId

    val turns = (0 until n).map { i =>
      val g = TurnGen.genTurn(f"conv-$i%06d", 0)
      (g.input.text, g.input.tool)
    }.toArray

    // warm-up
    var sink = 0
    for ((p, _) <- turns) sink ^= graft.core.Extractor.extractOne("c", 0, p).total_score
    for ((p, _) <- turns) sink ^= graft.core.Extractor.extractOne("c", 0, p).total_score

    def measure(label: String, dialect: String)(f: String => Int): Unit = {
      val sel = turns.filter { case (_, d) => dialect == "ALL" || d == dialect }
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      for ((p, _) <- sel) sink ^= f(p)
      val dt = System.nanoTime() - t0
      val da = tmx.getThreadAllocatedBytes(tid) - a0
      println(f"MICRO $label%10s $dialect%5s turns=${sel.length}%5d " +
        f"ns/turn=${dt / math.max(1, sel.length)}%8d " +
        f"alloc/turn=${da / math.max(1, sel.length)}%8d bytes")
    }
    import graft.core._
    def content(p: String): IndexedSeq[Span] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Boiler.contentSpans(Tokenizer.tokenize(p)))
    def glyphs(c: IndexedSeq[Span]): IndexedSeq[Span] =
      c.filter(s => s.kind == "g" && s.page == 0)
    for (dialect <- Seq("pdf", "html", "plain", "ALL")) {
      measure("tokenize", dialect)(p => Tokenizer.tokenize(p).length)
      measure("tok+boiler", dialect)(p => content(p).length)
      measure("+hat", dialect) { p =>
        val c = content(p)
        Header.recognizeHat(c, Layouts.Hat)._1.map(_.length).getOrElse(0)
      }
      measure("+code", dialect) { p =>
        val c = content(p)
        val cs = c.filter(s => s.page == 0 && Layouts.Code.containsFully(s))
        CodeRec.recognizeCode(cs).toOption.flatten.map(_.length).getOrElse(0)
      }
      measure("+tableall", dialect) { p =>
        val c = content(p)
        TableDetect.recognizeTableAll(c, glyphs(c), TableDetect.MainDetector)
          .map(_._2.n).getOrElse(0)
      }
      measure("+serialize", dialect) { p =>
        val c = content(p)
        Extractor.serializeContent(c)._1.length
      }
      measure("full", dialect)(p => Extractor.extractOne("c", 0, p).total_score)
    }
    if (sink == 42) println("") // keep sink live
  }
}
