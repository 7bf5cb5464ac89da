package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Bpe, BpeRef}

/** CPython parity for the merge-table BPE: committed corpora generated
  * by a CPython implementation of the same published algorithm over the
  * committed merges (resources/bpe_merges.txt). Both the engine encoder
  * (greedy lowest-rank) and the oracle-sidecar reference (sequential
  * rank order) must reproduce CPython's counts and token sequences. */
class BpeSpec extends AnyFunSuite {

  private def lines(res: String, sep: Char): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(res)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.split(sep.toString, -1)).toVector finally src.close()
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => b += '\t'; case 'n' => b += '\n'; case '\\' => b += '\\'
          case c => b += c
        }
        i += 2
      } else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }

  test("token counts match CPython on the parity corpus (both impls)") {
    var n = 0
    for (Array(raw, want) <- lines("/bpe_parity_corpus.tsv", '\u0001')) {
      val text = unescape(raw)
      assert(Bpe.countTokens(text) == want.toLong, s"Bpe count for ${text.take(40)}")
      assert(BpeRef.countTokens(text) == want.toLong, s"BpeRef count for ${text.take(40)}")
      n += 1
    }
    assert(n >= 40)
  }

  test("token sequences match CPython word-for-word (both impls)") {
    for (Array(w, toks) <- lines("/bpe_tokens_corpus.tsv", '\t')) {
      val want = toks.split(" ").toSeq
      assert(Bpe.encode(w).toSeq == want, s"Bpe.encode($w)")
      assert(BpeRef.encode(w) == want, s"BpeRef.encode($w)")
    }
  }

  test("pretokenizer covers every char exactly once") {
    val texts = Seq("a_b-c", "  x ", "12a!б\t_", "don't", "")
    for (t <- texts) {
      val toks = graft.core.Bpe.pretokens(t)
      assert(toks.map(_.length).sum == t.length, s"dropped chars in ${t}")
      assert(toks.mkString == t)
    }
  }

  test("greedy and sequential-rank-order encodings agree on random words") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz '-!"
    for (_ <- 0 until 2000) {
      val w = Array.fill(rnd.nextInt(18))(alpha(rnd.nextInt(alpha.length))).mkString
      assert(Bpe.encode(w).toSeq == BpeRef.encode(w), s"impl divergence on '$w'")
    }
  }
}
