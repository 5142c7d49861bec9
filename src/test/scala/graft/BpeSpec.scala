package graft

import graft.functions.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the equivalence the q72b oracle depends on: the
  * iterative lowest-rank-first apply loop ([[Bpe.tokenize]]) must produce
  * the same segmentation as replaying the merges once each in rank order
  * with literal replace-all — the semantics of the generated DuckDB
  * expression ([[Bpe.oracleReplayExpr]]). This spec implements the replay
  * in Scala with the SAME `<sym>` wrapping and compares segmentations on
  * random words, so the two code paths can't drift apart silently.
  */
class BpeSpec extends AnyFunSuite {

  /** Rank-order replace-all replay — a literal Scala transcription of
    * oracleReplayExpr: wrap each char as `<c>`, then for each merge in
    * rank order replace every `<a><b>` with `<ab>`.
    */
  private def replaySegments(word: String): Array[String] = {
    var s = word.map(c => s"<$c>").mkString
    Bpe.fixtureMerges.foreach { case (a, b) =>
      s = s.replace(s"<$a><$b>", s"<$a$b>")
    }
    // split back into symbols: each is <...>
    "<([^>]*)>".r.findAllMatchIn(s).map(_.group(1)).toArray
  }

  test("apply loop == rank-order replay on random [a-z]+ words") {
    val rnd = new scala.util.Random(72)
    val words =
      Seq("", "a", "the", "thththe", "inginging", "andand", "round", "ouou",
        "banana", "rere", "erer") ++
        Seq.fill(5000)((1 to (1 + rnd.nextInt(14)))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    words.filter(_.nonEmpty).foreach { w =>
      val loop = Bpe.tokenize(w, Bpe.fixtureRanks)
      val replay = replaySegments(w)
      assert(loop.sameElements(replay),
        s"'$w': loop=${loop.mkString("|")} replay=${replay.mkString("|")}")
    }
  }

  test("adversarial overlap words: merges interact but never diverge") {
    // words built from merge inputs/outputs concatenated, the worst case
    // for left-to-right overlap handling (e.g. 'ththe' — the first 'th'
    // consumes the 't','h' that 'the' would want)
    val parts = Bpe.fixtureMerges.flatMap { case (a, b) => Seq(a, b, a + b) }
    val rnd = new scala.util.Random(73)
    val words = Seq.fill(2000)(
      (1 to (1 + rnd.nextInt(6))).map(_ => parts(rnd.nextInt(parts.length))).mkString)
    words.foreach { w =>
      val loop = Bpe.tokenize(w, Bpe.fixtureRanks)
      val replay = replaySegments(w)
      assert(loop.sameElements(replay),
        s"'$w': loop=${loop.mkString("|")} replay=${replay.mkString("|")}")
      assert(loop.mkString == w, s"'$w': segmentation loses characters")
    }
  }

  test("tokenCount matches segmentation length") {
    assert(Bpe.tokenCount("the") == 1L)
    assert(Bpe.tokenCount("thinking") == 4L) // th|in|k|ing
    assert(Bpe.tokenCount("z") == 1L)
    Seq("round", "banana", "ingot").foreach { w =>
      assert(Bpe.tokenCount(w) == Bpe.tokenize(w, Bpe.fixtureRanks).length.toLong)
    }
  }
}
