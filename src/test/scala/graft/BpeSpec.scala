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

  // ---- training loop ([[graft.operators.BpeTrain]]) ----------------------

  /** Independent single-threaded reference learner: same greedy objective
    * (max weighted pair count, ties (a, b) ascending), written directly
    * against a Map vocab with none of the operator's machinery.
    */
  private def referenceTrain(vocab: Map[String, Long], n: Int,
      init: Vector[(String, String)]): Vector[(String, String)] = {
    var merges = init
    var continue = true
    while (merges.size < init.size + n && continue) {
      val ranks = merges.zipWithIndex.toMap
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, c) =>
        val syms = Bpe.tokenize(w, ranks)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else merges :+= counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }._1
    }
    merges
  }

  private def trainVocab(rows: Seq[(String, Long)]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toDF("w", "c")
  }

  test("trainMerges learns the argmax merge every round (vs reference)") {
    val vocab = Map(
      "thethethe" -> 40L, "other" -> 25L, "running" -> 18L, "banana" -> 12L,
      "and" -> 30L, "sandman" -> 7L, "ere" -> 9L, "z" -> 100L)
    val learned = graft.operators.BpeTrain.trainMerges(trainVocab(vocab.toSeq), 6)
    val expect = referenceTrain(vocab, 6, Vector.empty)
    assert(learned == expect,
      s"learned=${learned.mkString(",")} expect=${expect.mkString(",")}")
  }

  test("trainMerges continues a prior table and stays well-formed") {
    val vocab = Map("thinking" -> 10L, "thermal" -> 8L, "sound" -> 6L,
      "ground" -> 5L, "ingot" -> 4L)
    val learned = graft.operators.BpeTrain.trainMerges(
      trainVocab(vocab.toSeq), 4, Bpe.fixtureMerges)
    assert(learned.take(Bpe.fixtureMerges.size) == Bpe.fixtureMerges)
    assert(learned.size == Bpe.fixtureMerges.size + 4)
    assert(learned == referenceTrain(vocab, 4, Bpe.fixtureMerges))
    // well-formedness: every merge input is a base char or earlier output —
    // the invariant tokenize/replay equivalence depends on
    val known = scala.collection.mutable.Set.empty[String]
    learned.foreach { case (a, b) =>
      Seq(a, b).foreach(s =>
        assert(s.length == 1 || known.contains(s), s"ill-formed input '$s'"))
      known += (a + b)
    }
  }

  test("trainMerges stops when no adjacent pair remains") {
    val learned = graft.operators.BpeTrain.trainMerges(
      trainVocab(Seq("a" -> 5L, "b" -> 3L)), 3)
    assert(learned.isEmpty)
    // one two-symbol word -> exactly one learnable merge, then exhaustion
    val one = graft.operators.BpeTrain.trainMerges(
      trainVocab(Seq("ab" -> 2L, "c" -> 9L)), 5)
    assert(one == Vector(("a", "b")))
  }
}
