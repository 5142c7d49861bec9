package graft.functions

import scala.collection.mutable.ArrayBuffer

/** REAL byte-pair-encoding apply: a merges-table loop, not a heuristic.
  *
  * `tokenize` is the standard BPE inference algorithm (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016): start from single characters, repeatedly find the adjacent
  * symbol pair with the LOWEST merge rank currently present in the word,
  * merge every occurrence left-to-right, and stop when no adjacent pair
  * is in the table.
  *
  * For a WELL-FORMED merges table — each merge's two inputs are base
  * characters or outputs of strictly earlier merges, which is what BPE
  * learning produces by construction — this loop is equivalent to
  * applying the merges once each in rank order with literal
  * replace-all: a merge can never create an occurrence of a LOWER-ranked
  * pair, because that pair would have to mention a symbol that didn't
  * exist when it was learned. [[oracleReplayExpr]] exploits the
  * equivalence to generate a SQL replay of the exact same table (symbols
  * wrapped as `<sym>` so pair boundaries are unambiguous), so the engine
  * and the oracle share one source of truth; BpeSpec property-checks the
  * equivalence on random words. Well-formedness is asserted at load.
  */
object Bpe {

  /** Fixture merges table ("learned" offline on English letter bigrams),
    * in rank order. Inputs are base chars or earlier outputs — asserted
    * below.
    */
  val fixtureMerges: Vector[(String, String)] = Vector(
    "t" -> "h", // -> th
    "th" -> "e", // -> the
    "i" -> "n", // -> in
    "a" -> "n", // -> an
    "an" -> "d", // -> and
    "e" -> "r", // -> er
    "o" -> "n", // -> on
    "r" -> "e", // -> re
    "in" -> "g", // -> ing
    "o" -> "u") // -> ou

  /** rank of each pair — lower merges first */
  val fixtureRanks: Map[(String, String), Int] =
    fixtureMerges.zipWithIndex.toMap

  locally { // well-formedness: the equivalence above depends on it
    val known = scala.collection.mutable.Set.empty[String]
    fixtureMerges.foreach { case (a, b) =>
      Seq(a, b).foreach(s => require(s.length == 1 || known.contains(s),
        s"bpe: merge input '$s' is neither a base char nor an earlier output"))
      known += (a + b)
    }
    require(fixtureRanks.size == fixtureMerges.size, "bpe: duplicate merge pair")
  }

  /** One word -> its BPE symbols, by the real apply loop. */
  def tokenize(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: ArrayBuffer[String] = {
      val b = new ArrayBuffer[String](word.length)
      var i = 0
      while (i < word.length) { b += word.substring(i, i + 1); i += 1 }
      b
    }
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = new ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            out += bestA + bestB; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
        continue = syms.length > 1
      }
    }
    syms.toArray
  }

  /** Token count for one word under the fixture table. */
  def tokenCount(word: String): Long =
    tokenize(word, fixtureRanks).length.toLong

  private val LetterRun = "[a-z]+".r

  /** The BPE-able units of a document: lowercase letter runs (digits and
    * punctuation are single tokens in the q72 lexer and are out of scope
    * here).
    */
  def letterRuns(text: String): Iterator[String] =
    LetterRun.findAllIn(text)

  /** SQL expression (DuckDB-compatible) replaying the SAME merges table
    * over a word column `w`: wrap each char as `<c>` (pair boundaries
    * stay unambiguous because '<'/'>' can't appear in a [a-z]+ run),
    * then one literal replace-all per merge in rank order. Generated
    * from [[fixtureMerges]] so the oracle can never drift from the
    * engine's table.
    */
  def oracleReplayExpr(wordCol: String): String =
    fixtureMerges.foldLeft(
      s"regexp_replace($wordCol, '(.)', '<\\1>', 'g')") {
      case (acc, (a, b)) => s"replace($acc, '<$a><$b>', '<$a$b>')"
    }
}
