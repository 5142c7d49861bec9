package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min of [[Md5Word.hash]] over all char `n`-grams of a string, in one
  * codegen'd pass — the document-fingerprinting inner loop.
  *
  * Semantically identical to
  * `array_min(transform(sequence(1, length(s)-n+1), i -> hash32(substring(s, i, n))))`
  * (DuckDB: `list_min(list_transform(generate_series(...), ...))`), but a
  * higher-order function interprets its lambda per element and allocates a
  * substring per gram — at ~300 grams per document that interpretation is
  * the dominant cost, not the digests. NULL for strings shorter than `n`,
  * matching the empty-sequence `array_min` on both engines.
  */
case class NgramMinHash(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, s"gram size must be positive, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numChars() < n) null else NgramMinHash.min(s, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numChars() < $n) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.NgramMinHash.min($c, $n);
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): NgramMinHash =
    copy(child = newChild)
}

object NgramMinHash {

  /** Min md5-word-0 over the `numChars - n + 1` rolling char windows.
    * `substringSQL` is 1-based and char-correct for multi-byte text, so
    * values match the builtin substring chain exactly.
    */
  def min(s: UTF8String, n: Int): Long = {
    val chars = s.numChars()
    var best = Long.MaxValue
    var i = 1
    while (i <= chars - n + 1) {
      val h = Md5Word.hash(s.substringSQL(i, n), 0)
      if (h < best) best = h
      i += 1
    }
    best
  }

  def apply(c: Column, n: Int): Column =
    GraftBridge.toColumn(NgramMinHash(GraftBridge.toExpr(c), n))
}
