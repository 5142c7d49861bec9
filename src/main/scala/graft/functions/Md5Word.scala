package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable hash: word `w` of
  * the MD5 digest of a string as an unsigned 32-bit value in a long.
  *
  * Semantically identical to `conv(substring(md5(c), 1+8*w, 8), 16, 10)`
  * (the [[Hashing.hash32]] builtin chain and its DuckDB oracle form
  * `('0x'||substring(md5(c),1+8*w,8))::BIGINT`), but skips the 32-char hex
  * string materialization + substring + base-16 re-parse: digest bytes are
  * read directly. This sits in the innermost loop of MinHash/LSH dedup
  * (one call per shingle per family — billions of evaluations at 100 TB),
  * which justifies the custom-Expression tier of SURVEY §7.3: compose
  * builtins first, drop to a codegen'd Expression only for proven hot
  * paths. Callers guarantee a string child (cast at the call site).
  */
case class Md5Word(child: Expression, word: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(word >= 0 && word < 4, s"md5 digest has 4 words, got $word")

  // SQL-exposed (graft_hash32): a non-string argument must be an analysis
  // error, not a runtime ClassCastException
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_word"

  override protected def nullSafeEval(input: Any): Any =
    Md5Word.hash(input.asInstanceOf[UTF8String], word)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Word.hash($c, $word)")

  override protected def withNewChildInternal(newChild: Expression): Md5Word =
    copy(child = newChild)
}

object Md5Word {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Big-endian unsigned read of digest bytes [4w, 4w+4) — exactly the
    * value of the hex-substring-conv chain.
    */
  def hash(s: UTF8String, word: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val o = word * 4
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  }

  /** All four 32-bit words of one digest — computed with a SINGLE md5 call.
    * Four separate [[Md5Word]] expressions over the same input each rerun
    * the digest (they are distinct trees, so subexpression elimination
    * can't merge them); MinHash with a 4k-member family drops from 4k to k
    * digests per shingle by projecting this array once per digest group.
    */
  def words(s: UTF8String): Array[Long] = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var w = 0
    while (w < 4) {
      val o = w * 4
      out(w) = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
      w += 1
    }
    out
  }

  /** Column API: word `w` of md5(c) as an unsigned 32-bit long. */
  def apply(c: Column, word: Int): Column =
    GraftBridge.toColumn(Md5Word(GraftBridge.toExpr(c), word))
}

/** Array-of-all-4-words variant of [[Md5Word]]: one digest, one projected
  * `array<long>` column. See [[Md5Word.words]].
  */
case class Md5Words(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_words"

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Md5Word.words(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Md5Word.words($c))")

  override protected def withNewChildInternal(newChild: Expression): Md5Words =
    copy(child = newChild)
}

object Md5Words {
  def apply(c: Column): Column =
    GraftBridge.toColumn(Md5Words(GraftBridge.toExpr(c)))
}
