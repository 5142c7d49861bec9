package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the scaled-long vector kernels that sit
  * in the innermost loop of every ANN / k-means / semantic-dedup operator
  * (one evaluation per vector pair — corpus × centroids, corpus × queries:
  * billions at 100 TB). Semantically identical to the
  * `aggregate(zip_with(a, b, f), 0, +)` higher-order-function form
  * [[graft.operators.Similarity]] used before, but the HOF tree pays a
  * lambda invocation and a null-check per ELEMENT; these compile to one
  * tight long loop over the two `ArrayData`, inside whole-stage codegen
  * (`defineCodeGen` — the same custom-Expression tier as [[Md5Word]],
  * SURVEY §7.3: drop to a native expression only for proven hot paths).
  *
  * Null parity with the HOF form: a null array yields null (nullSafeEval);
  * mismatched lengths or a null ELEMENT also yield null — zip_with pads
  * the shorter side with nulls and `null * x` poisons the HOF sum, so the
  * native kernels poison too rather than silently truncating.
  */
case class DotLongs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_longs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // the kernel signals the poison cases (length mismatch, null element)
  // with a boxed null — branch on it instead of unboxing into ev.value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long ${ev.value}_r = graft.functions.VecOps.dot($a, $b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongs =
    copy(left = newLeft, right = newRight)
}

/** Σ (a_i − b_i)² over two long arrays — the squared-distance kernel of
  * the PQ per-subspace encode and any future exact-d² path. Same null
  * contract as [[DotLongs]].
  */
case class L2Longs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_longs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long ${ev.value}_r = graft.functions.VecOps.l2($a, $b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Longs =
    copy(left = newLeft, right = newRight)
}

object VecOps {

  /** Integer dot product; java.lang.Long so null can signal the poison
    * cases (length mismatch, null element) exactly like the HOF form.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def l2(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}
