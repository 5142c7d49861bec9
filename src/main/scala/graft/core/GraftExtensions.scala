package graft.core

import graft.functions.{Md5Word, Md5Words}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_hash32(x)")`
  * and the Column API share one implementation. Enable with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * This is the (c) tier of SURVEY §7.3's custom-operator ladder — used
  * only for expressions with proven hot-path value ([[Md5Word]]); all
  * other operators stay composed builtins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_hash32"),
      new ExpressionInfo(classOf[Md5Word].getName, "graft_hash32",
        "graft_hash32(str[, word]) - unsigned 32-bit word of md5(str), portable across engines"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => Md5Word(c, 0)
        case Seq(c, w) =>
          val word = w match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
                if v != null && v.toString.matches("[0-3]") => v.toString.toInt
            case _ => throw new IllegalArgumentException(
              "graft_hash32 word must be an integer literal in [0, 3]")
          }
          Md5Word(c, word)
        case _ => throw new IllegalArgumentException(
          "graft_hash32 expects (str) or (str, word)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_words"),
      new ExpressionInfo(classOf[Md5Words].getName, "graft_md5_words",
        "graft_md5_words(str) - all four unsigned 32-bit words of md5(str) as array<bigint>, one digest"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => Md5Words(c)
        case _ => throw new IllegalArgumentException(
          "graft_md5_words expects (str)")
      }))
  }
}
