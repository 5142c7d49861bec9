package graft.operators

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The field-selection projection DSL (`cut`-style).
  *
  * Reference: `FieldSelectionMapReduce` / `FieldSelectionHelper`
  * (`src/mapred/org/apache/hadoop/mapred/lib/FieldSelectionMapReduce.java`,
  * spec parser `src/mapred/org/apache/hadoop/mapreduce/lib/fieldsel/
  * FieldSelectionHelper.java:60-79,116`). A spec like `"6,5,1-3:0-"` splits
  * each record on a separator and re-emits selected fields as key and value:
  * comma-separated 0-based field ids, closed ranges `a-b`, and open ranges
  * `a-` (field a through end of record). `:` separates the key spec from the
  * value spec.
  *
  * This front-end parses the spec once on the driver and emits a pure
  * `Column` tree (split / slice / concat / array_join) — fully codegen'd,
  * no UDF, so selection stays inside WholeStageCodegen and pushes through
  * the whole plan.
  */
object FieldSelection {

  sealed trait Part
  final case class Single(i: Int) extends Part
  final case class Closed(a: Int, b: Int) extends Part // inclusive
  final case class Open(a: Int) extends Part // a..end

  final case class Spec(key: Seq[Part], value: Seq[Part])

  /** Parse `"keyspec:valuespec"`; either side may be empty. */
  def parse(spec: String): Spec = {
    val (k, v) = spec.indexOf(':') match {
      case -1 => (spec, "")
      case i  => (spec.substring(0, i), spec.substring(i + 1))
    }
    Spec(parseList(k), parseList(v))
  }

  private def parseList(s: String): Seq[Part] =
    s.split(",").toIndexedSeq.filter(_.nonEmpty).map {
      case p if p.endsWith("-") => Open(p.dropRight(1).toInt)
      case p if p.contains("-") =>
        val Array(a, b) = p.split("-", 2); Closed(a.toInt, b.toInt)
      case p => Single(p.toInt)
    }

  /** The selected fields of one side as an array column. Out-of-range
    * fields are skipped, matching the reference's behavior on short records.
    */
  private def fieldsOf(arr: Column, parts: Seq[Part]): Column = {
    val pieces: Seq[Column] = parts.map {
      case Single(i) =>
        when(size(arr) > i, array(get(arr, lit(i)))).otherwise(array())
      case Closed(a, b) =>
        when(size(arr) > a, slice(arr, a + 1, b - a + 1)).otherwise(array())
      case Open(a) =>
        when(size(arr) > a, slice(arr, lit(a + 1), size(arr) - a)).otherwise(array())
    }
    if (pieces.isEmpty) array() else flatten(array(pieces: _*))
  }

  /** Apply a spec to a line column: returns (key, value) string columns,
    * fields re-joined with the same separator (reference emits
    * `key \t value` downstream; the join separator is the field separator).
    */
  def project(line: Column, sep: String, spec: String): (Column, Column) = {
    val s = parse(spec)
    val arr = split(line, Pattern.quote(sep))
    (array_join(fieldsOf(arr, s.key), sep),
     array_join(fieldsOf(arr, s.value), sep))
  }
}
