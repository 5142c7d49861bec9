package graft.operators

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Unix `sort -k`-style key-field sort/partition spec.
  *
  * Reference: `KeyFieldBasedComparator` + `KeyFieldBasedPartitioner` +
  * `KeyFieldHelper` (`src/mapred/org/apache/hadoop/mapred/lib/
  * KeyFieldHelper.java:23-39`): a spec is one or more `-k pos1[,pos2]`
  * groups, `pos = f[.c][opts]`, fields and chars 1-based, opts `n`
  * (numeric) and `r` (reverse).
  *
  * Compiled to `Column`s: sort = `df.orderBy(sortColumns(...))` (Spark's
  * RangePartitioner replaces TotalOrderPartitioner + InputSampler, SURVEY
  * §2.6), partition = `df.repartition(n, partitionColumns(...))` (hash of
  * the selected fields, `KeyFieldBasedPartitioner.java:53-56`).
  *
  * Full spec support, including multi-field groups with char offsets on
  * both ends (`-k2.2,4.3`) and the `pos2` char-0 = end-of-field default.
  */
object KeyFieldSpec {

  final case class KeySpec(
      startField: Int, startChar: Int,
      endField: Option[Int], endChar: Option[Int],
      numeric: Boolean, reverse: Boolean)

  private val Group = ("""-k\s*(\d+)(?:\.(\d+))?([nr]*)""" +
    """(?:,(\d+)(?:\.(\d+))?([nr]*))?""").r

  def parse(spec: String): Seq[KeySpec] =
    Group.findAllMatchIn(spec).map { m =>
      val opts = Option(m.group(3)).getOrElse("") +
        Option(m.group(6)).getOrElse("")
      KeySpec(
        startField = m.group(1).toInt,
        startChar = Option(m.group(2)).map(_.toInt).getOrElse(1),
        endField = Option(m.group(4)).map(_.toInt),
        endChar = Option(m.group(5)).map(_.toInt),
        numeric = opts.contains('n'),
        reverse = opts.contains('r'))
    }.toVector

  /** Leading-number parse for `n` (sort -n semantics: skip leading blanks,
    * ignore trailing garbage, missing number sorts as 0 —
    * `KeyFieldBasedComparator` numerical compare).
    */
  private def numericKey(s: Column): Column =
    coalesce(
      nullif(regexp_extract(s, "^[ \\t]*([-+]?\\d*\\.?\\d+)", 1), lit("")).cast("double"),
      lit(0.0))

  /** The raw text of one `-k` group extracted from a line, with full
    * `KeyFieldHelper` semantics: the key spans from (field f1, char c1) to
    * (field f2, char c2) inclusive over the separator-joined field bytes;
    * `c2 = 0` (or omitted) means the end of field f2
    * (`KeyFieldHelper.java:31-39`).
    */
  def extract(line: Column, sep: String, k: KeySpec): Column = {
    val arr = split(line, Pattern.quote(sep))
    val joined = k.endField match {
      case None =>
        array_join(slice(arr, lit(k.startField),
          greatest(size(arr) - k.startField + 1, lit(0))), sep)
      case Some(ef) =>
        array_join(slice(arr, lit(k.startField),
          lit(math.max(ef - k.startField + 1, 0))), sep)
    }
    val endPos = (k.endField, k.endChar) match {
      case (Some(ef), Some(c2)) if c2 > 0 =>
        // position of char c2 of the LAST field within the joined string
        length(joined) - coalesce(length(get(arr, lit(ef - 1))), lit(0)) + c2
      case _ => length(joined) // c2 = 0 / omitted: end of field
    }
    substring(joined, lit(k.startChar),
      greatest(endPos - k.startChar + 1, lit(0)))
  }

  /** Ordering columns for `orderBy`. */
  def sortColumns(line: Column, sep: String, spec: String): Seq[Column] =
    parse(spec).map { k =>
      val c = if (k.numeric) numericKey(extract(line, sep, k)) else extract(line, sep, k)
      if (k.reverse) c.desc else c.asc
    }

  /** Plain (unordered) key columns — for `repartition(n, cols)` routing. */
  def partitionColumns(line: Column, sep: String, spec: String): Seq[Column] =
    parse(spec).map(extract(line, sep, _))
}
