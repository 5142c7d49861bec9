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
  * Supported subset: char offsets on the start position always; an end char
  * offset only when the group covers a single field (multi-field end-char
  * slicing needs record-length arithmetic the library defers until a
  * workload needs it).
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

  /** Leading-number parse for `n` (sort -n semantics: ignore trailing
    * garbage, missing number sorts as 0 — `KeyFieldBasedComparator`
    * numerical compare).
    */
  private def numericKey(s: Column): Column =
    coalesce(
      nullif(regexp_extract(s, "^[-+]?\\d*\\.?\\d+", 0), lit("")).cast("double"),
      lit(0.0))

  /** The raw text of one `-k` group extracted from a line. */
  def extract(line: Column, sep: String, k: KeySpec): Column = {
    val arr = split(line, Pattern.quote(sep))
    val endF = k.endField.getOrElse(Int.MaxValue)
    val joined =
      if (k.startField == endF) get(arr, lit(k.startField - 1))
      else if (k.endField.isEmpty)
        array_join(slice(arr, lit(k.startField), greatest(size(arr) - k.startField + 1, lit(0))), sep)
      else array_join(slice(arr, k.startField, endF - k.startField + 1), sep)
    val fromChar =
      if (k.startChar > 1) substring(joined, k.startChar, Int.MaxValue) else joined
    (k.endChar, k.endField) match {
      case (Some(ec), Some(ef)) if ef == k.startField =>
        substring(joined, k.startChar, ec - k.startChar + 1)
      case _ => fromChar
    }
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
