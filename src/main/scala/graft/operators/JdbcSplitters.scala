package graft.operators

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Range splitters for JDBC scans over NON-numeric keys (SURVEY §2.2):
  * the reference partitions a `DBInputFormat` query over a VARCHAR or
  * DATE/TIMESTAMP column by interpolating split points between the
  * table's min and max key
  * (`src/mapred/org/apache/hadoop/mapreduce/lib/db/TextSplitter.java:220`,
  * `DateSplitter.java:177`). Spark's built-in JDBC partitioning only
  * accepts numeric/date bounds on `partitionColumn`; for a legacy table
  * whose ONLY key is a string there is no native split path — but Spark's
  * `read.jdbc(url, table, predicates, props)` runs one partition per
  * WHERE fragment, so these splitters emit the fragments and the scan
  * parallelizes exactly like the reference's.
  *
  * Text interpolation maps a string's leading chars into a fraction in
  * [0, 1) — digit i contributes `code / 65536^(i+1)` — splits that
  * interval evenly, and maps each split point back to a string. Same
  * shape as the reference; boundaries are merely *good* split points
  * (even key-space coverage, not even row counts — identical caveat to
  * the reference and to Spark's own numeric stride).
  */
object JdbcSplitters {

  private val Radix = JBigDecimal.valueOf(65536L)
  private val MaxChars = 8
  // 8 chars of 16-bit codes is a 2^-128 tail — ~128 decimal digits; 200
  // keeps toFraction/fromFraction an exact round trip with headroom
  private val Mc = new MathContext(200, RoundingMode.HALF_UP)

  /** Leading `MaxChars` chars (past `skip`) as a fraction in [0, 1). */
  private[graft] def toFraction(s: String, skip: Int): JBigDecimal = {
    var v = JBigDecimal.ZERO
    var place = JBigDecimal.ONE
    for (i <- skip until math.min(s.length, skip + MaxChars)) {
      place = place.divide(Radix, Mc)
      v = v.add(place.multiply(JBigDecimal.valueOf(s.charAt(i).toLong), Mc))
    }
    v
  }

  /** Inverse of [[toFraction]]: fraction → string of up to `MaxChars`
    * chars (NUL padding dropped — it can't round-trip through SQL).
    */
  private[graft] def fromFraction(f0: JBigDecimal): String = {
    val sb = new StringBuilder
    var f = f0
    var i = 0
    while (i < MaxChars && f.compareTo(JBigDecimal.ZERO) > 0) {
      f = f.multiply(Radix, Mc)
      val code = f.toBigInteger.intValueExact()
      f = f.subtract(new JBigDecimal(f.toBigInteger))
      if (code > 0) sb.append(code.toChar)
      i += 1
    }
    sb.toString
  }

  /** `n + 1` ordered boundary strings from `min` to `max` inclusive —
    * the shared prefix is kept verbatim and the first divergent chars are
    * interpolated (`TextSplitter.java:220`).
    */
  def textSplitPoints(min: String, max: String, n: Int): Seq[String] = {
    require(n >= 1, s"textSplitPoints: need n >= 1 (got $n)")
    require(min <= max, s"textSplitPoints: min '$min' > max '$max'")
    if (n == 1 || min == max) return Seq(min, max)
    val prefix = min.zip(max).takeWhile { case (a, b) => a == b }.map(_._1).mkString
    val lo = toFraction(min, prefix.length)
    val hi = toFraction(max, prefix.length)
    val step = hi.subtract(lo).divide(JBigDecimal.valueOf(n.toLong), Mc)
    val mids = (1 until n).map(i =>
      prefix + fromFraction(lo.add(step.multiply(JBigDecimal.valueOf(i.toLong), Mc))))
    // interpolation can collide at adjacent points when the key space is
    // tiny; dedup keeps boundaries strictly ordered (fewer, still-correct
    // partitions) instead of emitting empty or overlapping ranges
    (min +: mids :+ max).distinct.sorted
  }

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** One WHERE fragment per partition over a VARCHAR key: half-open
    * ranges, last range closed, plus `IS NULL` rows folded into the first
    * partition (the reference scans them too — dropping NULL-keyed rows
    * would be silent data loss).
    */
  def textPredicates(column: String, min: String, max: String, n: Int): Array[String] = {
    val bounds = textSplitPoints(min, max, n)
    val ranges = bounds.sliding(2).toVector
    ranges.zipWithIndex.map { case (Seq(a, b), i) =>
      val lo = s"$column >= ${sq(a)}"
      val hi = if (i == ranges.size - 1) s"$column <= ${sq(b)}" else s"$column < ${sq(b)}"
      val nulls = if (i == 0) s" OR $column IS NULL" else ""
      s"($lo AND $hi$nulls)"
    }.toArray
  }

  /** One WHERE fragment per partition over a DATE/TIMESTAMP key held as
    * epoch millis (`DateSplitter.java:177` splits on the numeric epoch
    * under the hood): even strides, last range closed, NULLs in the first
    * partition. `render` turns a boundary's millis into the dialect's
    * literal (Derby: `TIMESTAMP('yyyy-MM-dd HH:mm:ss')`).
    */
  def datePredicates(column: String, minMillis: Long, maxMillis: Long, n: Int,
                     render: Long => String): Array[String] = {
    require(n >= 1 && minMillis <= maxMillis,
      s"datePredicates: bad bounds ($minMillis, $maxMillis) or n=$n")
    val k = math.min(n.toLong, math.max(1L, maxMillis - minMillis)).toInt
    val step = (maxMillis - minMillis) / k.toDouble
    val bounds = (0 until k).map(i => minMillis + math.round(i * step)) :+ maxMillis
    bounds.sliding(2).toVector.zipWithIndex.map { case (Seq(a, b), i) =>
      val lo = s"$column >= ${render(a)}"
      val hi = if (i == k - 1) s"$column <= ${render(b)}" else s"$column < ${render(b)}"
      val nulls = if (i == 0) s" OR $column IS NULL" else ""
      s"($lo AND $hi$nulls)"
    }.toArray
  }

  /** One WHERE fragment per partition over a FLOAT/DOUBLE key
    * (`FloatSplitter.java:46`): even strides of `(max − min)/n` with the
    * reference's minimum increment (10000·Double.MIN_VALUE) so a
    * degenerate range still terminates; half-open ranges, last range
    * closed, NULLs folded into the first partition. One deliberate
    * divergence: the reference's final split lower-bounds at `curUpper`
    * (`FloatSplitter.java:92`), which skips the rows in
    * `[curLower, curUpper)` of the last stride — a coverage gap, not a
    * semantic we reproduce; the last range here starts at the previous
    * boundary, so the union of fragments covers `[min, max]` exactly.
    */
  def floatPredicates(column: String, min: Double, max: Double, n: Int): Array[String] = {
    require(n >= 1 && !min.isNaN && !max.isNaN && min <= max,
      s"floatPredicates: bad bounds ($min, $max) or n=$n")
    val minIncrement = 10000 * java.lang.Double.MIN_VALUE
    val splitSize = math.max((max - min) / n, minIncrement)
    val bounds = scala.collection.mutable.ArrayBuffer(min)
    var cur = min + splitSize
    while (cur < max) { bounds += cur; cur += splitSize }
    bounds += max
    val ranges = bounds.toVector.sliding(2).toVector
    ranges.zipWithIndex.map { case (Seq(a, b), i) =>
      val lo = s"$column >= $a"
      val hi = if (i == ranges.size - 1) s"$column <= $b" else s"$column < $b"
      val nulls = if (i == 0) s" OR $column IS NULL" else ""
      s"($lo AND $hi$nulls)"
    }.toArray
  }

  /** One WHERE fragment per partition over a BOOLEAN key
    * (`BooleanSplitter.java:40`): at most two value splits — `= FALSE`
    * when the min is false, `= TRUE` when the max is true — with NULLs
    * folded into the first fragment (the reference emits them as a third
    * split; a partition is a WHERE fragment either way, and dropping
    * NULL-keyed rows would be silent data loss).
    */
  def booleanPredicates(column: String, min: Boolean, max: Boolean): Array[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!min) parts += s"$column = FALSE"
    if (max) parts += s"$column = TRUE"
    if (parts.isEmpty) parts += s"$column IS NULL" // all-null bounding query
    parts(0) = s"(${parts(0)} OR $column IS NULL)"
    parts.toArray
  }

  /** Oracle pre-12c row-window pagination (`OracleDBRecordReader.java:
    * 85-96`): Oracle has no LIMIT/OFFSET, so a positional split wraps the
    * inner query twice — the inner ROWNUM alias freezes row numbers
    * before the outer range predicate (a bare `ROWNUM >= k` can never be
    * true for k > 1, since ROWNUM is assigned AS rows qualify).
    * Reproduced verbatim, including two reference quirks, both cited:
    * `start = 0 or length = 0` leaves the query unwrapped (the reader's
    * own row-count stop bounds split 0), and the window admits row
    * `start` itself where the LIMIT/OFFSET path starts at `start + 1` —
    * a one-row overlap between adjacent splits that the reader's stop
    * masks. Spark's JDBC source takes these fragments via predicate
    * pushdown exactly like the value splitters above.
    */
  def oracleRownumQuery(inner: String, start: Long, length: Long): String =
    if (length > 0 && start > 0)
      s"SELECT * FROM (SELECT a.*,ROWNUM dbif_rno FROM ( $inner ) a " +
        s"WHERE rownum <= $start + $length ) WHERE dbif_rno >= $start"
    else inner
}
