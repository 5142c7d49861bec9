package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite join framework: the reference's map-side merge join semantics
  * (`mapred.join`) re-expressed declaratively.
  *
  * Reference: `CompositeInputFormat` expression DSL
  * (`src/mapred/org/apache/hadoop/mapred/join/CompositeInputFormat.java:57-66`,
  * grammar in `Parser.java`), record readers `InnerJoinRecordReader.java:41`
  * (emit only when all sources have the key), `OuterJoinRecordReader.java:41`
  * (emit when any source has it; absent positions unset in the
  * `TupleWritable.java:43` presence bitmask), `OverrideRecordReader.java:36`
  * (rightmost source holding the key wins).
  *
  * The reference runs these map-side over identically-partitioned pre-sorted
  * files; Spark's equivalent physical plan is a sort-merge join (bucketed
  * tables co-locate it) or a broadcast join for small sides — Catalyst picks,
  * and AQE re-picks at runtime. Semantics preserved here:
  *  - duplicate keys → full cross product per key (Spark join semantics);
  *  - `outer` keeps per-source null-vs-absent: each source's value sits in
  *    its own nullable column, null ⇔ absent (the bitmask re-expressed);
  *  - `override` = rightmost-wins via `coalesce(vN … v1)`.
  *
  * Each source is a `DataFrame` with a key column `k` and a value column `v`
  * (struct for compound values). Compositions return the same shape, so
  * expressions nest exactly like the reference's
  * `outer(inner(tbl(A),tbl(B)),tbl(C))`.
  */
object Joins {

  /** Normalize a source: key expr + value expr → canonical (k, v) frame. */
  def source(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("k"), value.as("v"))

  private def chain(dfs: Seq[DataFrame], joinType: String): DataFrame = {
    require(dfs.size >= 2, "composite join needs >= 2 sources")
    val aliased = dfs.zipWithIndex.map { case (d, i) =>
      d.select(col("k").as(s"k$i"), col("v").as(s"v$i"))
    }
    val joined = aliased.zipWithIndex.tail.foldLeft(aliased.head) {
      case (acc, (d, i)) =>
        // join on the coalesced key-so-far so full_outer chains associate
        val accKey = coalesce((0 until i).map(j => col(s"k$j")): _*)
        acc.join(d, accKey === d(s"k$i"), joinType)
    }
    val n = dfs.size
    val key = coalesce((0 until n).map(i => col(s"k$i")): _*)
    joined.select(key.as("k") +: (0 until n).map(i => col(s"v$i")): _*)
  }

  /** `inner(...)`: emit a tuple only when every source has the key. */
  def inner(dfs: DataFrame*): DataFrame = {
    val j = chain(dfs, "inner")
    j.select(col("k"), struct(dfs.indices.map(i => col(s"v$i").as(s"v$i")): _*).as("v"))
  }

  /** `outer(...)`: emit when any source has the key; absent → null field. */
  def outer(dfs: DataFrame*): DataFrame = {
    val j = chain(dfs, "full_outer")
    j.select(col("k"), struct(dfs.indices.map(i => col(s"v$i").as(s"v$i")): _*).as("v"))
  }

  /** `override(...)`: value from the rightmost source holding the key. */
  def overrideJoin(dfs: DataFrame*): DataFrame = {
    val j = chain(dfs, "full_outer")
    j.select(col("k"), coalesce(dfs.indices.reverse.map(i => col(s"v$i")): _*).as("v"))
  }

  // ---- expression DSL -----------------------------------------------------

  sealed trait Expr
  final case class Tbl(name: String) extends Expr
  final case class Op(op: String, args: Seq[Expr]) extends Expr

  /** Parse the reference's join expression: `inner(tbl(a),outer(tbl(b),tbl(c)))`.
    * `tbl(name)` leaves resolve through the caller's source map (the
    * reference's version carries an InputFormat + path; ours names a
    * pre-normalized (k, v) frame).
    */
  def parse(s: String): Expr = {
    val (e, rest) = parseExpr(s.replaceAll("\\s+", ""))
    require(rest.isEmpty, s"trailing input: '$rest'")
    e
  }

  private def parseExpr(s: String): (Expr, String) = {
    val open = s.indexOf('(')
    require(open > 0, s"expected op(...) at '$s'")
    val op = s.substring(0, open)
    if (op == "tbl") {
      val close = s.indexOf(')', open)
      (Tbl(s.substring(open + 1, close)), s.substring(close + 1))
    } else {
      require(Set("inner", "outer", "override")(op), s"unknown op '$op'")
      var rest = s.substring(open + 1)
      val args = Seq.newBuilder[Expr]
      var done = false
      while (!done) {
        val (a, r) = parseExpr(rest)
        args += a
        if (r.startsWith(",")) rest = r.substring(1)
        else { require(r.startsWith(")"), s"expected ) at '$r'"); rest = r.substring(1); done = true }
      }
      (Op(op, args.result()), rest)
    }
  }

  /** Compile a parsed expression against named (k, v) sources. */
  def compile(e: Expr, sources: Map[String, DataFrame]): DataFrame = e match {
    case Tbl(n) => sources.getOrElse(n, sys.error(s"unknown source '$n'"))
    case Op(op, args) =>
      val dfs = args.map(compile(_, sources))
      op match {
        case "inner"    => inner(dfs: _*)
        case "outer"    => outer(dfs: _*)
        case "override" => overrideJoin(dfs: _*)
      }
  }

  def run(expr: String, sources: Map[String, DataFrame]): DataFrame =
    compile(parse(expr), sources)
}
