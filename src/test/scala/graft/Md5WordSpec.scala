package graft

import graft.functions.{Hashing, Md5Word}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Md5WordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native Md5Word equals the builtin conv(substring(md5)) chain") {
    val rnd = new scala.util.Random(11)
    val strs = Seq("", "a", "héllo wörld", "x:tab\tnl\n") ++
      Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
    val df = strs.toDF("s")
    for (w <- 0 until 4) {
      val got = df.select(
        Md5Word(col("s"), w).as("native"),
        conv(substring(md5(col("s")), 1 + 8 * w, 8), 16, 10).cast("long").as("builtin"))
      assert(got.filter(col("native") =!= col("builtin")).count() == 0,
        s"word $w mismatch")
    }
  }

  test("hash32Family: chained digests give independent members past 8") {
    val rnd = new scala.util.Random(23)
    val strs = Seq.fill(40)(rnd.alphanumeric.take(12).mkString)
    val df = strs.toDF("s")
    val n = 24 // three digest groups beyond the original two
    val row = df.select((0 until n).map(i =>
      Hashing.hash32Family(col("s"), i).as(s"h$i")): _*).collect()
    // no two family members may agree across the sample (independence
    // would be broken by e.g. group-prefix collisions)
    for (i <- 0 until n; j <- (i + 1) until n) {
      val same = row.count(r => r.getLong(i) == r.getLong(j))
      assert(same == 0, s"families $i and $j collide on $same/40 inputs")
    }
    // group g >= 1 must equal the documented seeded-digest formula
    val mismatch = df.select(
      Hashing.hash32Family(col("s"), 9).as("fam"),
      conv(substring(md5(concat(lit("2:"), col("s"))), 1 + 8 * 1, 8), 16, 10)
        .cast("long").as("formula"))
      .filter(col("fam") =!= col("formula")).count()
    assert(mismatch == 0)
    assertThrows[IllegalArgumentException](Hashing.hash32Family(col("s"), -1))
  }

  test("Md5Words array equals the four Md5Word scalars (one digest)") {
    val rnd = new scala.util.Random(31)
    val df = (Seq("", "x") ++ Seq.fill(30)(
      rnd.alphanumeric.take(rnd.nextInt(20)).mkString)).toDF("s")
    val bad = df.select(
      graft.functions.Md5Words(col("s")).as("arr"),
      array((0 until 4).map(w => graft.functions.Md5Word(col("s"), w)): _*).as("scalars"))
      .filter(col("arr") =!= col("scalars")).count()
    assert(bad == 0)
  }

  test("NgramMinHash equals the higher-order transform formulation") {
    val rnd = new scala.util.Random(47)
    val strs = Seq("", "short", "exactly8", "héllo wörld unicode text ok",
      "x" * 7) ++
      Seq.fill(40)(rnd.alphanumeric.take(rnd.nextInt(60)).mkString)
    val df = strs.toDF("s")
    val grams = when(length(col("s")) >= 8,
      expr("transform(sequence(1, length(s) - 7), i -> substring(s, i, 8))"))
      .otherwise(array().cast("array<string>"))
    val bad = df.select(
      graft.functions.NgramMinHash(col("s"), 8).as("fast"),
      array_min(transform(grams, g => Hashing.hash32(g))).as("slow"))
      .filter(!(col("fast") <=> col("slow"))).count()
    assert(bad == 0)
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("abc").toDF("s")
    val viaPlan = df.select(Md5Word(col("s"), 1)).head().getLong(0)
    val direct = Md5Word.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), 1)
    assert(viaPlan == direct)
  }
}
