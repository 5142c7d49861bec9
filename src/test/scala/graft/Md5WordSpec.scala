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

  test("codegen and interpreted paths agree") {
    val df = Seq("abc").toDF("s")
    val viaPlan = df.select(Md5Word(col("s"), 1)).head().getLong(0)
    val direct = Md5Word.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), 1)
    assert(viaPlan == direct)
  }
}
