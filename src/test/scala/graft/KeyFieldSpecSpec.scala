package graft

import graft.operators.KeyFieldSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Spec cases mirror `TestKeyFieldHelper` / `KeyFieldHelper.java:23-39`. */
class KeyFieldSpecSpec extends AnyFunSuite {

  test("parse '-k2,2n -k1r'") {
    val ks = KeyFieldSpec.parse("-k2,2n -k1r")
    assert(ks.size == 2)
    assert(ks(0).startField == 2 && ks(0).endField.contains(2) && ks(0).numeric && !ks(0).reverse)
    assert(ks(1).startField == 1 && ks(1).endField.isEmpty && ks(1).reverse && !ks(1).numeric)
  }

  test("parse char offsets '-k2.2,2.4'") {
    val ks = KeyFieldSpec.parse("-k2.2,2.4")
    assert(ks.head.startChar == 2 && ks.head.endChar.contains(4))
  }

  test("numeric sort skips leading blanks (sort -n)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("a\t  30", "b\t4", "c\t 12").toDF("line")
    val cols = KeyFieldSpec.sortColumns(col("line"), "\t", "-k2,2n")
    val got = df.orderBy(cols: _*).select(col("line")).as[String].collect().toSeq
    assert(got == Seq("b\t4", "c\t 12", "a\t  30"))
  }

  test("numeric sort ignores trailing garbage, missing number is 0") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("b\t10x", "a\t9", "c\t", "d\t-2.5z").toDF("line")
    val cols = KeyFieldSpec.sortColumns(col("line"), "\t", "-k2,2n")
    val got = df.orderBy(cols: _*).select(col("line")).as[String].collect().toSeq
    assert(got == Seq("d\t-2.5z", "c\t", "a\t9", "b\t10x"))
  }

  test("reverse string sort on field 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("a\t1", "c\t2", "b\t3").toDF("line")
    val cols = KeyFieldSpec.sortColumns(col("line"), "\t", "-k1r")
    val got = df.orderBy(cols: _*).select(col("line")).as[String].collect().toSeq
    assert(got == Seq("c\t2", "b\t3", "a\t1"))
  }

  test("multi-field span with char offsets '-k2.2,4.3'") {
    val spark = TestSpark.spark
    import spark.implicits._
    // fields: f1 f2 f3 f4; key = chars 2.. of f2 through char 3 of f4,
    // over the joined "f2-f3-f4" bytes
    val df = Seq("w-abc-xy-pqrs").toDF("line")
    val k = KeyFieldSpec.parse("-k2.2,4.3").head
    val got = df.select(KeyFieldSpec.extract(col("line"), "-", k)).as[String].head()
    assert(got == "bc-xy-pqr")
  }

  test("pos2 char 0 means end of field: '-k2,3.0' == '-k2,3'") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("a-bb-ccc-d").toDF("line")
    val k1 = KeyFieldSpec.parse("-k2,3.0").head
    val k2 = KeyFieldSpec.parse("-k2,3").head
    val g1 = df.select(KeyFieldSpec.extract(col("line"), "-", k1)).as[String].head()
    val g2 = df.select(KeyFieldSpec.extract(col("line"), "-", k2)).as[String].head()
    assert(g1 == "bb-ccc" && g2 == "bb-ccc")
  }

  test("char-offset slice within a single field '-k1.2,1.3'") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("zab\t1", "xzz\t2", "ayc\t3").toDF("line")
    val cols = KeyFieldSpec.sortColumns(col("line"), "\t", "-k1.2,1.3")
    // keys: "ab", "zz", "yc" → ab < yc < zz
    val got = df.orderBy(cols: _*).select(col("line")).as[String].collect().toSeq
    assert(got == Seq("zab\t1", "ayc\t3", "xzz\t2"))
  }
}
