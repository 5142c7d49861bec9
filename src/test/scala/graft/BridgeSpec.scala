package graft

import graft.core.TypeBridge
import graft.operators.DistCpLite
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

// top-level so product encoders resolve (method-local case classes
// have no TypeTag)
case class BridgeInner(tag: String, xs: Seq[Int])
case class BridgeRec(id: Long, inner: BridgeInner, m: Map[String, Double])

class BridgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writable class names map to Catalyst types") {
    assert(TypeBridge.toSparkType("org.apache.hadoop.io.Text") == StringType)
    assert(TypeBridge.toSparkType("org.apache.hadoop.io.LongWritable") == LongType)
    assert(TypeBridge.kvSchema(
      "org.apache.hadoop.io.Text", "org.apache.hadoop.io.IntWritable") ==
      StructType(Seq(StructField("key", StringType), StructField("value", IntegerType))))
    intercept[Exception](TypeBridge.toSparkType("com.example.Custom"))
  }

  test("record-DDL mapping: nested case classes round-trip as typed Datasets") {
    // SURVEY §1.2b: the reference's record-IO DDL (class records with
    // vector<T>/map<K,V>) = Scala case classes + product encoders
    import spark.implicits._
    val in = Seq(
      BridgeRec(1L, BridgeInner("a", Seq(1, 2)), Map("k" -> 0.5)),
      BridgeRec(2L, BridgeInner("b", Nil), Map.empty))
    val ds = spark.createDataset(in)
    assert(ds.schema.fieldNames.toSeq == Seq("id", "inner", "m"))
    assert(ds.collect().toSeq == in)
  }

  test("distcp copies a directory tree with -update skip semantics") {
    val src = java.nio.file.Files.createTempDirectory("graft-cp-src")
    val dst = java.nio.file.Files.createTempDirectory("graft-cp-dst").toString
    java.nio.file.Files.writeString(src.resolve("a.txt"), "hello")
    java.nio.file.Files.writeString(src.resolve("b.txt"), "world!")
    val first = DistCpLite.copy(spark, src.toString, dst)
    assert(first.copied == 2 && first.skipped == 0 && first.bytes == 11)
    val second = DistCpLite.copy(spark, src.toString, dst, update = true)
    assert(second.copied == 0 && second.skipped == 2)
    val third = DistCpLite.copy(spark, src.toString, dst) // overwrite mode
    assert(third.copied == 2)
  }
}
