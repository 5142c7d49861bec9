package graft

import graft.functions.TypedBytes
import graft.queries.MiscQueries
import org.scalatest.funsuite.AnyFunSuite

class MiscSpec extends AnyFunSuite {

  test("typedbytes round-trips every supported type") {
    val rnd = new scala.util.Random(7)
    val samples: Seq[Any] = Seq(
      42, 42L, 3.5f, 2.75, true, false, "héllo \t world", "",
      Vector(1, "two", 3.0), Map("a" -> 1L, "b" -> Vector(false)),
      Vector.empty[Any])
    for (v <- samples) {
      val back = TypedBytes.decode(TypedBytes.encode(v))
      assert(back == v, s"round trip of $v")
    }
    // bytes compare by content
    val b = Array.tabulate(64)(i => (rnd.nextInt(256) - 128).toByte)
    assert(TypedBytes.decode(TypedBytes.encode(b))
      .asInstanceOf[Array[Byte]].toSeq == b.toSeq)
  }

  test("pi estimator converges (deterministic Halton)") {
    val df = MiscQueries.q48Pi.run(TestSpark.spark, TestSpark.sf0001)
    val est = df.collect()(0).getDouble(0)
    assert(math.abs(est - math.Pi) < 0.01, s"pi estimate $est")
  }

  test("typedbytes pipe round-trips records through an external process") {
    val spark = TestSpark.spark
    import spark.implicits._
    val kv = Seq(("k1", "v with \t tab"), ("k2", ""), ("k3", "väl"))
      .toDF("key", "value")
    val got = graft.operators.Pipe.pipeTypedBytes(spark, kv, Seq("/bin/cat"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("k1", "v with \t tab"), ("k2", ""), ("k3", "väl")))
  }

  test("pipe handles lines with no separator (whole line = key)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val kv = Seq(("only-key", "")).toDF("key", "value")
    val got = graft.operators.Pipe.pipeKV(spark, kv, "/bin/cat")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("only-key", "")))
  }
}
