package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering (operators/ZOrder.scala): the interleave math
  * against a bit-twiddling reference, and the layout property that
  * motivates it — a z-range-partitioned table bounds its partition
  * envelopes in BOTH dimensions, so a single-dimension or box predicate
  * prunes partitions where a linear sort on the other column cannot.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference Morton interleave in plain Scala. */
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the reference interleave (and masks high bits)") {
    import spark.implicits._
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 2L), (999999L, 888888L))
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == morton(x & 0xFFFFL, y & 0xFFFFL, 16),
        s"interleave($x, $y) = $z != reference")
    }
    // the generated SQL text is the same function: evaluate it via Spark SQL
    import spark.implicits._
    val sqlZ = samples.toDF("x", "y")
      .selectExpr(s"${ZOrder.zValueSql("x", "y", 16)} AS z")
      .as[Long].collect()
    assert(sqlZ.toSeq == got.map(_._3).toSeq, "zValueSql diverged from zValue")
  }

  test("z layout bounds partition envelopes in both dimensions; linear sort does not") {
    import spark.implicits._
    // a full 100x100 grid: every (x, y) combination once
    val grid = spark.range(0, 10000)
      .select((col("id") / 100).cast("long").as("x"),
        (col("id") % 100).cast("long").as("y"))
    val z = ZOrder.layout(grid, col("x"), col("y"), bits = 7, partitions = 16)
      .localCheckpoint()
    val linear = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")).localCheckpoint()
    assert(z.count() == 10000L, "layout lost rows")
    val zEnv = ZOrder.partitionEnvelopes(z, col("x"), col("y"))
    val linEnv = ZOrder.partitionEnvelopes(linear, col("x"), col("y"))
    // a thin y-band (no x constraint): the x-sorted layout scans EVERY
    // partition (each holds the full y range); the z layout's envelopes
    // are boxes, so most partitions miss the band entirely
    val zBand = ZOrder.touchedPartitions(zEnv, 0L, 99L, 0L, 12L)
    val linBand = ZOrder.touchedPartitions(linEnv, 0L, 99L, 0L, 12L)
    info(s"y-band touch: z=$zBand/16 linear=$linBand/16")
    assert(linBand == linEnv.length, "x-sort should be useless for a y-band")
    assert(zBand <= 8, s"z layout should prune most partitions for a y-band, touched $zBand")
    // and the symmetric x-band still prunes under z (both dims bounded)
    val zX = ZOrder.touchedPartitions(zEnv, 0L, 12L, 0L, 99L)
    info(s"x-band touch: z=$zX/16")
    assert(zX <= 8, s"z layout should prune most partitions for an x-band, touched $zX")
    // a small 2-D box touches a handful of z partitions
    val zBox = ZOrder.touchedPartitions(zEnv, 10L, 19L, 10L, 19L)
    info(s"10x10 box touch: z=$zBox/16")
    assert(zBox <= 4, s"z layout should localize a small box, touched $zBox")
  }
}
