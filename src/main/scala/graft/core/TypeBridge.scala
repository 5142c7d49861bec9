package graft.core

import org.apache.spark.sql.types._

/** Writable ⇄ Catalyst type bridge (SURVEY §1.2a): the reference declares
  * schemas as Writable classes per job (`JobConf.setOutputKeyClass`,
  * `src/mapred/org/apache/hadoop/mapred/JobConf.java`); this maps those
  * class names onto Spark SQL types so SequenceFile-era K/V metadata
  * translates into DataFrame schemas. Class names are strings on purpose —
  * the bridge describes legacy data without linking against it.
  */
object TypeBridge {

  private val byName: Map[String, DataType] = Map(
    "org.apache.hadoop.io.BooleanWritable" -> BooleanType,
    "org.apache.hadoop.io.ByteWritable" -> ByteType,
    "org.apache.hadoop.io.IntWritable" -> IntegerType,
    "org.apache.hadoop.io.VIntWritable" -> IntegerType,
    "org.apache.hadoop.io.LongWritable" -> LongType,
    "org.apache.hadoop.io.VLongWritable" -> LongType,
    "org.apache.hadoop.io.FloatWritable" -> FloatType,
    "org.apache.hadoop.io.DoubleWritable" -> DoubleType,
    "org.apache.hadoop.io.Text" -> StringType,
    "org.apache.hadoop.io.UTF8" -> StringType,
    "org.apache.hadoop.io.BytesWritable" -> BinaryType,
    "org.apache.hadoop.io.MD5Hash" -> BinaryType,
    "org.apache.hadoop.io.NullWritable" -> NullType)

  /** Spark SQL type for a Writable class name; arrays/maps compose. */
  def toSparkType(writableClass: String): DataType =
    byName.getOrElse(writableClass,
      sys.error(s"no Catalyst mapping for Writable '$writableClass' " +
        "(compound Writables map to StructType/ArrayType/MapType by composition)"))

  /** K/V schema for a SequenceFile declared with the given classes. */
  def kvSchema(keyClass: String, valueClass: String): StructType =
    StructType(Seq(
      StructField("key", toSparkType(keyClass), nullable = true),
      StructField("value", toSparkType(valueClass), nullable = true)))
}
