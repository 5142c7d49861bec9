package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-process operator — the reference's any-language UDF surface.
  *
  * Reference: Hadoop streaming `PipeMapRed` forks the user executable and
  * feeds `key \t value \n` lines over stdin, reading the same framing back
  * (`src/contrib/streaming/src/java/org/apache/hadoop/streaming/PipeMapRed.java:204-214`;
  * separator rules `PipeMapper.java:78-80`: a missing separator means the
  * whole line is the key and the value is empty).
  *
  * Spark shape: `rdd.pipe(cmd)` — identical fork model, one process per
  * partition, streaming both directions (no buffering of the partition in
  * memory). Scale: the external process is per-task; 1000 executors fork
  * 1000 pipelines, exactly like the reference's one-per-map-task.
  */
object Pipe {

  /** Pipe (key, value) rows through `cmd` as `key \t value` lines; parse
    * the output back with first-separator splitting.
    */
  def pipeKV(spark: SparkSession, df: DataFrame, cmd: String): DataFrame = {
    import spark.implicits._
    val lines = df.select(
      concat_ws("\t", col("key"), col("value")).as("line"))
      .as[String]
      .rdd
      .pipe(cmd)
    lines.toDF("line").select(
      substring_index(col("line"), "\t", 1).as("key"),
      when(instr(col("line"), "\t") > 0,
        expr("substring(line, instr(line, '\t') + 1)")).otherwise("").as("value"))
  }

  /** RawBytes pipe mode (`-io rawbytes`, `io/RawBytesOutputReader.java`):
    * length-prefixed key and value frames, no type tags — the fastest
    * binary interchange. Same fork/stream shape as typedbytes.
    */
  def pipeRawBytes(spark: SparkSession, df: DataFrame, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    val piped = df.select(col("key").cast("binary"), col("value").cast("binary"))
      .as[(Array[Byte], Array[Byte])]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val proc = new ProcessBuilder(cmd: _*)
            .redirectError(ProcessBuilder.Redirect.INHERIT) // drain stderr
            .start()
          val writer = new Thread(() => {
            val out = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(proc.getOutputStream))
            try {
              rows.foreach { case (k, v) =>
                out.writeInt(k.length); out.write(k)
                out.writeInt(v.length); out.write(v)
              }
              out.flush()
            } finally out.close()
          })
          writer.setDaemon(true)
          writer.start()
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(proc.getInputStream))
          def readFrame(): Array[Byte] = {
            val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); b
          }
          new Iterator[(Array[Byte], Array[Byte])] {
            private var pending: (Array[Byte], Array[Byte]) = _
            private var done = false
            private def advance(): Unit =
              if (!done && pending == null) {
                try pending = (readFrame(), readFrame())
                catch {
                  case _: java.io.EOFException =>
                    done = true; in.close()
                    val rc = proc.waitFor()
                    if (rc != 0)
                      throw new java.io.IOException(s"pipe command exited $rc")
                }
              }
            def hasNext: Boolean = { advance(); pending != null }
            def next(): (Array[Byte], Array[Byte]) = {
              advance(); val p = pending; pending = null; p
            }
          }
        }
      }
    piped.toDF("key", "value")
  }

  /** TypedBytes pipe mode (`-io typedbytes`): frame (key, value) records
    * with the TypedBytes codec over the child's stdin/stdout — binary-safe,
    * no line/separator ambiguity. A writer thread feeds stdin while the
    * task thread consumes stdout (both directions stream; neither side
    * buffers a partition).
    */
  def pipeTypedBytes(spark: SparkSession, df: DataFrame, cmd: Seq[String]): DataFrame = {
    import graft.functions.TypedBytes
    import spark.implicits._
    val piped = df.select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val proc = new ProcessBuilder(cmd: _*)
            .redirectError(ProcessBuilder.Redirect.INHERIT) // drain stderr
            .start()
          val writer = new Thread(() => {
            val out = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(proc.getOutputStream))
            try {
              rows.foreach { case (k, v) =>
                TypedBytes.write(out, k); TypedBytes.write(out, v)
              }
              out.flush()
            } finally out.close()
          })
          writer.setDaemon(true)
          writer.start()
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(proc.getInputStream))
          new Iterator[(String, String)] {
            private var pending: (String, String) = _
            private var done = false
            private def advance(): Unit =
              if (!done && pending == null) {
                try {
                  val k = TypedBytes.read(in).toString
                  val v = TypedBytes.read(in).toString
                  pending = (k, v)
                } catch {
                  case _: java.io.EOFException =>
                    done = true; in.close()
                    val rc = proc.waitFor()
                    if (rc != 0)
                      throw new java.io.IOException(s"pipe command exited $rc")
                }
              }
            def hasNext: Boolean = { advance(); pending != null }
            def next(): (String, String) = {
              advance(); val p = pending; pending = null; p
            }
          }
        }
      }
    piped.toDF("key", "value")
  }
}
