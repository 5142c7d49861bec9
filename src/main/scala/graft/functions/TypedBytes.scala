package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** TypedBytes wire codec — the reference's streaming interchange format
  * (`src/contrib/streaming/src/java/org/apache/hadoop/typedbytes/package.html`;
  * `TypedBytesOutput.java`, `TypedBytesInput.java`): tagged values with
  * 1-byte type codes. Used by the pipe operator's `-io typedbytes` mode so
  * external processes exchange typed records instead of text lines.
  *
  * Supported: bytes(0), byte(1), bool(2), int(3), long(4), float(5),
  * double(6), string(7, UTF-8 with int length), vector(8, int count then
  * elements), map(10). Scala values map as: Array[Byte], Byte, Boolean,
  * Int, Long, Float, Double, String, Vector[Any], Map[Any, Any].
  */
object TypedBytes {

  def encode(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(new DataOutputStream(bos), v)
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): Any =
    read(new DataInputStream(new ByteArrayInputStream(bytes)))

  def write(out: DataOutputStream, v: Any): Unit = v match {
    case b: Array[Byte] => out.writeByte(0); out.writeInt(b.length); out.write(b)
    case b: Byte        => out.writeByte(1); out.writeByte(b.toInt)
    case b: Boolean     => out.writeByte(2); out.writeBoolean(b)
    case i: Int         => out.writeByte(3); out.writeInt(i)
    case l: Long        => out.writeByte(4); out.writeLong(l)
    case f: Float       => out.writeByte(5); out.writeFloat(f)
    case d: Double      => out.writeByte(6); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes("UTF-8")
      out.writeByte(7); out.writeInt(b.length); out.write(b)
    case xs: Vector[_] =>
      out.writeByte(8); out.writeInt(xs.size); xs.foreach(write(out, _))
    case m: Map[_, _] =>
      out.writeByte(10); out.writeInt(m.size)
      m.foreach { case (k, x) => write(out, k); write(out, x) }
    case other => sys.error(s"typedbytes: unsupported ${other.getClass}")
  }

  /** RawBytes framing (`io/RawBytesOutputReader.java`): no type tag, just
    * int length + payload — the fastest pipe interchange mode.
    */
  def encodeRaw(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length); out.write(b)
    bos.toByteArray
  }

  def decodeRaw(bytes: Array[Byte]): Array[Byte] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); b
  }

  def read(in: DataInputStream): Any = in.readByte() match {
    case 0 => val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); b
    case 1 => in.readByte()
    case 2 => in.readBoolean()
    case 3 => in.readInt()
    case 4 => in.readLong()
    case 5 => in.readFloat()
    case 6 => in.readDouble()
    case 7 => val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); new String(b, "UTF-8")
    case 8 => val n = in.readInt(); Vector.fill(n)(read(in))
    case 10 => val n = in.readInt(); (0 until n).map(_ => (read(in), read(in))).toMap
    case t => sys.error(s"typedbytes: unknown tag $t")
  }
}
