package graft.core

import org.apache.spark.sql.types._

/** Parser for the reference's record-DDL (`.jr`) schema language
  * (`src/core/org/apache/hadoop/record/package.html:136-166`, fixtures
  * the `.jr` files under `src/test/ddl`): `module` blocks of `class`
  * declarations whose
  * fields are the primitives byte/boolean/int/long/float/double/ustring/
  * buffer, the composites `vector<T>` / `map<K,V>`, and references to
  * previously declared record classes. Comments (`//`, multi-line) are
  * allowed anywhere.
  *
  * Output is Catalyst schemas: each class becomes a `StructType` (field
  * order preserved), nested record references become nested structs —
  * the reference's generated Java/C++ record classes map onto Dataset
  * rows instead. `caseClassSource` emits the equivalent Scala case class
  * for users who want typed `Dataset[T]` code generated from legacy DDL.
  */
object RecordDDL {

  final case class Module(name: String, classes: Vector[(String, StructType)])

  private val primitives: Map[String, DataType] = Map(
    "byte" -> ByteType,
    "boolean" -> BooleanType,
    "int" -> IntegerType,
    "long" -> LongType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "ustring" -> StringType,
    "buffer" -> BinaryType)

  private def stripComments(s: String): String =
    s.replaceAll("(?s)/\\*.*?\\*/", " ").replaceAll("//[^\n]*", " ")

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    stripComments(s).foreach {
      case c if c.isWhitespace => flush()
      case c @ ('{' | '}' | '<' | '>' | ',' | ';') => flush(); out += c.toString
      case c => cur += c
    }
    flush()
    out.result()
  }

  /** Parse a DDL text into its modules, in declaration order. */
  def parse(ddl: String): Vector[Module] = {
    val toks = tokenize(ddl)
    var pos = 0
    def peek: String =
      if (pos < toks.length) toks(pos) else sys.error("unexpected end of DDL")
    def next(): String = { val t = peek; pos += 1; t }
    def expect(t: String): Unit = {
      val got = next()
      if (got != t) sys.error(s"expected '$t' but got '$got'")
    }

    // record references resolve against everything declared so far, by
    // simple name within the current module or fully qualified name
    val declared = scala.collection.mutable.LinkedHashMap.empty[String, StructType]

    def parseType(module: String): DataType = next() match {
      case p if primitives.contains(p) => primitives(p)
      case "vector" =>
        expect("<"); val t = parseType(module); expect(">")
        ArrayType(t)
      case "map" =>
        expect("<"); val k = parseType(module); expect(",")
        val v = parseType(module); expect(">")
        MapType(k, v)
      case ref =>
        declared.getOrElse(s"$module.$ref",
          declared.getOrElse(ref,
            sys.error(s"unknown type '$ref' (records must be declared before use)")))
    }

    def parseClass(module: String): (String, StructType) = {
      expect("class")
      val name = next()
      expect("{")
      val fields = Vector.newBuilder[StructField]
      while (peek != "}") {
        val t = parseType(module)
        val fieldName = next()
        expect(";")
        fields += StructField(fieldName, t, nullable = true)
      }
      expect("}")
      val st = StructType(fields.result())
      declared += (s"$module.$name" -> st)
      declared += (name -> st)
      (name, st)
    }

    val modules = Vector.newBuilder[Module]
    while (pos < toks.length) {
      expect("module")
      val mname = next()
      expect("{")
      val classes = Vector.newBuilder[(String, StructType)]
      while (peek != "}") classes += parseClass(mname)
      expect("}")
      modules += Module(mname, classes.result())
    }
    modules.result()
  }

  /** All class schemas of a DDL text, keyed by BOTH the fully qualified
    * and the simple class name (later declarations win a simple-name tie,
    * matching declared-before-use resolution).
    */
  def schemas(ddl: String): Map[String, StructType] =
    parse(ddl).flatMap { m =>
      m.classes.flatMap { case (n, st) => Seq(s"${m.name}.$n" -> st, n -> st) }
    }.toMap

  private def scalaType(t: DataType, names: Map[StructType, String]): String =
    t match {
      case ByteType => "Byte"
      case BooleanType => "Boolean"
      case IntegerType => "Int"
      case LongType => "Long"
      case FloatType => "Float"
      case DoubleType => "Double"
      case StringType => "String"
      case BinaryType => "Array[Byte]"
      case ArrayType(e, _) => s"Seq[${scalaType(e, names)}]"
      case MapType(k, v, _) =>
        s"Map[${scalaType(k, names)}, ${scalaType(v, names)}]"
      case st: StructType =>
        names.getOrElse(st, sys.error(
          s"nested record has no name; pass it via nestedNames: $st"))
      case other => sys.error(s"no Scala mapping for $other")
    }

  /** Scala case-class source equivalent to a parsed record class — the
    * analogue of the reference's `rcc`-generated Java record classes,
    * targeting `Dataset[T]` encoders instead of Writable streams. Nested
    * record types are named via `nestedNames` (structural match), e.g. the
    * other classes of the same parsed module.
    */
  def caseClassSource(name: String, st: StructType,
                      nestedNames: Map[StructType, String] = Map.empty): String = {
    val fields = st.fields
      .map(f => s"${f.name}: ${scalaType(f.dataType, nestedNames)}")
      .mkString(", ")
    s"final case class $name($fields)"
  }
}
