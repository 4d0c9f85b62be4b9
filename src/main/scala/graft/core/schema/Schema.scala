package graft.core.schema

import org.apache.spark.sql.types._

/** Platform-independent schema model (reference:
  * core/schema/definition.py:10-79) with the improvement SURVEY.md §1.2
  * calls for: complex types (array/map/struct) are structurally modeled,
  * so conversion to Spark types never has to reject them (the reference
  * throws for complex types, runtime/schema_converter.py:69-93).
  */
sealed trait GDataType { def ddl: String }
object GDataType {
  case object GString extends GDataType { val ddl = "string" }
  case object GInteger extends GDataType { val ddl = "int" }
  case object GLong extends GDataType { val ddl = "bigint" }
  case object GFloat extends GDataType { val ddl = "float" }
  case object GDouble extends GDataType { val ddl = "double" }
  case object GBoolean extends GDataType { val ddl = "boolean" }
  case object GTimestamp extends GDataType { val ddl = "timestamp" }
  case object GDate extends GDataType { val ddl = "date" }
  case object GBinary extends GDataType { val ddl = "binary" }
  final case class GArray(element: GDataType, containsNull: Boolean = true) extends GDataType {
    def ddl = s"array<${element.ddl}>"
  }
  final case class GMap(key: GDataType, value: GDataType, valueContainsNull: Boolean = true) extends GDataType {
    def ddl = s"map<${key.ddl},${value.ddl}>"
  }
  final case class GStruct(fields: Seq[SchemaField]) extends GDataType {
    def ddl = s"struct<${fields.map(f => s"${f.name}:${f.dataType.ddl}").mkString(",")}>"
  }

  /** String spellings accepted by the reference's enum coercion
    * (definition.py:30-51): case-insensitive simple names.
    */
  def from(s: String): GDataType = s.trim.toLowerCase match {
    case "string" | "varchar" | "str" => GString
    case "integer" | "int" => GInteger
    case "long" | "bigint" => GLong
    case "float" | "real" => GFloat
    case "double" => GDouble
    case "boolean" | "bool" => GBoolean
    case "timestamp" => GTimestamp
    case "date" => GDate
    case "binary" => GBinary
    case other =>
      // nested spellings like array<string> — parse structurally
      if (other.startsWith("array<") && other.endsWith(">"))
        GArray(from(other.stripPrefix("array<").stripSuffix(">")))
      else throw new IllegalArgumentException(s"unknown data type: $s")
  }
}

final case class SchemaField(
    name: String,
    dataType: GDataType,
    nullable: Boolean = true,
    metadata: Map[String, String] = Map.empty)

final case class SchemaDefinition(fields: Seq[SchemaField]) {
  def fieldNames: Seq[String] = fields.map(_.name)
  def field(name: String): Option[SchemaField] = fields.find(_.name == name)
}

/** SchemaDefinition ↔ StructType round-trip (reference:
  * runtime/schema_converter.py:23-184). Complex types convert
  * structurally rather than throwing.
  */
object SchemaConverter {
  import GDataType._

  def toSparkType(t: GDataType): DataType = t match {
    case GString => StringType
    case GInteger => IntegerType
    case GLong => LongType
    case GFloat => FloatType
    case GDouble => DoubleType
    case GBoolean => BooleanType
    case GTimestamp => TimestampType
    case GDate => DateType
    case GBinary => BinaryType
    case GArray(e, n) => ArrayType(toSparkType(e), n)
    case GMap(k, v, n) => MapType(toSparkType(k), toSparkType(v), n)
    case GStruct(fs) => StructType(fs.map(toStructField))
  }

  def fromSparkType(t: DataType): GDataType = t match {
    case StringType => GString
    case IntegerType => GInteger
    case LongType => GLong
    case FloatType => GFloat
    case DoubleType => GDouble
    case BooleanType => GBoolean
    case TimestampType => GTimestamp
    case DateType => GDate
    case BinaryType => GBinary
    case ArrayType(e, n) => GArray(fromSparkType(e), n)
    case MapType(k, v, n) => GMap(fromSparkType(k), fromSparkType(v), n)
    case StructType(fs) => GStruct(fs.toSeq.map(fromStructField))
    case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
  }

  def toStructField(f: SchemaField): StructField = {
    val mb = new MetadataBuilder()
    f.metadata.foreach { case (k, v) => mb.putString(k, v) }
    StructField(f.name, toSparkType(f.dataType), f.nullable, mb.build())
  }

  def fromStructField(f: StructField): SchemaField =
    SchemaField(f.name, fromSparkType(f.dataType), f.nullable)

  def toStructType(s: SchemaDefinition): StructType =
    StructType(s.fields.map(toStructField))

  def fromStructType(t: StructType): SchemaDefinition =
    SchemaDefinition(t.fields.toSeq.map(fromStructField))
}

/** Producer→consumer schema compatibility rules (reference:
  * core/schema/validator.py:64-208):
  *  - either side None → valid unless strict;
  *  - consumer field missing from producer output → ERROR;
  *  - type mismatch → ERROR;
  *  - nullable output feeding non-nullable input → ERROR;
  *  - extra producer fields → WARNING.
  */
object SchemaValidator {
  sealed abstract class Severity(val name: String)
  case object Error extends Severity("error")
  case object Warning extends Severity("warning")

  final case class Issue(severity: Severity, field: String, message: String)
  final case class Result(issues: Seq[Issue]) {
    def errors: Seq[Issue] = issues.filter(_.severity == Error)
    def warnings: Seq[Issue] = issues.filter(_.severity == Warning)
    def isValid: Boolean = errors.isEmpty
  }

  def validate(
      producer: Option[SchemaDefinition],
      consumer: Option[SchemaDefinition],
      strict: Boolean = false): Result = (producer, consumer) match {
    case (Some(p), Some(c)) => Result(compare(p, c))
    case _ =>
      if (strict)
        Result(Seq(Issue(Error, "<schema>",
          "strict mode requires both producer and consumer schemas")))
      else Result(Nil)
  }

  private def compare(p: SchemaDefinition, c: SchemaDefinition): Seq[Issue] = {
    val missing = c.fields.filterNot(f => p.field(f.name).isDefined).map(f =>
      Issue(Error, f.name, s"required field '${f.name}' missing from producer output"))
    val mismatched = c.fields.flatMap { cf =>
      p.field(cf.name).toSeq.flatMap { pf =>
        val typeIssue =
          if (pf.dataType != cf.dataType)
            Seq(Issue(Error, cf.name,
              s"type mismatch: producer ${pf.dataType.ddl} vs consumer ${cf.dataType.ddl}"))
          else Nil
        val nullIssue =
          if (pf.nullable && !cf.nullable)
            Seq(Issue(Error, cf.name,
              s"nullable producer field '${cf.name}' feeds non-nullable consumer field"))
          else Nil
        typeIssue ++ nullIssue
      }
    }
    val extra = p.fields.filterNot(f => c.field(f.name).isDefined).map(f =>
      Issue(Warning, f.name, s"extra producer field '${f.name}' not consumed"))
    missing ++ mismatched ++ extra
  }
}
