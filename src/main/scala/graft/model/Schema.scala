package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Document-schema metadata system.
  *
  * Mirrors the reference's dynamic schema model
  * (/root/reference/src/internal/execute/schema.go:16-32): a root map of
  * document types, each a map of field name to metadata, with recursive
  * RECORD / RECORD LIST nesting. The schema is runtime data (fetched, not
  * compiled), so the Spark representation is an untyped DataFrame with a
  * per-type StructType derived here — not case-class Datasets.
  */
final case class FieldMetadata(
    name: String,
    active: Boolean,
    fieldType: String,
    nullable: Boolean,
    size: Option[Int] = None,
    recordType: Option[DocumentSchema] = None,
    formula: Option[String] = None,
    documentType: Option[String] = None,
    dateUnzoned: Boolean = false,
)

final case class DocumentSchema(fields: Vector[(String, FieldMetadata)]) {
  def apply(name: String): FieldMetadata = fields.find(_._1 == name).get._2
  def contains(name: String): Boolean = fields.exists(_._1 == name)
}

final case class RootSchema(types: Vector[(String, DocumentSchema)]) {
  def apply(docType: String): DocumentSchema =
    types.find(_._1 == docType).get._2
  def typeNames: Vector[String] = types.map(_._1)

  /** Recursively drop inactive fields (schema.go:96-119, gated by
    * HideInactiveFields in the reference, config.go:25). A recordType
    * emptied by the filter is dropped entirely (schema.go:111-113 nils
    * it) so the view walk never generates a zero-column child view. */
  def withoutInactive: RootSchema = {
    def filt(ds: DocumentSchema): DocumentSchema =
      DocumentSchema(ds.fields.collect {
        case (n, fm) if fm.active =>
          n -> fm.copy(recordType =
            fm.recordType.map(filt).filter(_.fields.nonEmpty))
      })
    RootSchema(types.map { case (t, ds) => t -> filt(ds) })
  }
}

object SchemaCodec {
  private val mapper = new ObjectMapper()

  /** Parse the JSON shape served by GET /fetch/document/schema
    * (schema.go:37-94). Field order preserved as served. */
  def parse(json: String): RootSchema = {
    val root = mapper.readTree(json)
    RootSchema(root.properties().asScala.toVector.map { e =>
      e.getKey -> parseDoc(e.getValue)
    })
  }

  private def parseDoc(node: JsonNode): DocumentSchema =
    DocumentSchema(node.properties().asScala.toVector.map { e =>
      e.getKey -> parseField(e.getValue)
    })

  private def parseField(n: JsonNode): FieldMetadata = FieldMetadata(
    name = Option(n.get("NAME")).map(_.asText).getOrElse(""),
    active = Option(n.get("ACTIVE")).forall(_.asBoolean),
    fieldType = Option(n.get("TYPE")).map(_.asText).getOrElse(""),
    nullable = Option(n.get("NULLABLE")).forall(_.asBoolean),
    size = Option(n.get("SIZE")).map(_.asInt),
    recordType = Option(n.get("RECORD_TYPE")).map(parseDoc),
    formula = Option(n.get("FORMULA")).map(_.asText),
    documentType = Option(n.get("DOCUMENT_TYPE")).map(_.asText),
    dateUnzoned = Option(n.get("DATE_UNZONED")).exists(_.asBoolean),
  )
}

/** RootSchema → Spark StructType, per the type table in SURVEY.md §1.3.
  * Canonical semantics follow the Snowflake generator
  * (snowflake.go:336-359); the Databricks DATETIME→date cast
  * (databricks.go:375) is treated as a dialect bug, not spec.
  */
object SchemaMapper {
  val StringTypes: Set[String] = Set("TEXT", "GUID", "UWI")

  /** Spark type for a scalar field; None = unsupported (skip + warn,
    * snowflake.go:357-358). */
  def scalarType(fm: FieldMetadata): Option[DataType] = fm.fieldType match {
    case t if StringTypes(t) => Some(StringType)
    case "INTEGER"           => Some(LongType)
    case "DECIMAL"           => Some(DoubleType) // reference casts to float, not decimal
    case "BOOLEAN"           => Some(BooleanType)
    // DATE_UNZONED (schema.go:25) marks producer timestamps recorded
    // without an offset; the reference's generators cast both zoned and
    // unzoned the same way (snowflake.go:345 timestamp_tz for every
    // DATETIME). We take the same stance: one TimestampType cast under
    // the pinned UTC session timezone — the flag is parsed and carried
    // on FieldMetadata for consumers that need to annotate, but does
    // not change the stored instant here, exactly as in the reference.
    case "DATETIME"          => Some(TimestampType)
    case _                   => None
  }

  /** StructType for one document type (recursive). DOCUMENT references
    * become a nested struct carrying DOCUMENT_ID (snowflake.go:348);
    * RECORD recurses; RECORD LIST is an array of struct. */
  def structFor(ds: DocumentSchema): StructType =
    StructType(ds.fields.flatMap { case (name, fm) =>
      fieldFor(name, fm)
    })

  def fieldFor(name: String, fm: FieldMetadata): Option[StructField] =
    fm.fieldType match {
      case "DOCUMENT" =>
        Some(StructField(name,
          StructType(Seq(StructField("DOCUMENT_ID", StringType, true))),
          nullable = true))
      case "RECORD" =>
        fm.recordType.map(rt => StructField(name, structFor(rt), true))
      case "RECORD LIST" =>
        fm.recordType.map { rt =>
          // list items additionally carry a LISTITEM_ID (snowflake.go:320-323)
          val inner = StructType(
            StructField("LISTITEM_ID", StringType, true) +: structFor(rt).fields)
          StructField(name, ArrayType(inner, containsNull = true), true)
        }
      case _ =>
        scalarType(fm).map(t => StructField(name, t, nullable = true))
    }
}
