package graft

import graft.model._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaSpec extends AnyFunSuite {

  val sampleJson: String =
    """{
      |  "WELL": {
      |    "NAME": {"NAME": "Name", "ACTIVE": true, "TYPE": "TEXT", "NULLABLE": true},
      |    "DEPTH": {"NAME": "Depth", "ACTIVE": true, "TYPE": "DECIMAL", "NULLABLE": true},
      |    "SPUD_COUNT": {"NAME": "SpudCount", "ACTIVE": true, "TYPE": "INTEGER", "NULLABLE": true},
      |    "IS_ACTIVE": {"NAME": "IsActive", "ACTIVE": true, "TYPE": "BOOLEAN", "NULLABLE": true},
      |    "SPUD_DATE": {"NAME": "SpudDate", "ACTIVE": true, "TYPE": "DATETIME", "NULLABLE": true, "DATE_UNZONED": true},
      |    "OPERATOR": {"NAME": "Operator", "ACTIVE": true, "TYPE": "DOCUMENT", "NULLABLE": true, "DOCUMENT_TYPE": "COMPANY"},
      |    "OLD_FIELD": {"NAME": "Old", "ACTIVE": false, "TYPE": "TEXT", "NULLABLE": true},
      |    "LOCATION": {"NAME": "Location", "ACTIVE": true, "TYPE": "RECORD", "NULLABLE": true,
      |      "RECORD_TYPE": {
      |        "LAT": {"NAME": "Lat", "ACTIVE": true, "TYPE": "DECIMAL", "NULLABLE": true},
      |        "LON": {"NAME": "Lon", "ACTIVE": true, "TYPE": "DECIMAL", "NULLABLE": true},
      |        "RETIRED": {"NAME": "Retired", "ACTIVE": false, "TYPE": "TEXT", "NULLABLE": true}
      |      }},
      |    "TESTS": {"NAME": "Tests", "ACTIVE": true, "TYPE": "RECORD LIST", "NULLABLE": true,
      |      "RECORD_TYPE": {
      |        "RESULT": {"NAME": "Result", "ACTIVE": true, "TYPE": "TEXT", "NULLABLE": true},
      |        "SCORE": {"NAME": "Score", "ACTIVE": true, "TYPE": "DECIMAL", "NULLABLE": true}
      |      }},
      |    "MYSTERY": {"NAME": "Mystery", "ACTIVE": true, "TYPE": "HOLOGRAM", "NULLABLE": true}
      |  }
      |}""".stripMargin

  test("codec parses the served shape, preserving field order") {
    val rs = SchemaCodec.parse(sampleJson)
    assert(rs.typeNames == Vector("WELL"))
    val well = rs("WELL")
    assert(well.fields.map(_._1).take(3) == Vector("NAME", "DEPTH", "SPUD_COUNT"))
    assert(well("OPERATOR").documentType.contains("COMPANY"))
    assert(well("SPUD_DATE").dateUnzoned)
    assert(well("LOCATION").recordType.get.contains("LAT"))
  }

  test("withoutInactive prunes recursively (schema.go:96-119 semantics)") {
    val rs = SchemaCodec.parse(sampleJson).withoutInactive
    val well = rs("WELL")
    assert(!well.contains("OLD_FIELD"))
    assert(!well("LOCATION").recordType.get.contains("RETIRED"))
    assert(well.contains("NAME"))
  }

  test("SchemaMapper maps the full type table (SURVEY.md §1.3)") {
    val rs = SchemaCodec.parse(sampleJson)
    val st = SchemaMapper.structFor(rs("WELL"))
    def t(n: String) = st(n).dataType
    assert(t("NAME") == StringType)
    assert(t("DEPTH") == DoubleType)   // DECIMAL is float in every dialect
    assert(t("SPUD_COUNT") == LongType)
    assert(t("IS_ACTIVE") == BooleanType)
    assert(t("SPUD_DATE") == TimestampType)
    // DOCUMENT: nested struct carrying the FK id
    assert(t("OPERATOR").asInstanceOf[StructType]("DOCUMENT_ID").dataType == StringType)
    // RECORD recurses
    assert(t("LOCATION").asInstanceOf[StructType]("LAT").dataType == DoubleType)
    // RECORD LIST: array of struct with LISTITEM_ID prepended
    val items = t("TESTS").asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(items.fieldNames.head == "LISTITEM_ID")
    assert(items("SCORE").dataType == DoubleType)
    // unsupported types are skipped with a warning, not failed
    assert(!st.fieldNames.contains("MYSTERY"))
  }
}
