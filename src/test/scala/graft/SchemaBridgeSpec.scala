package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.schema.AvroSchemaBridge

/** SURVEY.md §1.3 type bridge + §1.4 quirk resolutions. */
class SchemaBridgeSpec extends AnyFunSuite {

  test("full primitive lattice parses (FIXTURES.md §1.3 schema)") {
    val json = """{"type":"record","name":"doc","fields":[
      {"name":"id","type":"string"},
      {"name":"flag","type":"boolean"},
      {"name":"n_int","type":"int"},
      {"name":"n_long","type":"long"},
      {"name":"n_float","type":"float"},
      {"name":"n_double","type":"double"},
      {"name":"payload","type":"bytes"},
      {"name":"name","type":["null","string"]},
      {"name":"tags","type":{"type":"array","items":"string"}},
      {"name":"scores","type":{"type":"array","items":"double"}}]}"""
    val st = AvroSchemaBridge.structTypeFromAvroJson(json).get
    assert(st("id").dataType == StringType && !st("id").nullable)
    assert(st("flag").dataType == BooleanType)
    assert(st("n_int").dataType == IntegerType)
    assert(st("n_long").dataType == LongType)
    assert(st("n_float").dataType == FloatType)
    assert(st("n_double").dataType == DoubleType)
    assert(st("payload").dataType == BinaryType)
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(st("scores").dataType == ArrayType(DoubleType, containsNull = false))
  }

  test("empty/null schema → None (reference raw-payload mode, MapRStreamConfig.java:83)") {
    assert(AvroSchemaBridge.structTypeFromAvroJson("").isEmpty)
    assert(AvroSchemaBridge.structTypeFromAvroJson(null).isEmpty)
    assert(AvroSchemaBridge.structTypeFromAvroJson("   ").isEmpty)
  }

  test("quirk 3 fixed: array<bytes> is a real array type") {
    val json = """{"type":"record","name":"r","fields":[
      {"name":"bs","type":{"type":"array","items":"bytes"}}]}"""
    val st = AvroSchemaBridge.structTypeFromAvroJson(json).get
    assert(st("bs").dataType == ArrayType(BinaryType, containsNull = false))
  }

  test("quirk 4 fixed: array<nullable string> keeps arrayness, nullable elements") {
    val json = """{"type":"record","name":"r","fields":[
      {"name":"xs","type":{"type":"array","items":["null","string"]}}]}"""
    val st = AvroSchemaBridge.structTypeFromAvroJson(json).get
    assert(st("xs").dataType == ArrayType(StringType, containsNull = true))
  }

  test("strict mode rejects map/enum/record like MapRDBJSONSink.java:292-295") {
    val mapJson = """{"type":"record","name":"r","fields":[
      {"name":"m","type":{"type":"map","values":"string"}}]}"""
    assertThrows[IllegalArgumentException](
      AvroSchemaBridge.structTypeFromAvroJson(mapJson))
    val enumJson = """{"type":"record","name":"r","fields":[
      {"name":"e","type":{"type":"enum","name":"E","symbols":["A"]}}]}"""
    assertThrows[IllegalArgumentException](
      AvroSchemaBridge.structTypeFromAvroJson(enumJson))
  }

  test("non-strict mode extends: map and enum get Spark mappings") {
    val json = """{"type":"record","name":"r","fields":[
      {"name":"m","type":{"type":"map","values":"long"}},
      {"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}}]}"""
    val st = AvroSchemaBridge.structTypeFromAvroJson(json, strict = false).get
    assert(st("m").dataType == MapType(StringType, LongType, valueContainsNull = false))
    assert(st("e").dataType == StringType)
  }

  test("non-nullable unions rejected (reference uses unions only for nullability)") {
    val json = """{"type":"record","name":"r","fields":[
      {"name":"u","type":["int","string"]}]}"""
    assertThrows[IllegalArgumentException](
      AvroSchemaBridge.structTypeFromAvroJson(json))
  }

  // property: render → parse round-trip over random flat schemas
  private val primGen = Gen.oneOf[DataType](
    BooleanType, IntegerType, LongType, FloatType, DoubleType, BinaryType, StringType)
  private val fieldGen = for {
    name <- Gen.identifier.map(_.take(10)).suchThat(_.nonEmpty)
    prim <- primGen
    isArray <- Gen.oneOf(true, false)
    nullable <- Gen.oneOf(true, false)
  } yield StructField(name, if (isArray) ArrayType(prim, containsNull = false) else prim, nullable)

  test("property: StructType → Avro-JSON → StructType round-trips (200 random schemas)") {
    val schemaGen = Gen.nonEmptyListOf(fieldGen)
      .map(fs => StructType(fs.distinctBy(_.name).toArray))
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(200).foreach { seed =>
      schemaGen(Gen.Parameters.default, seed).foreach { st =>
        val json = AvroSchemaBridge.avroJsonFromStructType(st)
        val back = AvroSchemaBridge.structTypeFromAvroJson(json).get
        assert(back == st, s"round-trip failed for $st via $json")
      }
    }
  }
}
