package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.formats.Decoders
import graft.functions.AvroExpressions

/** Decoder fuzz (SURVEY.md §5.3): malformed CSV rows and truncated Avro
  * payloads must degrade to nulls per PERMISSIVE policy — never crash an
  * executor, because at 100 TB a single poison record killing a 6-hour job
  * is the operational failure mode that matters.
  */
class DecoderFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    """{"type":"record","name":"r","fields":[
      {"name":"a","type":"string"},
      {"name":"b","type":"int"},
      {"name":"c","type":"double"}]}"""

  private val junkLine: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const(",,,,,,,"),
    Gen.const("a,b"),                  // too few columns
    Gen.const("x,not_an_int,1.5"),     // type mismatch
    Gen.const("x,1,2.5,extra,extra2"), // too many columns
    Gen.stringOf(Gen.asciiPrintableChar).map(_.take(80)))

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    LazyList.iterate(Seed(4242L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  test("fuzz: malformed CSV decodes to nulls (PERMISSIVE), never throws") {
    val lines = sample(junkLine, 200)
    val src = lines.toDF("s").selectExpr("cast(s as binary) as value")
    val out = Decoders.decode(src, "value", Some("csv"), Some(schema))
      .collect() // must not throw
    assert(out.length == lines.length)
    // a well-formed line among junk still decodes
    val mixed = (lines.take(50) :+ "good,7,2.25")
      .toDF("s").selectExpr("cast(s as binary) as value")
    val rows = Decoders.decode(mixed, "value", Some("csv"), Some(schema)).collect()
    assert(rows.last == Row("good", 7, 2.25))
  }

  test("fuzz: truncated/corrupt Avro yields nulls, never throws") {
    // valid payload for the schema, then truncate/corrupt everywhere
    val valid = {
      val df = Seq(("hello", 42, 3.14)).toDF("a", "b", "c")
      val enc = df.select(AvroExpressions.to_avro_graft(
        org.apache.spark.sql.functions.struct($"a", $"b", $"c"), schema).as("v"))
      enc.collect().head.getAs[Array[Byte]](0)
    }
    val cuts: Seq[Array[Byte]] =
      (0 until valid.length).map(valid.take) :+ valid.map(b => (b ^ 0x55).toByte)
    val src = cuts.toDF("value")
    val out = Decoders.decode(src, "value", Some("avro"), Some(schema))
    val rows = out.collect() // must not throw
    assert(rows.length == cuts.length)
  }
}
