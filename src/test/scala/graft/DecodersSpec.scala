package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.formats.{Decoders, LogFormats}
import graft.functions.AvroExpressions

/** SURVEY.md §2.2 format decoders F1–F9 on crafted payloads, including the
  * reference's own worked example (FIXTURES.md §1.1 purchase records). */
class DecodersSpec extends SparkSpec {
  import spark.implicits._

  private val purchaseAvro =
    """{"type":"record","name":"p","fields":[
      {"name":"user","type":"string"},
      {"name":"item","type":"string"},
      {"name":"count","type":"int"},
      {"name":"price","type":"double"}]}"""

  test("F3 csv: the reference docs' purchase example decodes") {
    val src = Seq("alice,apple,3,1.50", "bob,banana,12,0.25")
      .toDF("s").select($"s".cast("binary").as("value"))
    val out = Decoders.decode(src, "value", Some("csv"), Some(purchaseAvro))
    assert(out.columns.toSeq == Seq("user", "item", "count", "price"))
    val rows = out.orderBy("user").collect()
    assert(rows(0) == Row("alice", "apple", 3, 1.5))
    assert(rows(1) == Row("bob", "banana", 12, 0.25))
  }

  test("F4 tsv decodes with tab delimiter") {
    val src = Seq("alice\tapple\t3\t1.50").toDF("s")
      .select($"s".cast("binary").as("value"))
    val out = Decoders.decode(src, "value", Some("tsv"), Some(purchaseAvro))
    assert(out.collect()(0) == Row("alice", "apple", 3, 1.5))
  }

  test("F1/F6 none/binary keeps raw bytes; F2 text casts to string") {
    val src = Seq("payload").toDF("s").select($"s".cast("binary").as("value"))
    val none = Decoders.decode(src, "value", None)
    assert(none.schema("message").dataType.typeName == "binary")
    assert(new String(none.collect()(0).getAs[Array[Byte]]("message")) == "payload")
    val text = Decoders.decode(src, "value", Some("text"))
    assert(text.collect()(0).getString(0) == "payload")
  }

  test("metadata columns pass through decode") {
    val src = Seq((7L, "x,y")).toDF("id", "s")
      .select($"id", $"s".cast("binary").as("value"))
    val out = Decoders.decode(src, "value", Some("csv"),
      Some("""{"type":"record","name":"r","fields":[
        {"name":"a","type":"string"},{"name":"b","type":"string"}]}"""))
    assert(out.columns.toSeq == Seq("id", "a", "b"))
    assert(out.collect()(0) == Row(7L, "x", "y"))
  }

  test("F7 clf: combined and common log lines") {
    val combined = "127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /apache_pb.gif HTTP/1.0\" 200 2326 " +
      "\"http://ref\" \"Mozilla/4.08\""
    val common = "10.1.1.1 - - [10/Oct/2000:13:55:36 -0700] \"POST /x HTTP/1.1\" 404 -"
    val src = Seq(combined, common).toDF("s").select($"s".cast("binary").as("value"))
    val rows = Decoders.decode(src, "value", Some("clf")).orderBy($"host").collect()
    val c0 = rows.find(_.getAs[String]("host") == "127.0.0.1").get
    assert(c0.getAs[String]("request") == "GET /apache_pb.gif HTTP/1.0")
    assert(c0.getAs[String]("status") == "200")
    assert(c0.getAs[String]("bytes") == "2326")
    assert(c0.getAs[String]("referer") == "http://ref")
    assert(c0.getAs[String]("agent") == "Mozilla/4.08")
    val c1 = rows.find(_.getAs[String]("host") == "10.1.1.1").get
    assert(c1.getAs[String]("status") == "404")
    assert(c1.getAs[String]("referer") == "") // absent in common format
  }

  test("F8 grok compiles %{...:name} refs and extracts named fields") {
    val (regex, names) = LogFormats.compileGrok(
      "%{IP:client} - %{WORD:method} took %{NUMBER:ms}ms")
    assert(names == Seq("client", "method", "ms"))
    val src = Seq("10.2.3.4 - GET took 12.5ms").toDF("s")
      .select($"s".cast("binary").as("value"))
    val out = Decoders.decode(src, "value", Some("grok"),
      options = Map("grok.pattern" -> "%{IP:client} - %{WORD:method} took %{NUMBER:ms}ms"))
    assert(out.collect()(0) == Row("10.2.3.4", "GET", "12.5"))
    assert(regex.nonEmpty)
  }

  test("F8 grok: unknown pattern rejected") {
    assertThrows[IllegalArgumentException](LogFormats.compileGrok("%{BOGUS:x}"))
  }

  test("F9 syslog RFC-3164: pri splits into facility/severity") {
    // pri 165 = facility 20, severity 5
    val src = Seq("<165>Aug 12 05:00:00 web01 sshd[4242]: Accepted publickey for root")
      .toDF("s").select($"s".cast("binary").as("value"))
    val r = Decoders.decode(src, "value", Some("syslog")).collect()(0)
    assert(r.getAs[Int]("facility") == 20)
    assert(r.getAs[Int]("severity") == 5)
    assert(r.getAs[String]("host") == "web01")
    assert(r.getAs[String]("tag") == "sshd")
    assert(r.getAs[String]("pid") == "4242")
    assert(r.getAs[String]("msg") == "Accepted publickey for root")
  }

  test("F5 avro: encode/decode round-trip incl. nullable + array fields") {
    val schema = """{"type":"record","name":"r","fields":[
      {"name":"id","type":"long"},
      {"name":"name","type":["null","string"]},
      {"name":"tags","type":{"type":"array","items":"string"}},
      {"name":"scores","type":{"type":"array","items":"double"}}]}"""
    val df = Seq(
      (1L, Some("a"), Seq("x", "y"), Seq(1.5, 2.5)),
      (2L, None: Option[String], Seq.empty[String], Seq.empty[Double]))
      .toDF("id", "name", "tags", "scores")
    val enc = df.select(AvroExpressions.to_avro_graft(
      struct($"id", $"name", $"tags", $"scores"), schema).as("value"))
    val out = Decoders.decode(enc, "value", Some("avro"), Some(schema))
      .orderBy("id").collect()
    assert(out(0) == Row(1L, "a", Seq("x", "y"), Seq(1.5, 2.5)))
    assert(out(1).getLong(0) == 2L)
    assert(out(1).isNullAt(1))
  }

  test("unsupported format rejected like the reference's type switch") {
    val src = Seq("x").toDF("s").select($"s".cast("binary").as("value"))
    assertThrows[IllegalArgumentException](
      Decoders.decode(src, "value", Some("protobuf")))
  }
}
