package org.apache.spark.sql.graft

import java.io.CharArrayWriter

import com.fasterxml.jackson.core.JsonFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonGenerator, JacksonParser}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** InternalRow ⇄ JSON-line codec for the graft-doc connector, backed by
  * Spark's own Jackson machinery (`JacksonGenerator`/`JacksonParser`, the
  * engines behind `to_json`/`from_json` and the JSON file source). Both are
  * `private[sql]`, hence this bridge module in the `org.apache.spark.sql`
  * namespace (same pattern as [[bridge]]).
  *
  * Using Spark's codec (not hand-rolled serialization) buys exact parity
  * with the JSON file source for every Spark type — timestamps, decimals,
  * nested structs/arrays/maps — and keeps null fields omitted
  * (`ignoreNullFields`), the reference sink's document semantics
  * (`MapRDBJSONSink.java:131` null guard).
  *
  * The timezone is pinned to UTC so document bytes are
  * machine-independent: a table written by one cluster reads identically
  * on another regardless of session timezones.
  */
object docjson {

  /** Per-task JSON writer; not thread-safe (one per DataWriter). */
  final class RowJsonWriter(schema: StructType) {
    private val out = new CharArrayWriter()
    private val gen = new JacksonGenerator(
      schema, out, new JSONOptions(Map("ignoreNullFields" -> "true"), "UTC"))

    def toJson(row: InternalRow): String = {
      gen.write(row)
      gen.flush()
      val s = out.toString
      out.reset()
      s
    }

    def close(): Unit = gen.close()
  }

  /** Per-task JSON parser; FAILFAST-shaped (a malformed stored document is
    * corruption, not user input — surface it, don't null it). */
  final class RowJsonReader(schema: StructType) {
    private val parser = new JacksonParser(
      schema, new JSONOptions(Map.empty[String, String], "UTC"),
      allowArrayAsStructs = false)

    def fromJson(line: String): Iterator[InternalRow] =
      parser.parse[String](line,
        (f: JsonFactory, s: String) => CreateJacksonParser.string(f, s),
        (s: String) => UTF8String.fromString(s)).iterator
  }
}
