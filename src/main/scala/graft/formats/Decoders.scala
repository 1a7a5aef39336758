package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.AvroExpressions
import graft.schema.AvroSchemaBridge

/** The engine's wire-format decode surface — SURVEY.md §2.2 F1–F9, the
  * admissible formats of the reference source (reference
  * `widgets/MapRStream-streamingsource.json:48-58`, dispatch at
  * `MapRStreamingSource.java:109-113, 174-181`).
  *
  * Everything is column expressions over a binary `value` column, so the
  * same decode applies identically to a batch DataFrame and a streaming
  * one (Kafka source exposes the same `value: binary`). Catalyst resolves
  * the schema once at plan time; there is no per-record reflection and
  * unused decoded fields are pruned by ColumnPruning/OptimizeCsvJsonExprs.
  *
  * Per SURVEY.md §1.4 quirk decisions: no-format mode puts the payload in
  * an explicit `message` column (docs' intent) rather than reproducing the
  * reference's first-schema-field bug; declared types are honored with
  * explicit casts rather than raw-bytes-into-string.
  */
object Decoders {

  val Formats: Seq[String] =
    Seq("text", "csv", "tsv", "avro", "binary", "clf", "grok", "syslog", "json")

  /** Decode `valueCol` (binary) per `format`. Metadata columns (everything
    * except the payload) pass through; decoded fields are appended.
    *
    * @param format     one of [[Formats]], or None for raw-payload mode
    * @param avroSchema Avro-JSON schema string (reference config style) for
    *                   schema-bearing formats (csv/tsv/avro/json)
    * @param options    format options; `grok.pattern` for grok, plus any
    *                   `from_csv`/`from_json` options
    */
  def decode(
      df: DataFrame,
      valueCol: String = "value",
      format: Option[String] = None,
      avroSchema: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame = {

    val meta = df.columns.filterNot(_ == valueCol).map(col).toSeq
    val v = col(valueCol)
    def declared: StructType =
      AvroSchemaBridge.structTypeFromAvroJson(avroSchema.getOrElse(
        throw new IllegalArgumentException(s"format $format requires a schema")))
        .getOrElse(throw new IllegalArgumentException("empty schema"))

    // (name, expression) pairs per format
    val decoded: Seq[(String, Column)] = format.map(_.toLowerCase) match {
      case None | Some("binary") => Seq("message" -> v)
      case Some("text") => Seq("message" -> v.cast("string"))
      case Some("csv") => expand(from_csv(v.cast("string"), declared, options), declared)
      case Some("tsv") =>
        expand(from_csv(v.cast("string"), declared, options + ("sep" -> "\t")), declared)
      case Some("json") => expand(from_json(v.cast("string"), declared, options), declared)
      case Some("avro") =>
        val json = avroSchema.get
        expand(AvroExpressions.from_avro_graft(v, json),
          AvroSchemaBridge.structTypeFromAvroJson(json).get)
      case Some("clf") =>
        LogFormats.ClfFields.map { case (n, _) => n } zip LogFormats.clf(v.cast("string"))
      case Some("syslog") =>
        Seq("facility", "severity", "log_ts", "host", "tag", "pid", "msg")
          .zip(LogFormats.syslog(v.cast("string")))
      case Some("grok") =>
        val pattern = options.getOrElse("grok.pattern",
          throw new IllegalArgumentException("grok requires options(grok.pattern)"))
        LogFormats.grokNamed(v.cast("string"), pattern)
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported format: $other (reference widget enumerates ${Formats.mkString(",")})")
    }
    // a decoded field shadowing a pass-through column (e.g. an Avro field
    // named "timestamp" vs the wire metadata column) would yield a
    // duplicate-name DataFrame that only fails LATER, on the first
    // ambiguous reference — reject it here, at the root cause
    val clash = decoded.map(_._1).toSet
      .intersect(df.columns.filterNot(_ == valueCol).toSet)
    require(clash.isEmpty,
      s"decoded field name(s) ${clash.mkString(", ")} collide with " +
        "pass-through columns; rename the metadata columns or the schema " +
        "fields before decoding")
    df.select(meta ++ decoded.map { case (n, c) => c.as(n) }: _*)
  }

  private def expand(structCol: Column, st: StructType): Seq[(String, Column)] =
    st.fieldNames.toSeq.map(f => f -> structCol.getField(f))
}
