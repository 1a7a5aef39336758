package graft.sources

import graft.schema.AvroSchemaBridge

/** CDAP pipeline-config adapter (SURVEY.md §1.2): parse the reference's
  * per-stage property maps — the JSON a CDAP pipeline stores for each
  * plugin stage — into this engine's constructor-parameter configs,
  * including `${macro}` runtime substitution for exactly the fields the
  * reference marks `@Macro` (`MapRStreamConfig.java:38-44`: topics,
  * offsetField; `MapRDBJSONSink.java:305-315`: tableName, key, schema).
  *
  * The engine's own API deliberately has no macro engine (§1.2: configs
  * are plain constructor parameters) — this adapter is the thin porting
  * shim for users whose pipeline JSONs carry `${runtime-substituted}`
  * values: point it at the stage's `properties` object plus the
  * runtime-arguments map and get back [[StreamSource.StreamConfig]] /
  * [[DocSinkSpec]]; nothing downstream changes.
  *
  * Macro semantics follow CDAP's: `${name}` resolves from the runtime
  * arguments, resolution is recursive (an argument's value may itself
  * contain macros) with a depth cap so a cycle fails loudly instead of
  * spinning, an unresolvable name is a configure-time error (the
  * reference surfaces it at provisioning), and function macros
  * (`${secure(...)}`, `${logicalStartTime(...)}`) are rejected with a
  * clear message — they need a CDAP runtime, not a table of strings.
  */
object PipelineConfig {

  private val MacroRe = """\$\{([^}]*)\}""".r

  /** `${name}` substitution over one property value. Non-macro text
    * passes through untouched; `$` without `{` is literal. */
  def substitute(value: String, macros: Map[String, String]): String = {
    var cur = value
    var depth = 0
    while (MacroRe.findFirstIn(cur).isDefined) {
      depth += 1
      require(depth <= 10,
        s"macro recursion exceeds depth 10 resolving '$value' — cycle?")
      cur = MacroRe.replaceAllIn(cur, m => {
        val name = m.group(1)
        require(!name.contains("("),
          s"function macro '$${$name}' is not supported — only plain " +
            "runtime-argument substitution (secure()/logicalStartTime() " +
            "need a CDAP runtime)")
        val v = macros.getOrElse(name, throw new IllegalArgumentException(
          s"unresolvable macro '$${$name}' — not in the runtime arguments"))
        scala.util.matching.Regex.quoteReplacement(v)
      })
    }
    cur
  }

  private def prop(properties: Map[String, String], key: String): Option[String] =
    properties.get(key).map(_.trim).filter(_.nonEmpty)

  private def required(properties: Map[String, String], key: String): String =
    prop(properties, key).getOrElse(throw new IllegalArgumentException(
      s"stage property '$key' is required"))

  /** Validate a declared Avro-JSON schema at CONFIGURE time (the
    * reference's `configurePipeline` discipline: a bad schema fails
    * before any data moves, `MapRStreamingSource.java:64-67`). Empty or
    * absent → None (raw/null-schema mode, §2.1 S1b). */
  private def validatedSchema(json: Option[String]): Option[String] = {
    json.foreach { j =>
      // the reference wraps the parser's IOException in
      // IllegalArgumentException (MapRStreamConfig.getSchema) — same here,
      // so a malformed schema is one crisp configure-time error
      val parsed =
        try AvroSchemaBridge.structTypeFromAvroJson(j)
        catch { case e: Exception => throw new IllegalArgumentException(
          s"unable to parse output schema: ${e.getMessage}", e) }
      require(parsed.isDefined, "unable to parse output schema")
    }
    json
  }

  /** Build a [[StreamSource.StreamConfig]] from a MapRStream source
    * stage's properties (field names are the reference's:
    * referenceName, topics, offsetField, schema, format). `brokers` is
    * the one field with no reference counterpart — MapR streams resolve
    * by path, Kafka needs bootstrap servers — taken from a `brokers`
    * property or, failing that, this call's default. Only the
    * reference's `@Macro` fields (topics, offsetField) are substituted,
    * matching where CDAP would substitute. */
  def streamConfig(properties: Map[String, String],
      macros: Map[String, String] = Map.empty,
      defaultBrokers: String = "localhost:9092"): StreamSource.StreamConfig = {
    // same configure-time discipline as docSinkConfig: an invalid
    // referenceName fails HERE, not later inside StreamSource.read —
    // the reference plugin validates both stage kinds at configure time
    // (round-9 advice closed the source-side gap)
    require(Lineage.isValidReferenceName(required(properties, "referenceName")),
      s"invalid referenceName '${properties("referenceName")}'")
    val topics = substitute(required(properties, "topics"), macros)
    val offset = prop(properties, "offsetField")
      .map(substitute(_, macros)).getOrElse("latest")
    StreamSource.StreamConfig(
      referenceName = required(properties, "referenceName"),
      brokers = prop(properties, "brokers").getOrElse(defaultBrokers),
      topics = topics.split(",").toSeq.map(_.trim).filter(_.nonEmpty),
      initialOffset = offset,
      format = prop(properties, "format"),
      avroSchemaJson = validatedSchema(prop(properties, "schema")))
  }

  /** The MapRDBJSONSink stage surface (`MapRDBJSONSink.java:305-315`):
    * table path, id field, declared schema — all three `@Macro`. */
  final case class DocSinkSpec(
      referenceName: String,
      tableName: String,
      keyField: String,
      avroSchemaJson: Option[String])

  def docSinkConfig(properties: Map[String, String],
      macros: Map[String, String] = Map.empty): DocSinkSpec = {
    require(Lineage.isValidReferenceName(required(properties, "referenceName")),
      s"invalid referenceName '${properties("referenceName")}'")
    DocSinkSpec(
      referenceName = required(properties, "referenceName"),
      tableName = substitute(required(properties, "tableName"), macros),
      keyField = substitute(required(properties, "key"), macros),
      avroSchemaJson =
        validatedSchema(prop(properties, "schema").map(substitute(_, macros))))
  }

  /** All source + sink configs of ONE CDAP pipeline document — the JSON
    * a pipeline export/deploy carries: `config.stages[]`, each stage a
    * `plugin{name, type, properties}`. Stages whose plugin name is the
    * reference pair's (`MapRStream` streamingsource,
    * `MapRStreamingSource.java:52`; `MapRDBJSON` batchsink,
    * `MapRDBJSONSink.java:54`) resolve through
    * [[streamConfig]]/[[docSinkConfig]]; every other stage is ignored
    * (a real pipeline carries transforms between them — those are this
    * engine's relational surface, not per-stage configs). A pipeline
    * with NO recognized stage is an error, not an empty result — the
    * caller pointed the adapter at the wrong document. */
  final case class PipelinePlugins(
      sources: Seq[StreamSource.StreamConfig],
      sinks: Seq[DocSinkSpec])

  def fromPipelineJson(json: String,
      macros: Map[String, String] = Map.empty,
      defaultBrokers: String = "localhost:9092"): PipelinePlugins = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(json)
    val stages = Option(root.path("config").path("stages"))
      .filter(_.isArray).map(_.elements().asScala.toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "not a CDAP pipeline document: no config.stages array"))
    def props(stage: com.fasterxml.jackson.databind.JsonNode): Map[String, String] = {
      val p = stage.path("plugin").path("properties")
      p.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
    val sources = stages
      .filter(_.path("plugin").path("name").asText() == "MapRStream")
      .map(st => streamConfig(props(st), macros, defaultBrokers))
    val sinks = stages
      .filter(_.path("plugin").path("name").asText() == "MapRDBJSON")
      .map(st => docSinkConfig(props(st), macros))
    require(sources.nonEmpty || sinks.nonEmpty,
      "pipeline has no MapRStream source or MapRDBJSON sink stage")
    PipelinePlugins(sources, sinks)
  }
}
