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
  * arguments, resolution is recursive and INNERMOST-first (an
  * argument's value — or a function macro's argument — may itself
  * contain macros) with a depth cap so a cycle fails loudly instead of
  * spinning, and an unresolvable name is a configure-time error (the
  * reference surfaces it at provisioning). The two CDAP macro
  * FUNCTIONS the reference's host evaluates are implemented against
  * explicitly-supplied runtime values — never ambient state, so a
  * ported config resolves identically on every run:
  *   - `${logicalStartTime(format[,offset[,timezone]])}` formats the
  *     SUPPLIED logical start instant (CDAP semantics: the offset —
  *     `1d-4h+30m` style, units s/m/h/d — is SUBTRACTED; timezone
  *     defaults to UTC; no format → epoch millis). A config that uses
  *     it without a supplied instant fails loudly — the engine never
  *     invents a wall-clock default.
  *   - `${secure(key)}` resolves from the supplied secure map (the
  *     porting stand-in for the CDAP secure store) or fails loudly.
  */
object PipelineConfig {

  // innermost-first: no braces inside the body, so nested macros
  // (`${logicalStartTime(${fmt})}`) resolve inner → outer across the
  // iteration loop
  private val MacroRe = """\$\{([^{}]*)\}""".r

  /** `${name}` / `${fn(args)}` substitution over one property value.
    * Non-macro text passes through untouched; `$` without `{` is
    * literal. */
  def substitute(value: String, macros: Map[String, String],
      logicalStartTime: Option[Long] = None,
      secure: Map[String, String] = Map.empty): String = {
    var cur = value
    var depth = 0
    while (MacroRe.findFirstIn(cur).isDefined) {
      depth += 1
      require(depth <= 10,
        s"macro recursion exceeds depth 10 resolving '$value' — cycle?")
      cur = MacroRe.replaceAllIn(cur, m => {
        val name = m.group(1)
        val v =
          if (name.contains("(")) evalFunction(name, logicalStartTime, secure)
          else macros.getOrElse(name, throw new IllegalArgumentException(
            s"unresolvable macro '$${$name}' — not in the runtime arguments"))
        scala.util.matching.Regex.quoteReplacement(v)
      })
    }
    cur
  }

  /** One CDAP macro-function call, evaluated deterministically. */
  private def evalFunction(call: String, logicalStartTime: Option[Long],
      secure: Map[String, String]): String = {
    val open = call.indexOf('(')
    require(call.endsWith(")"),
      s"malformed function macro '$${$call}' — missing closing paren")
    val fn = call.substring(0, open).trim
    val argStr = call.substring(open + 1, call.length - 1)
    fn match {
      case "secure" =>
        val key = argStr.trim
        require(key.nonEmpty, "secure() needs a key argument")
        secure.getOrElse(key, throw new IllegalArgumentException(
          s"secure key '$key' not in the supplied secure map — the " +
            "porting adapter substitutes from explicit values only"))
      case "logicalStartTime" =>
        val t0 = logicalStartTime.getOrElse(throw new IllegalArgumentException(
          "config uses ${logicalStartTime(...)} but no logical start " +
            "instant was supplied — the adapter never defaults to the " +
            "wall clock (a ported config must resolve identically on " +
            "every run)"))
        val args = splitArgs(argStr)
        if (args.isEmpty) t0.toString
        else {
          val fmt = args.head
          val offsetMs = if (args.size > 1) parseOffset(args(1)) else 0L
          val tz = if (args.size > 2) {
            val id = args(2)
            val z = java.util.TimeZone.getTimeZone(id)
            require(z.getID == id || id == "UTC",
              s"unknown timezone '$id' in logicalStartTime()")
            z
          } else java.util.TimeZone.getTimeZone("UTC")
          require(args.size <= 3,
            s"logicalStartTime() takes at most 3 arguments, got ${args.size}")
          val sdf = new java.text.SimpleDateFormat(fmt)
          sdf.setTimeZone(tz)
          sdf.format(new java.util.Date(t0 - offsetMs))
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown function macro '$${$other(...)}' — CDAP defines " +
            "secure() and logicalStartTime()")
    }
  }

  /** Comma-split that respects single-quoted format sections
    * (`yyyy-MM-dd'T'HH,mm` keeps the quoted comma). */
  private def splitArgs(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    for (c <- s) c match {
      case '\'' => inQuote = !inQuote; sb += c
      case ',' if !inQuote => out += sb.result().trim; sb.clear()
      case c2 => sb += c2
    }
    out += sb.result().trim
    out.result()
  }

  /** CDAP's logicalStartTime offset algebra: terms like `1d-4h+30m`
    * (units s/m/h/d), the whole value SUBTRACTED from the instant —
    * so `1d-4h+30m` means 20h30m earlier. */
  private def parseOffset(s: String): Long = {
    val TermRe = """([+-]?)(\d+)([smhd])""".r
    val terms = TermRe.findAllMatchIn(s).toSeq
    val consumed = terms.map(_.matched.length).sum
    require(consumed == s.replaceAll("\\s", "").length && terms.nonEmpty,
      s"malformed logicalStartTime offset '$s' — expected terms like 1d-4h+30m")
    terms.map { t =>
      val sign = if (t.group(1) == "-") -1L else 1L
      val n = t.group(2).toLong
      val unit = t.group(3) match {
        case "s" => 1000L
        case "m" => 60000L
        case "h" => 3600000L
        case _ => 86400000L
      }
      sign * n * unit
    }.sum
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
      defaultBrokers: String = "localhost:9092",
      logicalStartTime: Option[Long] = None,
      secure: Map[String, String] = Map.empty): StreamSource.StreamConfig = {
    def sub(v: String) = substitute(v, macros, logicalStartTime, secure)
    // same configure-time discipline as docSinkConfig: an invalid
    // referenceName fails HERE, not later inside StreamSource.read —
    // the reference plugin validates both stage kinds at configure time
    // (round-9 advice closed the source-side gap)
    require(Lineage.isValidReferenceName(required(properties, "referenceName")),
      s"invalid referenceName '${properties("referenceName")}'")
    val topics = sub(required(properties, "topics"))
    val offset = prop(properties, "offsetField").map(sub).getOrElse("latest")
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
      macros: Map[String, String] = Map.empty,
      logicalStartTime: Option[Long] = None,
      secure: Map[String, String] = Map.empty): DocSinkSpec = {
    def sub(v: String) = substitute(v, macros, logicalStartTime, secure)
    require(Lineage.isValidReferenceName(required(properties, "referenceName")),
      s"invalid referenceName '${properties("referenceName")}'")
    DocSinkSpec(
      referenceName = required(properties, "referenceName"),
      tableName = sub(required(properties, "tableName")),
      keyField = sub(required(properties, "key")),
      avroSchemaJson =
        validatedSchema(prop(properties, "schema").map(sub)))
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
      defaultBrokers: String = "localhost:9092",
      logicalStartTime: Option[Long] = None,
      secure: Map[String, String] = Map.empty): PipelinePlugins = {
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
      .map(st => streamConfig(props(st), macros, defaultBrokers,
        logicalStartTime, secure))
    val sinks = stages
      .filter(_.path("plugin").path("name").asText() == "MapRDBJSON")
      .map(st => docSinkConfig(props(st), macros, logicalStartTime, secure))
    require(sources.nonEmpty || sinks.nonEmpty,
      "pipeline has no MapRStream source or MapRDBJSON sink stage")
    PipelinePlugins(sources, sinks)
  }
}
