package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PipelineConfig, StreamSource}

/** The CDAP pipeline-config porting shim: stage property maps with
  * `${macro}` values resolve to the engine's constructor configs exactly
  * where the reference marks @Macro, with CDAP's resolution semantics
  * (recursive innermost-first, unresolvable = loud, function macros
  * evaluated from explicitly-supplied values only). No SparkSession —
  * pure config parsing. */
class PipelineConfigSpec extends AnyFunSuite {

  test("plain, recursive and repeated macro substitution") {
    val macros = Map(
      "env" -> "prod",
      "topic.base" -> "events-${env}",
      "t1" -> "a", "t2" -> "b")
    assert(PipelineConfig.substitute("no macros here", macros) == "no macros here")
    assert(PipelineConfig.substitute("${t1},${t2},${t1}", macros) == "a,b,a")
    // recursive: the argument's value itself carries a macro
    assert(PipelineConfig.substitute("${topic.base}-v2", macros) == "events-prod-v2")
    // literal $ without brace passes through
    assert(PipelineConfig.substitute("cost: $5", macros) == "cost: $5")
  }

  test("unresolvable, cyclic and unknown-function macros fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      PipelineConfig.substitute("${missing}", Map.empty)
    }
    assert(e1.getMessage.contains("missing"))
    val e2 = intercept[IllegalArgumentException] {
      PipelineConfig.substitute("${a}", Map("a" -> "${b}", "b" -> "${a}"))
    }
    assert(e2.getMessage.contains("depth"))
    val e3 = intercept[IllegalArgumentException] {
      PipelineConfig.substitute("${token(apikey)}", Map.empty)
    }
    assert(e3.getMessage.contains("unknown function macro"))
  }

  test("secure() resolves from the supplied map only; absent key/map is loud") {
    assert(PipelineConfig.substitute("${secure(apikey)}", Map.empty,
      secure = Map("apikey" -> "s3cr3t")) == "s3cr3t")
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.substitute("${secure(apikey)}", Map.empty)
    }
    assert(e.getMessage.contains("secure key 'apikey'"))
  }

  test("logicalStartTime(): format, subtracted offset algebra, timezone, epoch default") {
    // 2021-03-02T10:00:00 UTC
    val t0 = Some(1614679200000L)
    def sub(v: String) =
      PipelineConfig.substitute(v, Map.empty, logicalStartTime = t0)
    assert(sub("${logicalStartTime()}") == "1614679200000")
    assert(sub("${logicalStartTime(yyyy-MM-dd)}") == "2021-03-02")
    // CDAP's documented shape: offset 1d-4h+30m is SUBTRACTED → 20h30m earlier
    assert(sub("${logicalStartTime(yyyy-MM-dd'T'HH:mm,1d-4h+30m)}")
      == "2021-03-01T13:30")
    // quoted comma inside the format survives the arg split
    assert(sub("${logicalStartTime(yyyy-MM-dd','HH,1h)}") == "2021-03-02,09")
    // explicit timezone (3rd arg)
    assert(sub("${logicalStartTime(HH:mm,0s,America/New_York)}") == "05:00")
    // nested plain macro inside the function args resolves innermost-first
    assert(PipelineConfig.substitute("${logicalStartTime(${fmt})}",
      Map("fmt" -> "yyyy"), logicalStartTime = t0) == "2021")
    // no supplied instant = loud (never the wall clock)
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.substitute("${logicalStartTime(yyyy)}", Map.empty)
    }
    assert(e.getMessage.contains("no logical start instant"))
    // malformed offset is loud
    val e2 = intercept[IllegalArgumentException](sub(
      "${logicalStartTime(yyyy,tomorrow)}"))
    assert(e2.getMessage.contains("malformed logicalStartTime offset"))
  }

  test("function macros flow through the @Macro config fields") {
    val props = Map(
      "referenceName" -> "daily",
      "topics" -> "events-${logicalStartTime(yyyy-MM-dd,1d)}",
      "offsetField" -> "beginning")
    val cfg = PipelineConfig.streamConfig(props,
      logicalStartTime = Some(1614679200000L))
    assert(cfg.topics == Seq("events-2021-03-01"))
  }

  test("a MapRStream stage's properties build a StreamConfig (macro fields substituted)") {
    // field names are the reference's (MapRStreamConfig.java): topics and
    // offsetField are @Macro, schema/format/referenceName are not
    val props = Map(
      "referenceName" -> "clickstream",
      "topics" -> "${stream.topic}, audit",
      "offsetField" -> "${start.from}",
      "format" -> "csv",
      "schema" -> """{"type":"record","name":"rec","fields":[
          {"name":"user","type":"string"},{"name":"n","type":"long"}]}""")
    val cfg = PipelineConfig.streamConfig(props,
      macros = Map("stream.topic" -> "clicks", "start.from" -> "Beginning"))
    assert(cfg.referenceName == "clickstream")
    assert(cfg.topics == Seq("clicks", "audit"))
    assert(cfg.initialOffset == "Beginning")
    assert(cfg.format.contains("csv"))
    // and the offset value flows through the reference's case-insensitive
    // "beginning" -> earliest mapping
    assert(StreamSource.kafkaOptions(cfg)("startingOffsets") == "earliest")
    assert(StreamSource.kafkaOptions(cfg)("subscribe") == "clicks,audit")
  }

  test("absent offset/format/schema take reference defaults (latest, bytes, null schema)") {
    val cfg = PipelineConfig.streamConfig(
      Map("referenceName" -> "raw_feed", "topics" -> "t"))
    assert(cfg.initialOffset == "latest")
    assert(cfg.format.isEmpty && cfg.avroSchemaJson.isEmpty)
    assert(StreamSource.kafkaOptions(cfg)("startingOffsets") == "latest")
  }

  test("an invalid source referenceName fails at configure time, like the sink's") {
    // round-9 advice: only docSinkConfig validated the referenceName at
    // configure time; the source-side invalid name surfaced later inside
    // StreamSource.read, weakening the configure-time-failure discipline
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.streamConfig(
        Map("referenceName" -> "bad name!", "topics" -> "t"))
    }
    assert(e.getMessage.contains("referenceName"))
  }

  test("a malformed declared schema fails at configure time, not at read time") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.streamConfig(Map(
        "referenceName" -> "r", "topics" -> "t",
        "schema" -> """{"type":"record","fields":"""))
    }
    assert(e.getMessage.contains("schema"))
  }

  test("a MapRDBJSONSink stage's properties build a DocSinkSpec (all three @Macro)") {
    val spec = PipelineConfig.docSinkConfig(
      Map(
        "referenceName" -> "profiles",
        "tableName" -> "/tables/${env}/users",
        "key" -> "${id.field}",
        "schema" -> """{"type":"record","name":"rec","fields":[
            {"name":"user_id","type":"string"}]}"""),
      macros = Map("env" -> "prod", "id.field" -> "user_id"))
    assert(spec.tableName == "/tables/prod/users")
    assert(spec.keyField == "user_id")
    assert(spec.avroSchemaJson.isDefined)
  }

  test("random acyclic macro graphs resolve like a reference resolver; cycles always fail") {
    val rnd = new scala.util.Random(5)
    // reference resolver: repeatedly expand against the map until fixed
    // point (guaranteed on a DAG)
    def ref(v: String, m: Map[String, String]): String = {
      var cur = v
      var prev = ""
      while (cur != prev) {
        prev = cur
        for ((k, value) <- m) cur = cur.replace("${" + k + "}", value)
      }
      cur
    }
    for (trial <- 0 until 20) {
      // layered DAG: layer-i macros may reference only layer-(i+1) macros
      val layers = (0 until 4).map { l =>
        (0 until 3).map(i => s"m${l}_$i").toSeq
      }
      val macros = layers.zipWithIndex.flatMap { case (names, l) =>
        names.map { n =>
          val body =
            if (l == layers.size - 1 || rnd.nextBoolean()) s"lit-$n"
            else {
              val next = layers(l + 1)(rnd.nextInt(3))
              s"pre-$${$next}-post"
            }
          n -> body
        }
      }.toMap
      val top = layers.head(rnd.nextInt(3))
      val v = s"x $${$top} y"
      assert(PipelineConfig.substitute(v, macros) == ref(v, macros),
        s"trial $trial")
    }
    // any directed cycle fails with the depth message, never spins
    val cyc = Map("a" -> "${b}", "b" -> "${c}", "c" -> "x${a}x")
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.substitute("${a}", cyc)
    }
    assert(e.getMessage.contains("depth"))
  }

  test("a full CDAP pipeline document resolves both plugin stages, ignoring transforms") {
    val json = """{
      "name": "ingest-clicks",
      "config": {
        "stages": [
          {"name": "src", "plugin": {"name": "MapRStream", "type": "streamingsource",
            "properties": {"referenceName": "clicks", "topics": "${t}",
              "offsetField": "beginning", "format": "csv"}}},
          {"name": "clean", "plugin": {"name": "Wrangler", "type": "transform",
            "properties": {"directives": "drop :junk"}}},
          {"name": "sink", "plugin": {"name": "MapRDBJSON", "type": "batchsink",
            "properties": {"referenceName": "profiles",
              "tableName": "/tables/users", "key": "user_id"}}}
        ]
      }
    }"""
    val p = PipelineConfig.fromPipelineJson(json, macros = Map("t" -> "clicks-v2"))
    assert(p.sources.map(_.topics) == Seq(Seq("clicks-v2")))
    assert(p.sources.head.initialOffset == "beginning")
    assert(p.sinks.map(_.tableName) == Seq("/tables/users"))
    // a document with no recognized stage is an error, not empty output
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.fromPipelineJson(
        """{"config":{"stages":[{"plugin":{"name":"Wrangler","properties":{}}}]}}""")
    }
    assert(e.getMessage.contains("no MapRStream"))
    // a non-pipeline document fails with the document shape named
    val e2 = intercept[IllegalArgumentException] {
      PipelineConfig.fromPipelineJson("""{"foo": 1}""")
    }
    assert(e2.getMessage.contains("config.stages"))
  }

  test("missing required stage properties are named in the error") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.streamConfig(Map("referenceName" -> "r"))
    }
    assert(e.getMessage.contains("topics"))
    val e2 = intercept[IllegalArgumentException] {
      PipelineConfig.docSinkConfig(Map("referenceName" -> "r", "tableName" -> "t"))
    }
    assert(e2.getMessage.contains("key"))
  }
}
