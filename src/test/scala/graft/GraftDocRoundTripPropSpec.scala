package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.connector.GraftDoc

/** Property: rows of random schemas round-trip bit-exactly through the
  * graft-doc connector (write → commit log → pruned scan → snapshot) —
  * the connector-level twin of `AvroRoundTripPropSpec`, over the JSON
  * document codec instead of Avro. Covers nested structs and timestamps
  * on top of the flat lattice, since the JSON path (JacksonGenerator/
  * Parser) is the component under test.
  */
class GraftDocRoundTripPropSpec extends SparkSpec {

  private val leafType: Gen[DataType] = Gen.oneOf[DataType](
    BooleanType, IntegerType, LongType, DoubleType, StringType,
    DateType, TimestampType,
    ArrayType(LongType), ArrayType(StringType))

  private val fieldType: Gen[DataType] = Gen.frequency(
    4 -> leafType,
    1 -> Gen.listOfN(2, leafType).map(ts => StructType(
      ts.zipWithIndex.map { case (t, i) => StructField(s"n$i", t) })))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 6)
    types <- Gen.listOfN(n, fieldType)
    nullables <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield StructType(
    StructField("key", LongType, nullable = false) +:
      types.zip(nullables).zipWithIndex.map {
        case ((dt, nu), i) => StructField(s"f$i", dt, nullable = nu)
      })

  private def valueGen(dt: DataType, nullable: Boolean): Gen[Any] = {
    val base: Gen[Any] = dt match {
      case BooleanType => Gen.oneOf(true, false)
      case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
      case LongType => Gen.choose(Long.MinValue, Long.MaxValue)
      case DoubleType => Gen.choose(-1e12, 1e12)
      case StringType => Gen.asciiPrintableStr.map(_.take(24))
      case DateType =>
        Gen.choose(-30000, 30000).map(d => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(d.toLong)))
      case TimestampType =>
        Gen.choose(-4e12.toLong, 4e12.toLong).map(new java.sql.Timestamp(_))
      case ArrayType(et, _) =>
        Gen.listOfN(3, valueGen(et, nullable = false)).map(_.toSeq)
      case st: StructType => rowGen(st)
      case other => throw new IllegalArgumentException(other.toString)
    }
    if (nullable) Gen.frequency(4 -> base, 1 -> Gen.const(null)) else base
  }

  private def rowGen(st: StructType): Gen[Row] =
    Gen.sequence[List[Any], Any](
      st.fields.toList.map(f => valueGen(f.dataType, f.nullable)))
      .map(vs => Row.fromSeq(vs))

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    LazyList.iterate(Seed(seed))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  test("property: 30 random (schema, rows) round-trip through graft-doc") {
    for ((st, i) <- samples(schemaGen, 30, 4321L).zipWithIndex) {
      val dir = Files.createTempDirectory("graft_doc_prop").toString
      // distinct keys — duplicate _ids within one commit are out of
      // contract (documented in GraftDoc.snapshot)
      val rows = samples(rowGen(st), 6, 99L + i)
        .zipWithIndex.map { case (r, k) => Row.fromSeq(k.toLong +: r.toSeq.tail) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), st)
      GraftDoc.write(df, "key", dir, overwrite = true)
      val back = GraftDoc.snapshot(spark, dir)
      // _id returns as string (the key hoist casts); compare the body and
      // the key value through the cast
      val got = back.collect()
        .map(r => r.getString(0).toLong +: r.toSeq.tail.map(normalize))
        .map(_.toList).toSet
      val want = rows
        .map(r => r.toSeq.head +: r.toSeq.tail.map(normalize))
        .map(_.toList).toSet
      assert(got == want, s"schema #$i mismatch: ${st.simpleString}\n got=$got\nwant=$want")
    }
  }

  private def normalize(v: Any): Any = v match {
    case s: Seq[_] => s.map(normalize).toList
    case a: Array[_] => a.map(normalize).toList
    case r: Row => r.toSeq.map(normalize).toList
    case other => other
  }
}
