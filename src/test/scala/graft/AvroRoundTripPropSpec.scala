package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.AvroExpressions
import graft.schema.AvroSchemaBridge

/** Property: record → Avro binary → record round-trips over random flat
  * schemas drawn from the §1.3 type lattice (SURVEY.md §5.3) — the
  * engine-side equivalent of the reference's record→document→record path
  * (`MapRDBJSONSink.java:118-147` typed field switch).
  */
class AvroRoundTripPropSpec extends SparkSpec {

  private val fieldType: Gen[DataType] = Gen.oneOf[DataType](
    BooleanType, IntegerType, LongType, FloatType, DoubleType, StringType,
    ArrayType(IntegerType), ArrayType(StringType), ArrayType(DoubleType))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 8)
    types <- Gen.listOfN(n, fieldType)
    nullables <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield StructType(types.zip(nullables).zipWithIndex.map {
    case ((dt, nu), i) => StructField(s"f$i", dt, nullable = nu)
  })

  private def valueGen(dt: DataType, nullable: Boolean): Gen[Any] = {
    val base: Gen[Any] = dt match {
      case BooleanType => Gen.oneOf(true, false)
      case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
      case LongType => Gen.choose(Long.MinValue, Long.MaxValue)
      case FloatType => Gen.choose(-1e6f, 1e6f)
      case DoubleType => Gen.choose(-1e12, 1e12)
      case StringType => Gen.asciiPrintableStr.map(_.take(32))
      case ArrayType(et, _) =>
        Gen.listOfN(3, valueGen(et, nullable = false)).map(_.toSeq)
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

  test("property: 60 random (schema, rows) round-trip through Avro encode/decode") {
    import org.apache.spark.sql.functions._
    for ((st, i) <- samples(schemaGen, 60, 1234L).zipWithIndex) {
      val avroJson = AvroSchemaBridge.avroJsonFromStructType(st)
      val rows = samples(rowGen(st), 5, 777L + i)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(identity), 2), st)
      val cols = st.fieldNames.map(col).toSeq
      val back = df
        .select(AvroExpressions.to_avro_graft(struct(cols: _*), avroJson).as("v"))
        .select(AvroExpressions.from_avro_graft(col("v"), avroJson).as("r"))
        .select(st.fieldNames.map(n => col(s"r.$n").as(n)): _*)
      val got = back.collect().map(_.toSeq.map(normalize)).toSet
      val want = rows.map(_.toSeq.map(normalize)).toSet
      assert(got == want, s"schema #$i mismatch: $st\n got=$got\nwant=$want")
    }
  }

  private def normalize(v: Any): Any = v match {
    case s: Seq[_] => s.map(normalize).toList
    case a: Array[_] => a.map(normalize).toList
    case f: Float => f.toDouble
    case other => other
  }
}
