package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.AvroSchemaBridge
import scala.jdk.CollectionConverters._

/** Native Catalyst expressions for the reference's `avro` wire format
  * (SURVEY.md §2.2 F5; format dispatch at reference
  * `MapRStreamingSource.java:174-181`).
  *
  * The reference decodes per record through CDAP's reflective
  * `RecordFormat` SPI; here decode is a Catalyst expression so the schema
  * is resolved once at plan time and the per-row path is a reused
  * `BinaryDecoder` with no reflection. `CodegenFallback` keeps it inside
  * whole-stage codegen pipelines (called as a leaf), which is fine for a
  * decode boundary; the surrounding projections stay codegen'd.
  *
  * Supports the reference's type lattice (§1.3): the seven primitives,
  * nullable unions, and one-level arrays — including correct
  * `array<bytes>` and `array<nullable T>` (reference quirks 3+4 fixed).
  */
object AvroExpressions {

  def from_avro_graft(c: Column, schemaJson: String): Column =
    bridge.column(AvroDecodeExpr(bridge.expression(c), schemaJson))

  def to_avro_graft(c: Column, schemaJson: String): Column =
    bridge.column(AvroEncodeExpr(bridge.expression(c), schemaJson))

  private[functions] def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s, StringType) => UTF8String.fromString(s.toString) // Utf8 or String
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (b: Array[Byte], BinaryType) => b
    // covers Avro's GenericData.Array too (it implements java.util.List)
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      new GenericArrayData(a.asScala.map(toCatalyst(_, et)).toArray)
    case (x, _) => x // boolean/int/long/float/double pass through
  }

  private[functions] def fromCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: UTF8String, StringType) => s.toString
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).map(fromCatalyst(_, et)).toList.asJava
    case (x, _) => x
  }
}

/** binary → struct per an Avro-JSON schema (flat record, §1.3 lattice). */
case class AvroDecodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  // resolved ONCE and cached: dataType is called on the per-row decode
  // path below, and re-parsing the Avro-JSON (Jackson readTree + full
  // StructType reconstruction) per record would dominate the decode cost
  @transient override lazy val dataType: StructType =
    AvroSchemaBridge.structTypeFromAvroJson(schemaJson).get
  override def nullable: Boolean = true
  override def prettyName: String = "from_avro_graft"

  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)
  @transient private var decoder: BinaryDecoder = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    // PERMISSIVE like from_csv/from_json: a truncated or corrupt payload
    // yields null instead of killing the task — at 100 TB a poison record
    // must never fail the job
    try {
      decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
      val rec = reader.read(null, decoder)
      val st = dataType
      InternalRow.fromSeq(st.fields.toSeq.map { f =>
        AvroExpressions.toCatalyst(rec.get(f.name), f.dataType)
      })
    } catch {
      case scala.util.control.NonFatal(_) | _: java.io.EOFException => null
    }
  }

  override protected def withNewChildInternal(c: Expression): AvroDecodeExpr =
    copy(child = c)
}

/** struct → Avro binary per an Avro-JSON schema (inverse of decode). */
case class AvroEncodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "to_avro_graft"

  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](avroSchema)
  @transient private lazy val structType: StructType =
    child.dataType.asInstanceOf[StructType]
  @transient private var encoder: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val rec = new GenericData.Record(avroSchema)
    structType.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
      rec.put(f.name, AvroExpressions.fromCatalyst(v, f.dataType))
    }
    val out = new ByteArrayOutputStream()
    encoder = EncoderFactory.get().binaryEncoder(out, encoder)
    writer.write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(c: Expression): AvroEncodeExpr =
    copy(child = c)
}
