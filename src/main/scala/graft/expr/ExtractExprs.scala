package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.extract.Extractor

/** `graft_extract(html BINARY, lang STRING) ->
  *   STRUCT<text:STRING, spans:ARRAY<STRUCT<start:INT,end:INT,kind:STRING>>, error:STRING>`
  *
  * The recognize stage as a native Catalyst expression — the hot loop
  * runs in-JVM inside the task with zero UDF ser/de (SURVEY.md §4.2;
  * reference equivalent: pytesseract.image_to_string per page,
  * main_window.py:365-370, which paid a process spawn per call).
  *
  * Single-pass struct return: text + spans + error come from ONE
  * tokenize/classify pass (SURVEY.md §4.2 "single-pass extract").
  * `CodegenFallback` keeps the surrounding operators in whole-stage
  * codegen; the expression itself is a straight JVM call.
  *
  * Error policy: parse failures return a row with `error` set, never
  * an exception (ocr_parallel_ui.py:33-34).
  */
case class ExtractMainText(left: Expression, right: Expression,
    engine: graft.extract.Engine = graft.extract.Engine.Default)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_extract"

  override def dataType: DataType = ExtractMainText.schema

  override def nullable: Boolean = false

  // html=null behaves like an empty payload; lang=null like "en".
  override def eval(input: InternalRow): Any = {
    val htmlAny = left.eval(input)
    val langAny = right.eval(input)
    val html = if (htmlAny == null) Array.emptyByteArray else htmlAny.asInstanceOf[Array[Byte]]
    val lang = if (langAny == null) "en" else langAny.toString
    val r = Extractor.extract(html, lang, engine)
    val spans = new GenericArrayData(r.spans.map { s =>
      InternalRow(s.start, s.end, UTF8String.fromString(s.kind))
    }.toArray[Any])
    InternalRow(
      if (r.text == null) null else UTF8String.fromString(r.text),
      spans,
      if (r.error == null) null else UTF8String.fromString(r.error))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ExtractMainText {
  val spanType: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = false),
    StructField("error", StringType, nullable = true)))
}
