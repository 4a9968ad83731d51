package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.pdf.PdfGen

/** `graft_make_pdf(line1 STRING, body STRING, page2 STRING) -> BINARY`
  *
  * Deterministic two-page PDF for the driver-attested roundtrip (x10):
  * page 1 is a RAW `/Length` stream showing `line1` then `body` as
  * literal strings (escape path exercised); page 2 is a FlateDecode
  * stream showing `page2` then the fixed hex string `hex ok`
  * (Inflater + hex paths exercised). Extracting the result with
  * graft_extract must yield
  * `--- صفحة 1 ---\n{line1}\n{body}\n\n--- صفحة 2 ---\n{page2}\nhex ok`
  * (each line whitespace-normalized) — which a DuckDB oracle predicts
  * from the same input columns.
  */
case class MakePdf(line1: Expression, body: Expression, page2: Expression)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "graft_make_pdf"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def first: Expression = line1
  override def second: Expression = body
  override def third: Expression = page2

  override def eval(input: InternalRow): Any = {
    def str(e: Expression): String = {
      val v = e.eval(input)
      if (v == null) "" else v.toString
    }
    PdfGen.makePdf(Seq(
      PdfGen.Page(Seq(PdfGen.Line(str(line1)), PdfGen.Line(str(body))), flate = false),
      PdfGen.Page(Seq(PdfGen.Line(str(page2)), PdfGen.Line("hex ok", PdfGen.HexStr)),
        flate = true)))
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(line1 = f, body = s, page2 = t)
}
