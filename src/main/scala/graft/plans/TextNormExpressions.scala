package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst wrappers for the [[graft.functions.TextNorm]] scrub
  * kernels (`normalize_text`, `html_to_text`, `canonical_url`) — the same
  * ladder step [[VectorExpressions]] takes for the vector kernels: the
  * call compiles INTO the surrounding WholeStageCodegen projection, so a
  * scan → normalize → filter pipeline stays one codegen span with no UDF
  * invocation boundary (no ScalaUDF wrapper, no encoder round-trip).
  *
  * The kernels operate on java.lang.String (java.text.Normalizer's input
  * type), so each row pays one UTF8String→String materialization either
  * way; what the native form removes is the per-call UDF plumbing around
  * it. Scrub semantics live in ONE place — [[graft.functions.TextNorm]] —
  * and these wrappers delegate, so the UDF path, the SQL-function path
  * and the oracle replay can never drift apart (ExtensionsSpec pins the
  * three-way agreement).
  */
sealed abstract class TextNormUnaryExpression extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING argument, got ${other.simpleString}")
    }
}

/** `normalize_text(s)` — NFC + control strip + whitespace collapse + trim */
case class NormalizeText(child: Expression) extends TextNormUnaryExpression {
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.functions.TextNorm.normalize(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.TextNorm.normalize($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** `html_to_text(html)` — script/style drop, tag strip, entity decode */
case class HtmlToText(child: Expression) extends TextNormUnaryExpression {
  override def prettyName: String = "html_to_text"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.functions.TextNorm.htmlToText(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.TextNorm.htmlToText($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

/** `canonical_url(url)` — the pinned crawl-dedup canonicalization rules */
case class CanonicalizeUrl(child: Expression) extends TextNormUnaryExpression {
  override def prettyName: String = "canonical_url"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.functions.TextNorm.canonicalizeUrl(
        s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.TextNorm.canonicalizeUrl($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}
