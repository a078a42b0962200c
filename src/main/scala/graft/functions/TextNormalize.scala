package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the first step of every dedup/quality
  * pipeline over real web text: visually identical strings with different
  * code-point sequences (composed `á` vs `a`+U+0301, compatibility forms)
  * must hash identically before exact/MinHash dedup (d04/d06) or shingle
  * contamination checks (d12) can see through them, and accent folding is
  * the standard pre-tokenization step for latin-script matching.
  *
  * Static JVM kernels (`java.text.Normalizer` implements the Unicode
  * standard) invoked from real `doGenCode` — the expressions stay inside
  * whole-stage codegen like the built-in string functions, no interpreted
  * fallback in the corpus-scan hot path.
  */
object TextNormKernels {
  // the form enum is a compile-time constant of the expression; the
  // generated code passes its ordinal so the hot path never does a
  // per-row valueOf lookup
  private val forms: Array[Normalizer.Form] = Normalizer.Form.values()

  def formOrdinal(form: String): Int = Normalizer.Form.valueOf(form).ordinal

  def normalize(s: String, formOrdinal: Int): String =
    Normalizer.normalize(s, forms(formOrdinal))

  /** NFD-decompose, drop combining marks, NFC-recompose what remains.
    * Iterates by CODE POINT so supplementary-plane combining marks
    * (non-BMP Mn, e.g. U+1DA00) strip too — matching utf8proc. */
  def stripAccents(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) {
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    Normalizer.normalize(sb, Normalizer.Form.NFC)
  }
}

/** `normalize_text(s, 'NFC'|'NFD'|'NFKC'|'NFKD')` — Unicode normalization
  * form of a string. */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  private val formOrd: Int = TextNormKernels.formOrdinal(form)

  override def prettyName: String = "normalize_text"
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      TextNormKernels.normalize(v.asInstanceOf[UTF8String].toString, formOrd))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.TextNormKernels.normalize($c.toString(), $formOrd));
         |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}

/** `strip_accents(s)` — remove combining diacritical marks (NFD → drop
  * Mn → NFC), matching DuckDB/utf8proc semantics for latin scripts. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      TextNormKernels.stripAccents(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.TextNormKernels.stripAccents($c.toString()));
         |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}
