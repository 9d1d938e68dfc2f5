package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels, shared by the interpreted and
  * codegen'd paths of the expressions below. A training-data pipeline's
  * first cleaning pass is canonicalization — the same logical text arrives
  * as precomposed (U+00E9) and decomposed (`e` + U+0301) byte sequences,
  * and every downstream dedup/fingerprint/shingle operator treats them as
  * distinct documents unless normalization runs first. The reference
  * pipeline lowercases/trims only (data_loader.py:331-332); these kernels
  * extend that cleaning family to the Unicode level.
  *
  * Kept as static Java-callable methods so `doGenCode` can emit a single
  * static call — the expression stays inside WholeStageCodegen (no closure
  * dispatch, no UDF serialization), the same pattern as
  * [[graft.functions.DotProduct]].
  */
object TextNorm {
  /** NFD-decompose, then drop combining marks (Unicode category Mn) —
    * `café` → `cafe`. Matches DuckDB's `strip_accents` on Latin text,
    * which the q_text_normalize oracle pins. Non-Latin codepoints without
    * decompositions (CJK, emoji) pass through untouched.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: pure-ASCII strings (the overwhelming majority in a web
    // corpus) have no decompositions — skip the Normalizer allocation.
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val c = nfd.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Canonical composition (NFC) — the byte-stable form a dedup pipeline
    * should fingerprint. Same ASCII fast path.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native codegen'd `strip_accents(string)` (SURVEY §2.10 extension). */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd `nfc_normalize(string)` (SURVEY §2.10 extension). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** Accent/diacritic removal as a Column op. */
  def stripAccents(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c.cast("string"))))

  /** Unicode NFC canonicalization as a Column op. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c.cast("string"))))
}
