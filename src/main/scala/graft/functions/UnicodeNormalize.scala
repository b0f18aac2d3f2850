package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition cleanup every text-dedup pipeline runs before
  * fingerprinting: a decomposed `e` + COMBINING ACUTE (U+0065 U+0301)
  * and the precomposed `é` (U+00E9) are the SAME text to a reader but
  * different bytes to `md5`/MinHash, so un-normalized corpora leak
  * duplicates past every exact/near-dup operator. (No reference
  * counterpart; standard pipeline hygiene.)
  *
  * Built on `java.text.Normalizer` (JDK, Unicode canonical composition
  * — the same algorithm DuckDB's `nfc_normalize` implements, which is
  * what makes the oracle row meaningful). A custom expression rather
  * than a UDF keeps it inside whole-stage codegen like the rest of the
  * text stack; the fast path skips the Normalizer entirely for strings
  * that are already NFC (`Normalizer.isNormalized` — true for ~all
  * real-world text, and always for pure ASCII).
  */
case class UnicodeNormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormalizeNfc$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeNfc =
    copy(child = newChild)
}

object UnicodeNormalizeNfc {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
