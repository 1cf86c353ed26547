package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Corpus text arrives in mixed normalization forms (NFD from macOS
  * filesystems and some OCR pipelines, NFC from most web text); every
  * downstream equality — exact dedup hashes, line-dedup joins, tokenizer
  * vocab lookups — silently fragments unless the corpus is canonicalized
  * first. Spark has no built-in for this (a Scala UDF would box every row
  * and fall out of whole-stage codegen), so this is a `UnaryExpression`
  * with the same reference-object `doGenCode` pattern as [[TokensExpr]].
  *
  * Fast paths: pure-ASCII rows (one UTF-8 byte per codepoint — the
  * overwhelming majority of a web corpus) return the input UTF8String
  * with zero allocation, before any UTF-16 decode; non-ASCII rows that
  * are already NFC pay one String decode for the `isNormalized` scan but
  * skip the normalize+re-encode. At 100 TB the expensive `normalize`
  * call runs only on the rows that actually need it.
  */
object NfcNormalizeExpr {
  import org.apache.spark.sql.graftbridge.Bridge

  def nfcNative(text: Column): Column =
    Bridge.column(NfcExpr(Bridge.expression(text.cast("string"))))
}

/** string → string in Unicode Normalization Form C. */
case class NfcExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  /** Called from both eval and generated code. */
  def run(input: UTF8String): UTF8String = {
    // pure-ASCII guard BEFORE any allocation: one UTF-8 byte per codepoint
    // ⇔ all ASCII, and ASCII is always NFC — the overwhelming majority of
    // a web corpus returns here without the String decode below
    if (input.numBytes == input.numChars) return input
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcExpr", this, classOf[NfcExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}
