package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene kernels for corpus cleaning: canonical normalization
  * and mojibake (encoding-corruption) repair.
  *
  * Both are pure per-row string transforms — native expressions so they
  * run as one static call inside whole-stage codegen, with an ASCII
  * fast path that returns the input buffer untouched (no allocation):
  * on a mostly-ASCII 100 TB corpus the common row costs one scan of the
  * char array and nothing else.
  */
object UnicodeText {

  private def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    // isNormalized is a cheap scan with an ASCII short-circuit; the
    // common (already-normalized) row allocates nothing new
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)
  def nfd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFD)
  def nfkd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKD)

  /** Windows-1252's 27 printable code points in the 0x80–0x9F byte range,
    * keyed by the char they decode to (public code-page table). Everything
    * else in "sloppy cp1252" maps a char <= 0xFF to its low byte — the
    * union handles text corrupted through EITHER a latin-1 OR a cp1252
    * misdecode, the two mappings real mojibake comes from. */
  private val cp1252Inv: java.util.HashMap[Character, java.lang.Byte] = {
    val pairs = Seq(
      0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
      0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
      0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
      0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
      0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
      0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
      0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    pairs.foreach { case (c, b) => m.put(c.toChar, b.toByte) }
    m
  }

  /** Repair UTF-8 text that was misdecoded as latin-1/windows-1252
    * ("mojibake": `Ã©` for `é`, `â€™` for `’`). All-or-nothing per
    * string: re-encode every char through the sloppy-cp1252 byte map and
    * accept the result only if the byte string is STRICTLY valid UTF-8
    * (and therefore shorter) — otherwise the input is returned untouched.
    * A legitimately accented text (`café`) re-encodes to bytes that are
    * NOT valid UTF-8, so it never false-repairs; the validity gate is the
    * same criterion ftfy's decoding heuristic rests on. Deterministic,
    * single pass, no partial rewrites. */
  def fixMojibake(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    // gate: any char a latin-1/cp1252 misdecode could have produced
    var suspicious = false
    var i = 0
    while (i < n && !suspicious) {
      val c = str.charAt(i)
      if ((c >= 0x80 && c <= 0xFF) || cp1252Inv.containsKey(c)) suspicious = true
      i += 1
    }
    if (!suspicious) return s
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c <= 0xFF) bytes(i) = c.toByte
      else {
        val b = cp1252Inv.get(c)
        if (b == null) return s // char no misdecode produces -> not mojibake
        bytes(i) = b.byteValue()
      }
      i += 1
    }
    try {
      val out = StandardCharsets.UTF_8.newDecoder() // strict: REPORT on malformed
        .decode(ByteBuffer.wrap(bytes)).toString
      // a valid decode with a >= 0x80 byte always collapses a multi-byte
      // sequence; keep the invariant explicit as a safety net
      if (out.length < n) UTF8String.fromString(out) else s
    } catch { case _: CharacterCodingException => s }
  }
}

/** `unicode_normalize(text)` in one of the four Unicode normal forms. */
case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {
  require(NormalizeExpr.methods.contains(form),
    s"form must be one of ${NormalizeExpr.methods.keys.mkString(", ")}, got $form")
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"
  private def method: String = NormalizeExpr.methods(form)
  protected override def nullSafeEval(input: Any): Any = form match {
    case "NFC" => UnicodeText.nfc(input.asInstanceOf[UTF8String])
    case "NFKC" => UnicodeText.nfkc(input.asInstanceOf[UTF8String])
    case "NFD" => UnicodeText.nfd(input.asInstanceOf[UTF8String])
    case "NFKD" => UnicodeText.nfkd(input.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeText.$method($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {
  private val methods = Map(
    "NFC" -> "nfc", "NFKC" -> "nfkc", "NFD" -> "nfd", "NFKD" -> "nfkd")
}

/** `fix_mojibake(text)` — see [[UnicodeText.fixMojibake]]. */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  protected override def nullSafeEval(input: Any): Any =
    UnicodeText.fixMojibake(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeText.fixMojibake($c)")
  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}
