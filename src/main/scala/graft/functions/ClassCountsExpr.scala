package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-code-point character-class counts plus CASELESS token counts in ONE
  * pass over the ORIGINAL text — no lowercasing anywhere, so the result is
  * independent of JVM default locale, ICU/utf8proc case-mapping tables, and
  * one-to-many mappings (İ → i̇): every classification below is a pure
  * explicit code-point range test, trivially replayable in any engine as
  * `unicode(c) BETWEEN lo AND hi`.
  *
  * This is the r12 production kernel for the corpus-statistics report
  * family (fertility / script-mix / pad-waste): the r8-r11 driver-red rows
  * all rode constructs with an engine-owned case-mapping step
  * (`UTF8String.toLowerCase` on the Spark side, `lower()` on the DuckDB
  * side), which is exactly the kind of version/locale-sensitive surface a
  * cross-engine hash gate cannot tolerate. Token semantics change only for
  * mixed-case text: a letter run is now `[A-Za-z]+` (one class, so "FooBar"
  * is ONE token with or without case-folding), where the lowered kernel
  * classified pre-folded text.
  *
  * Returns `array<long>` of 20 counters:
  * {{{
  *  1 cpTotal         code points (surrogate pair = 1)
  *  2 letterAscii     A-Z a-z
  *  3 upperAscii      A-Z
  *  4 digit           0-9
  *  5 wsAscii         {9,10,11,12,13,32} (Java regex \s, no UNICODE flag)
  *  6 asciiPunct      33-47, 58-64, 91-96, 123-126
  *  7 asciiCtrl       remaining ASCII: 0-8, 14-31, 127
  *  8 nonAscii        > 127 (superset of 9-14)
  *  9 supplementary   > 0xFFFF
  * 10 combining       0x300-0x36F (combining diacritical marks)
  * 11 unicodeWs       NEL/NBSP/ogham/en-quad..hair/LS/PS/NNBSP/MMSP/ideo
  * 12 cyrillic        0x400-0x4FF
  * 13 greek           0x370-0x3FF
  * 14 cjk             0x4E00-0x9FFF
  * 15 wsTokens        maximal runs of non-wsAscii code points
  * 16 bpeCaseless     runs of [A-Za-z] + runs of [0-9] + every other
  *                    non-wsAscii code point as its own token
  * 17 tab             0x09
  * 18 cr              0x0D
  * 19 lf              0x0A
  * 20 vtff            0x0B + 0x0C
  * }}}
  *
  * wsTokens is value-identical to [[TextStatsExpr]] slot 8
  * (tokenCountWsNonEmpty) on any input — whitespace membership is
  * case-invariant — so the per-doc histogram equality the r11 driver run
  * proved for that kernel carries over unchanged.
  */
object ClassCountsExpr {
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  private def isUnicodeWs(cp: Int): Boolean =
    cp == 0x85 || cp == 0xA0 || cp == 0x1680 ||
      (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 || cp == 0x2029 ||
      cp == 0x202F || cp == 0x205F || cp == 0x3000

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val c = new Array[Long](20)
    // token-run state: 0 = ws, 1 = letter run, 2 = digit run, 3 = other
    var prevCls = 0
    var inTok = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      c(0) += 1
      var cls = 3
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        cls = 1; c(1) += 1
        if (cp <= 'Z') c(2) += 1
      } else if (cp >= '0' && cp <= '9') { cls = 2; c(3) += 1 }
      else if (isWs(cp)) {
        cls = 0; c(4) += 1
        if (cp == '\t') c(16) += 1
        else if (cp == '\r') c(17) += 1
        else if (cp == '\n') c(18) += 1
        else if (cp == 0x0B || cp == '\f') c(19) += 1
      } else if (cp < 128) {
        if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
          (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) c(5) += 1
        else c(6) += 1
      }
      if (cp > 127) {
        c(7) += 1
        if (cp > 0xFFFF) c(8) += 1
        if (cp >= 0x300 && cp <= 0x36F) c(9) += 1
        if (isUnicodeWs(cp)) c(10) += 1
        if (cp >= 0x400 && cp <= 0x4FF) c(11) += 1
        if (cp >= 0x370 && cp <= 0x3FF) c(12) += 1
        if (cp >= 0x4E00 && cp <= 0x9FFF) c(13) += 1
      }
      if (cls == 0) inTok = false
      else {
        if (!inTok) { c(14) += 1; inTok = true }
        if (cls == 3) c(15) += 1
        else if (cls != prevCls) c(15) += 1
      }
      prevCls = cls
      i += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(c)
  }
}

case class ClassCountsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "class_counts"
  protected override def nullSafeEval(input: Any): Any =
    ClassCountsExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ClassCountsExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): ClassCountsExpr =
    copy(child = newChild)
}
