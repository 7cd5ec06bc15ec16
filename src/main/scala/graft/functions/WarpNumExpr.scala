package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Warp numeric coercion
  * (reference: Value.swift:147-211 doubleValue, :810-833 strictness):
  * numbers cast, booleans become 1/0, strings parse only when fully
  * numeric with no surrounding space ("true"/"false" count as 1/0), dates
  * and everything else have no numeric form (null).
  *
  * Why an Expression and not a Column tree: the type dispatch happens ONCE
  * at analysis/codegen time against the child's resolved DataType — a
  * numeric input compiles to a bare cast and a string input to one helper
  * call, instead of the per-row regex CASE tree a generic Column builder
  * must emit. This is what keeps the whole scalar function library inside
  * small whole-stage-codegen units.
  */
case class WarpNumExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "warp_num"

  override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess

  protected override def nullSafeEval(input: Any): Any = child.dataType match {
    case DoubleType     => input
    case FloatType      => input.asInstanceOf[Float].toDouble
    case ByteType       => input.asInstanceOf[Byte].toDouble
    case ShortType      => input.asInstanceOf[Short].toDouble
    case IntegerType    => input.asInstanceOf[Int].toDouble
    case LongType       => input.asInstanceOf[Long].toDouble
    case _: DecimalType => input.asInstanceOf[Decimal].toDouble
    case BooleanType    => if (input.asInstanceOf[Boolean]) 1.0 else 0.0
    case StringType     => WarpNumExpr.parse(input.asInstanceOf[UTF8String])
    case _              => null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        val c = child.genCode(ctx)
        val boxed = ctx.freshName("warpNum")
        ev.copy(code =
          code"""
            ${c.code}
            boolean ${ev.isNull} = true;
            double ${ev.value} = 0.0;
            if (!${c.isNull}) {
              java.lang.Double $boxed = graft.functions.WarpNumExpr.parse(${c.value});
              if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
            }""")
      case BooleanType    => defineCodeGen(ctx, ev, v => s"($v ? 1.0d : 0.0d)")
      case _: DecimalType => defineCodeGen(ctx, ev, v => s"$v.toDouble()")
      case _: NumericType => defineCodeGen(ctx, ev, v => s"(double)($v)")
      case _ =>
        ev.copy(code =
          code"""
            boolean ${ev.isNull} = true;
            double ${ev.value} = 0.0;""")
    }

  override protected def withNewChildInternal(newChild: Expression): WarpNumExpr =
    copy(child = newChild)
}

object WarpNumExpr {
  /** Strict Warp numeric parse: entire string must be a number (optional
    * sign, digits with optional fraction, optional exponent) — no
    * surrounding whitespace, no partial parse. Returns null (no numeric
    * form) otherwise. Boxed so codegen can branch on it. */
  def parse(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val n = s.numBytes()
    if (n == 0) return null
    // cheap byte-level pre-validation (numeric syntax is pure ASCII; any
    // non-ASCII byte fails the checks), then one JDK parse — no regex
    var i = 0
    val c0 = s.getByte(0).toChar
    if (c0 == '+' || c0 == '-') i += 1
    var digits = 0; var dots = 0; var expAt = -1
    var j = i
    var ok = true
    while (j < n && ok) {
      val ch = s.getByte(j).toChar
      if (ch >= '0' && ch <= '9') digits += 1
      else if (ch == '.' && expAt < 0 && dots == 0) dots = 1
      else if ((ch == 'e' || ch == 'E') && expAt < 0 && digits > 0) {
        expAt = j
        if (j + 1 < n && (s.getByte(j + 1) == '+' || s.getByte(j + 1) == '-')) j += 1
        if (j + 1 >= n) ok = false // exponent must have digits
      } else ok = false
      j += 1
    }
    if (ok && digits > 0) {
      try {
        val d = java.lang.Double.parseDouble(s.toString)
        // NaN/Inf are banned values (Value.swift:95-102): overflowing
        // literals like 1e999 have no numeric form
        if (java.lang.Double.isFinite(d)) Double.box(d) else null
      } catch { case _: NumberFormatException => null }
    } else {
      // booleans spell a numeric form too (Value.swift:176-190)
      if (s.toString.equalsIgnoreCase("true")) Double.box(1.0)
      else if (s.toString.equalsIgnoreCase("false")) Double.box(0.0)
      else null
    }
  }
}
