package graft.values

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Warp value-semantics kernel.
  *
  * Re-expresses the reference's `Value` coercion algebra
  * (reference: WarpCore/Sources/Value.swift:47-756) as Catalyst `Column`
  * builders so every expression stays inside whole-stage codegen — no UDFs
  * on the hot path.
  *
  * Representation decision (SURVEY.md §7.0): native Spark column types;
  * `.empty` maps to SQL `null`. `.invalid` (an error value that never equals
  * anything) also maps to `null` at operator boundaries — the distinction is
  * preserved only inside expression trees where `ifError`/`isInvalid` is in
  * scope (see WarpFunctions.ifError).
  *
  * Coercion spec highlights (Value.swift:130-211, tests WarpCoreTests.swift:51-140):
  *  - arithmetic coerces both sides to double; `"13" + 37 == 50`
  *  - strings parse as numbers only when fully numeric, no leading space
  *  - booleans coerce to 1/0
  *  - dates never implicitly convert to number or string
  *  - `/0` is invalid (null), NaN/Inf are banned
  *  - `&` is string concatenation; `==` is type-lenient; empty sorts first
  */
object Warp {

  /** Regex for "fully numeric, no surrounding space" (Value.swift:810-833). */
  private val NumRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  /** Coerce a column to double under Warp rules; non-coercible => null.
    * ANSI-safe: the regex guards the string->double cast, so nothing throws
    * under Spark 4's default ANSI mode. Booleans coerce to 1/0
    * (Value.swift:176-190). */
  def num(c: Column): Column = {
    val s = c.cast(StringType)
    when(c.isNull, lit(null).cast(DoubleType))
      .when(lower(s) === "true", lit(1.0))
      .when(lower(s) === "false", lit(0.0))
      .when(s.rlike(NumRe), s.cast(DoubleType))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Typed fast path: column already numeric — avoid the regex. */
  def numTyped(c: Column): Column = c.cast(DoubleType)

  /** Coerce to string (dates intentionally excluded upstream). */
  def str(c: Column): Column = c.cast(StringType)

  /** Coerce to boolean: true/nonzero => true; non-coercible => null
    * (Value.swift:176-190). ANSI-safe: never casts a free-form string to
    * boolean (that throws in Spark 4); routes through the guarded num(). */
  def bool(c: Column): Column = {
    val s = lower(c.cast(StringType))
    when(c.isNull, lit(null).cast(BooleanType))
      .when(s === "true", lit(true))
      .when(s === "false", lit(false))
      .otherwise(num(c) =!= 0.0)
  }

  // ---- arithmetic (Value.swift:484-545): coerce to double, failure => null

  def add(a: Column, b: Column): Column = num(a) + num(b)
  def sub(a: Column, b: Column): Column = num(a) - num(b)
  def mul(a: Column, b: Column): Column = num(a) * num(b)

  /** Division: /0 => invalid (null), matching Value.swift:511-520. */
  def div(a: Column, b: Column): Column = {
    val d = num(b)
    when(d === 0.0, lit(null).cast(DoubleType)).otherwise(num(a) / d)
  }

  /** Modulo with /0 => null (Value.swift:522-531). */
  def mod(a: Column, b: Column): Column = {
    val d = num(b)
    when(d === 0.0, lit(null).cast(DoubleType)).otherwise(num(a) % d)
  }

  /** Power (Value.swift:533-543); NaN results (e.g. (-1)^0.5) => null. */
  def pow(a: Column, b: Column): Column = {
    val r = org.apache.spark.sql.functions.pow(num(a), num(b))
    when(isnan(r), lit(null).cast(DoubleType)).otherwise(r)
  }

  /** `&` string concatenation (Value.swift:503-509). */
  def cat(a: Column, b: Column): Column = concat(str(a), str(b))

  // ---- comparison (Value.swift:547-756)

  /** Type-lenient equality: numeric cross-compare when both coercible, else
    * string compare; empty == empty is TRUE (Value.swift:22-26). */
  def eq(a: Column, b: Column): Column = {
    val (na, nb) = (num(a), num(b))
    when(a.isNull && b.isNull, lit(true))
      .when(a.isNull || b.isNull, lit(false))
      .when(na.isNotNull && nb.isNotNull, na === nb)
      .otherwise(str(a) === str(b))
  }

  def neq(a: Column, b: Column): Column = !eq(a, b)

  /** Ordering key under Warp `<`: empty below every value (Value.swift:591-688).
    * For mixed compares we order numerically when both coerce, else as strings. */
  def lt(a: Column, b: Column): Column = cmp(a, b, (x, y) => x < y)
  def gt(a: Column, b: Column): Column = cmp(a, b, (x, y) => x > y)
  def lte(a: Column, b: Column): Column = cmp(a, b, (x, y) => x <= y)
  def gte(a: Column, b: Column): Column = cmp(a, b, (x, y) => x >= y)

  private def cmp(a: Column, b: Column, op: (Column, Column) => Column): Column = {
    val (na, nb) = (num(a), num(b))
    when(a.isNull && b.isNull, op(lit(0), lit(0)))
      .when(a.isNull, op(lit(0), lit(1)))   // empty is smallest
      .when(b.isNull, op(lit(1), lit(0)))
      .when(na.isNotNull && nb.isNotNull, op(na, nb))
      .otherwise(op(str(a), str(b)))
  }

  /** `~=` contains, case-insensitive (Value.swift:714-725). */
  def containsString(hay: Column, needle: Column): Column =
    lower(str(hay)).contains(lower(str(needle)))

  /** `~~=` contains, case-sensitive. */
  def containsStringStrict(hay: Column, needle: Column): Column =
    str(hay).contains(str(needle))

  /** `±=` regex match, case-insensitive (Value.swift:727-749). */
  def matchesRegex(s: Column, pattern: Column): Column =
    regexp_like(str(s), concat(lit("(?i)"), str(pattern)))

  /** `±±=` regex match, case-sensitive. */
  def matchesRegexStrict(s: Column, pattern: Column): Column =
    regexp_like(str(s), str(pattern))

  // ---- filter semantics: keep rows where expr is exactly true
  // (Data.swift:248-250): coerce to bool, null => false.
  def filterCond(c: Column): Column = coalesce(bool(c), lit(false))
}
