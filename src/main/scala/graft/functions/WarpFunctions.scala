package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.values.Warp

/** The reference's closed ~110-function scalar library
  * (reference: WarpCore/Sources/Function.swift:21-134, apply :946-1727)
  * re-expressed as Catalyst column builders. Built-ins cover ~80%; the
  * remainder (normalInverse, hilbert curves, power-up/down, randomString)
  * are deterministic Scala UDFs registered once per JVM.
  *
  * Naming: `fn*` prefix mirrors the reference function enum case names.
  */
object WarpFunctions {

  // ===== logic / conditional (Function.swift:973-1029,1332-1358) =====
  //
  // Representation note: at the plain-Column level a null cell is EMPTY
  // (a valid value, Value.swift:22-26) — the invalid value exists only on
  // the error-tagged track (Warp.WV, used by the formula compiler), where
  // the reference truth tables (and/or poison on invalid only,
  // isInvalid(empty)=false, ifError(empty,fb)=empty) are implemented
  // exactly. The builders below are the "all inputs valid" projections.

  /** and/or: empty or non-true arguments are simply NOT true — null never
    * propagates (empty is valid; only invalid poisons, which cannot occur
    * at this level — Function.swift:973-1010). */
  def fnAnd(cs: Column*): Column =
    cs.map(c => coalesce(Warp.bool(c), lit(false))).reduce(_ && _)
  def fnOr(cs: Column*): Column =
    cs.map(c => coalesce(Warp.bool(c), lit(false))).reduce(_ || _)
  def fnXor(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast(BooleanType))
      .otherwise(Warp.bool(a) =!= Warp.bool(b))
  def fnNot(c: Column): Column = !Warp.bool(c)
  def fnIf(cond: Column, t: Column, f: Column): Column =
    when(Warp.bool(cond), t).otherwise(f)
  /** ifError(value, fallback): fallback only on INVALID — which plain
    * columns cannot carry, so this is the identity here; the WV-track
    * [[graft.values.Warp.ifErrorW]] implements the real semantics
    * (Function.swift:1028-1029: ifError(empty, fb) = empty). */
  def fnIfError(v: Column, fallback: Column): Column = v
  /** coalesce: first valid non-empty argument (Function.swift:985-991). */
  def fnCoalesce(cs: Column*): Column = coalesce(cs: _*)
  def fnIn(v: Column, set: Column*): Column = set.map(Warp.eq(v, _)).reduce(_ || _)
  def fnNotIn(v: Column, set: Column*): Column = !fnIn(v, set: _*)
  def fnIsEmpty(c: Column): Column = c.isNull
  /** isInvalid: false for every plain-column value — empty is VALID
    * (Function.swift:1509-1513); see [[graft.values.Warp.isInvalidW]]. */
  def fnIsInvalid(c: Column): Column = lit(false)

  // ===== math (Function.swift:1031-1230) =====

  def fnCos(c: Column): Column = cos(Warp.num(c))
  def fnSin(c: Column): Column = sin(Warp.num(c))
  def fnTan(c: Column): Column = tan(Warp.num(c))
  def fnCosh(c: Column): Column = cosh(Warp.num(c))
  def fnSinh(c: Column): Column = sinh(Warp.num(c))
  def fnTanh(c: Column): Column = tanh(Warp.num(c))
  def fnAcos(c: Column): Column = nanToNull(acos(Warp.num(c)))
  def fnAsin(c: Column): Column = nanToNull(asin(Warp.num(c)))
  def fnAtan(c: Column): Column = atan(Warp.num(c))
  def fnSqrt(c: Column): Column = nanToNull(sqrt(Warp.num(c)))
  def fnExp(c: Column): Column = exp(Warp.num(c))
  /** ln with non-positive => invalid (Function.swift:1074-1080). */
  def fnLn(c: Column): Column = {
    val n = Warp.num(c)
    when(n <= 0.0, lit(null).cast(DoubleType)).otherwise(log(n))
  }
  def fnLog(c: Column, base: Column): Column = {
    val n = Warp.num(c); val b = Warp.num(base)
    when(n <= 0.0 || b <= 0.0 || b === 1.0, lit(null).cast(DoubleType))
      .otherwise(log(n) / log(b))
  }
  /** round: half-away-from-zero, Excel style; no-decimals form returns a
    * whole number (Function.swift:1186-1206). */
  def fnRound(c: Column): Column = round(Warp.num(c), 0)
  def fnRoundTo(c: Column, decimals: Int): Column = round(Warp.num(c), decimals)
  /** ROUND with a DYNAMIC decimals operand: Spark's Round requires a
    * foldable scale, so this rounds half-away-from-zero manually; the
    * literal-decimals form stays on Spark's exact round. */
  def fnRoundDyn(c: Column, decimals: Column): Column = {
    val p = pow(lit(10.0), Warp.num(decimals).cast(IntegerType))
    val x = Warp.num(c)
    signum(x) * floor(abs(x) * p + lit(0.5)) / p
  }
  def fnFloor(c: Column): Column = floor(Warp.num(c)).cast(DoubleType)
  def fnCeiling(c: Column): Column = ceil(Warp.num(c)).cast(DoubleType)
  def fnAbsolute(c: Column): Column = abs(Warp.num(c))
  def fnSign(c: Column): Column = signum(Warp.num(c))
  def fnNegate(c: Column): Column = -Warp.num(c)
  def fnPower(a: Column, b: Column): Column = Warp.pow(a, b)
  /** n-ary scalar sum/average/min/max (arity `any`, Function.swift:17-20). */
  def fnSum(cs: Column*): Column = cs.map(c => coalesce(Warp.num(c), lit(0.0))).reduce(_ + _)
  /** average: sum/count of NUMERIC-CONVERTIBLE arguments — the scalar
    * form delegates to the reducer in the reference (Function.swift:775-
    * 780), so empty/non-numeric arguments don't drag the mean toward 0. */
  def fnAverage(cs: Column*): Column = {
    val a = numArgs(cs)
    when(size(a) > 0, aggregate(a, lit(0.0), (acc, v) => acc + v) / size(a))
  }
  def fnMin(cs: Column*): Column = least(cs.map(Warp.num): _*)
  def fnMax(cs: Column*): Column = greatest(cs.map(Warp.num): _*)

  private def nanToNull(c: Column): Column = when(isnan(c), lit(null).cast(DoubleType)).otherwise(c)

  // ===== scalar (argument-level) forms of the reducers: the reference's
  // `any`-arity functions double as scalar calls over their arguments —
  // `=MEDIAN(1;2;3)` etc. (Function.swift:17-20, dispatch :1729-1753) =====

  private def numArgs(cs: Seq[Column]): Column =
    filter(array(cs.map(Warp.num): _*), v => v.isNotNull)

  /** count: numeric-convertible arguments only (WarpCoreTests.swift:206-208). */
  def fnCountScalar(cs: Column*): Column = size(numArgs(cs))
  /** countAll: every argument, including empty/invalid. */
  def fnCountAllScalar(cs: Column*): Column = lit(cs.size)
  def fnCountDistinctScalar(cs: Column*): Column =
    size(array_distinct(filter(array(cs: _*), v => v.isNotNull)))

  private def sortedNums(cs: Seq[Column]): Column = sort_array(numArgs(cs))
  def fnMedianScalar(cs: Column*): Column = {
    val a = sortedNums(cs); val n = size(a)
    when(n > 0,
      (element_at(a, ((n + 1) / 2).cast(IntegerType)) +
       element_at(a, (n / 2 + 1).cast(IntegerType))) / 2.0)
  }
  def fnMedianLowScalar(cs: Column*): Column = {
    val a = sortedNums(cs); val n = size(a)
    when(n > 0, element_at(a, ((n + 1) / 2).cast(IntegerType)))
  }
  def fnMedianHighScalar(cs: Column*): Column = {
    val a = sortedNums(cs); val n = size(a)
    when(n > 0, element_at(a, (n / 2 + 1).cast(IntegerType)))
  }
  def fnMedianPackScalar(cs: Column*): Column = {
    val a = sortedNums(cs); val n = size(a)
    val lo = element_at(a, (n / 2).cast(IntegerType))
    val hi = element_at(a, (n / 2 + 1).cast(IntegerType))
    when(n === 0, lit(null).cast(StringType))
      .when(n % 2 === 1, element_at(a, ((n + 1) / 2).cast(IntegerType)).cast(StringType))
      .otherwise(concat_ws(",", packEscape(lo.cast(StringType)), packEscape(hi.cast(StringType))))
  }
  def fnVarianceSampleScalar(cs: Column*): Column = varScalar(cs, sample = true)
  def fnVariancePopulationScalar(cs: Column*): Column = varScalar(cs, sample = false)
  def fnStdevSampleScalar(cs: Column*): Column = sqrt(varScalar(cs, sample = true))
  def fnStdevPopulationScalar(cs: Column*): Column = sqrt(varScalar(cs, sample = false))
  private def varScalar(cs: Seq[Column], sample: Boolean): Column = {
    val a = numArgs(cs)
    val n = size(a).cast(DoubleType)
    val s = aggregate(a, lit(0.0), (acc, v) => acc + v)
    val sq = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
    val denom = if (sample) n - 1.0 else n
    when(denom > 0, (sq - s * s / n) / denom)
  }
  /** pack: the arguments as one pack string (PackReducer, Function.swift:2106). */
  def fnPackScalar(cs: Column*): Column =
    concat_ws(",", cs.map(c => packEscape(Warp.str(c))): _*)

  /** normalInverse(p, mu, sigma) — Acklam's rational approximation of the
    * inverse normal CDF (reference port: WarpCore/Sources/Stats.swift:21-116). */
  val normalInverseUdf = udf { (p: Double, mu: Double, sigma: Double) =>
    if (p <= 0.0 || p >= 1.0 || sigma <= 0.0) None
    else {
      val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
        1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
        6.680131188771972e+01, -1.328068155288572e+01)
      val cc = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
        -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
      val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
        3.754408661907416e+00)
      val pLow = 0.02425
      val x =
        if (p < pLow) {
          val q = math.sqrt(-2 * math.log(p))
          (((((cc(0) * q + cc(1)) * q + cc(2)) * q + cc(3)) * q + cc(4)) * q + cc(5)) /
            ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
        } else if (p <= 1 - pLow) {
          val q = p - 0.5; val r = q * q
          (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
            (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
        } else {
          val q = math.sqrt(-2 * math.log(1 - p))
          -(((((cc(0) * q + cc(1)) * q + cc(2)) * q + cc(3)) * q + cc(4)) * q + cc(5)) /
            ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
        }
      Some(mu + sigma * x)
    }
  }
  def fnNormalInverse(p: Column, mu: Column, sigma: Column): Column =
    normalInverseUdf(Warp.num(p), Warp.num(mu), Warp.num(sigma))

  // ===== string (Function.swift:956-967,1115-1174,1235-1243) =====

  def fnUppercase(c: Column): Column = upper(Warp.str(c))
  def fnLowercase(c: Column): Column = lower(Warp.str(c))
  def fnCapitalize(c: Column): Column = initcap(Warp.str(c))
  def fnTrim(c: Column): Column = trim(Warp.str(c))
  /** left/right: invalid when count exceeds length (Function.swift:1115-1135). */
  def fnLeft(c: Column, n: Column): Column = {
    val s = Warp.str(c); val k = Warp.num(n).cast(IntegerType)
    when(length(s) < k, lit(null).cast(StringType)).otherwise(substring(s, lit(1), k))
  }
  def fnRight(c: Column, n: Column): Column = {
    val s = Warp.str(c); val k = Warp.num(n).cast(IntegerType)
    when(length(s) < k, lit(null).cast(StringType))
      .otherwise(substring(s, -k, k))
  }
  /** mid: 0-based start; length clamps to the string end, but a start
    * beyond the end is invalid (Function.swift:1137-1150; start == length
    * yields the empty string). */
  def fnMid(c: Column, start: Column, len: Column): Column = {
    val s = Warp.str(c)
    val st = Warp.num(start).cast(IntegerType)
    when(st > length(s), lit(null).cast(StringType))
      .otherwise(substring(s, st + 1, Warp.num(len).cast(IntegerType)))
  }
  def fnLength(c: Column): Column = length(Warp.str(c))
  def fnSubstitute(c: Column, find: Column, repl: Column): Column =
    replace(Warp.str(c), Warp.str(find), Warp.str(repl))
  def fnRegexSubstitute(c: Column, pattern: Column, repl: Column): Column =
    regexp_replace(Warp.str(c), Warp.str(pattern), Warp.str(repl))
  def fnSplit(c: Column, sep: String): Column =
    split(Warp.str(c), java.util.regex.Pattern.quote(sep))
  /** split with a dynamic separator column: the separator is a LITERAL
    * string in Warp (Function.swift:1266-1272), so \Q...\E-quote it before
    * handing it to Spark's regex-based split (per-character backslash
    * escaping would produce illegal patterns for non-ASCII letters). */
  def fnSplitCol(c: Column, sep: Column): Column = {
    val quoted = concat(lit("\\Q"),
      replace(Warp.str(sep), lit("\\E"), lit("\\E\\\\E\\Q")), lit("\\E"))
    call_function("split", Warp.str(c), quoted)
  }
  /** glue with a dynamic separator column (array_join needs a literal).
    * A null element invalidates the WHOLE result (reference: stringValue
    * nil => .invalid, Function.swift Glue) — without the guard the fold's
    * `concat` would null the accumulator and the next element would
    * silently RESTART accumulation, dropping the prefix. */
  def fnGlueCol(arr: Column, sep: Column): Column = {
    val s = Warp.str(sep)
    val joined = aggregate(arr, lit(null).cast(StringType), (acc, v) =>
      when(acc.isNull, v.cast(StringType))
        .otherwise(concat(acc, s, v.cast(StringType))))
    // a null separator has the same restart-the-fold failure mode as a
    // null element: both invalidate the WHOLE result
    when(s.isNull || exists(arr, v => v.isNull), lit(null).cast(StringType))
      .otherwise(joined)
  }
  def fnLevenshtein(a: Column, b: Column): Column = levenshtein(Warp.str(a), Warp.str(b))
  def fnConcat(cs: Column*): Column = concat(cs.map(Warp.str): _*)
  val urlEncodeUdf = udf { (s: String) =>
    Option(s).map(v => java.net.URLEncoder.encode(v, "UTF-8"))
  }
  def fnUrlEncode(c: Column): Column = urlEncodeUdf(Warp.str(c))

  // ===== date / time (Function.swift:1366-1501; all UTC, Excel-compat) =====

  /** Warp date scalar = seconds since 2001-01-01T00:00:00Z (NSDate epoch,
    * Value.swift:43-45). Offset to unix epoch: */
  val NsDateEpochOffset = 978307200L
  /** Excel serial date epoch 1899-12-30 (Date.swift:25-38): days. */
  val ExcelEpochDays = 25569.0 // days between 1899-12-30 and 1970-01-01

  def fnNow(): Column = current_timestamp()
  def fnFromUnixTime(c: Column): Column = timestamp_seconds(Warp.num(c))
  def fnToUnixTime(c: Column): Column = unix_timestamp(c)
  def fnFromISO8601(c: Column): Column = to_timestamp(Warp.str(c))
  def fnToUTCISO8601(c: Column): Column = date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
  def fnFromExcelDate(c: Column): Column =
    timestamp_seconds((Warp.num(c) - ExcelEpochDays) * 86400.0)
  def fnToExcelDate(c: Column): Column =
    unix_timestamp(c).cast(DoubleType) / 86400.0 + ExcelEpochDays
  /** utcDate(y,m,d[,h,mi,s]) — make a UTC timestamp. */
  def fnUtcDate(y: Column, m: Column, d: Column,
                h: Column = lit(0), mi: Column = lit(0), sec: Column = lit(0)): Column =
    make_timestamp(y.cast(IntegerType), m.cast(IntegerType), d.cast(IntegerType),
      h.cast(IntegerType), mi.cast(IntegerType), sec.cast(DecimalType(8, 6)))
  def fnUtcYear(c: Column): Column = year(c)
  def fnUtcMonth(c: Column): Column = month(c)
  def fnUtcDay(c: Column): Column = dayofmonth(c)
  def fnUtcHour(c: Column): Column = hour(c)
  def fnUtcMinute(c: Column): Column = minute(c)
  def fnUtcSecond(c: Column): Column = second(c)
  /** duration(a,b) = seconds between (Function.swift:1451-1458). */
  def fnDuration(a: Column, b: Column): Column =
    (unix_timestamp(b) - unix_timestamp(a)).cast(DoubleType)
  /** after(t, seconds) = t + seconds. */
  def fnAfter(t: Column, seconds: Column): Column =
    timestamp_seconds(unix_timestamp(t) + Warp.num(seconds))
  def fnToUnicodeDateString(t: Column, fmt: String): Column = date_format(t, fmt)
  def fnFromUnicodeDateString(s: Column, fmt: String): Column = to_timestamp(Warp.str(s), fmt)

  // ===== list (Function.swift:1266-1318,1542-1577) =====

  def fnList(cs: Column*): Column = array(cs: _*)
  /** nth: 1-based element access (Function.swift:1282-1292). */
  /** nth, 1-based. try_element_at + zero guard: under ANSI (the Spark 4
    * default) bare element_at THROWS on out-of-range or zero — the Warp
    * contract is invalid (null) instead. */
  def fnNth(arr: Column, i: Column): Column = {
    // Warp.num first: a string index ("2", "2.5") coerces like everywhere
    // else — a raw ANSI cast would throw on non-numeric text
    val ix = Warp.num(i).cast(IntegerType)
    when(ix.isNotNull && ix =!= 0, call_function("try_element_at", arr, ix))
  }
  /** valueForKey over an alternating key/value list (Value.swift:62-67). */
  def fnValueForKey(arr: Column, key: Column): Column = {
    // pairs: (arr[1],arr[2]), (arr[3],arr[4]), ... 1-based. Scan ONLY the
    // key (odd) positions — array_position would find the key anywhere,
    // so a value that happens to equal a later key would shadow it. The
    // idx < size guard keeps a key in LAST position of an odd-length list
    // from reading past the end; try_element_at never throws under ANSI.
    val n = size(arr)
    val keyIdxs = when(n > 0, filter(sequence(lit(1), n), i =>
      i % 2 === 1 && (call_function("try_element_at", arr, i.cast(IntegerType)) <=> key)))
    val idx = call_function("try_element_at", keyIdxs, lit(1))
    when(idx.isNotNull && idx < n,
      call_function("try_element_at", arr, (idx + 1).cast(IntegerType)))
  }
  def fnItems(arr: Column): Column = size(arr)
  def fnGlue(arr: Column, sep: String): Column = array_join(arr, sep)
  def fnAppendValue(arr: Column, v: Column): Column = array_append(arr, v)
  def fnAppendList(a: Column, b: Column): Column = concat(a, b)

  // ===== pack format (Value.swift:266-380): `,` sep, $0=escaped-$, $1=escaped-, =====

  def packEscape(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\$", "\\$0"), ",", "\\$1")
  def packUnescape(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\$1", ","), "\\$0", "\\$")
  /** packList: list -> pack string (Function.swift:1542-1577). */
  def fnPackList(arr: Column): Column =
    array_join(transform(arr, v => packEscape(v.cast(StringType))), ",")
  /** unpackList: pack string -> list. */
  def fnUnpackList(c: Column): Column =
    transform(split(Warp.str(c), ",", -1), packUnescape(_))

  // ===== encoding / blob (Function.swift:1515-1540,1579-1590,1661-1716) =====

  def fnBase64Encode(c: Column): Column = base64(c.cast(BinaryType))
  def fnBase64Decode(c: Column): Column = unbase64(Warp.str(c))
  def fnHexEncode(c: Column): Column = hex(c.cast(BinaryType))
  def fnHexDecode(c: Column): Column = unhex(Warp.str(c))
  def fnEncodeString(c: Column, charset: String = "UTF-8"): Column = encode(Warp.str(c), charset)
  def fnDecodeString(c: Column, charset: String = "UTF-8"): Column = decode(c, charset)
  def fnNumberOfBytes(c: Column): Column = octet_length(c)
  def fnJsonEncode(c: Column): Column = to_json(c)
  def fnJsonDecode(c: Column, schema: String): Column = from_json(Warp.str(c), lit(schema))
  /** schemaless jsonDecode (Function.swift:1515-1531 parses arbitrary
    * JSON): Spark 4's VARIANT type is the analog — parse once, navigate
    * with variant_get / `:` paths. */
  def fnJsonDecodeVariant(c: Column): Column = parse_json(Warp.str(c))
  /** parseNumber with locale separators (Function.swift:1661-1716). */
  def fnParseNumber(c: Column, thousands: String = ",", decimal: String = "."): Column = {
    val cleaned = regexp_replace(
      regexp_replace(Warp.str(c), java.util.regex.Pattern.quote(thousands), ""),
      java.util.regex.Pattern.quote(decimal), ".")
    Warp.num(cleaned)
  }

  // ===== random / generators (Function.swift:1176-1233,1477-1507) =====

  def fnRandom(): Column = rand()
  def fnRandomBetween(a: Column, b: Column): Column = {
    val lo = Warp.num(a); val hi = Warp.num(b)
    floor(rand() * (hi - lo + 1) + lo)
  }
  def fnRandomItem(cs: Column*): Column =
    element_at(array(cs: _*), (floor(rand() * cs.size) + 1).cast(IntegerType))
  def fnUuid(): Column = expr("uuid()")
  def fnChoose(i: Column, cs: Column*): Column =
    fnNth(array(cs: _*), i) // out-of-range/zero => invalid, not an ANSI throw

  /** randomString(pattern) — the Sequencer's pattern alphabet applied
    * randomly (QBESequencerStep.swift; Sequencer.swift grammar). */
  val randomStringUdf = udf { (pattern: String, seed: Long) =>
    graft.sources.Sequencer.randomFromPattern(pattern, new scala.util.Random(seed))
  }
  def fnRandomString(pattern: Column): Column =
    randomStringUdf(Warp.str(pattern), (rand() * Long.MaxValue).cast(LongType))

  // ===== esoteric (Function.swift:1592-1659) =====

  /** Hilbert curve d<->(x,y) on a 2^k grid (reference port:
    * Value.swift:1168-1261, public-domain Wikipedia algorithm). */
  private def rot(n: Long, xy: (Long, Long), rx: Long, ry: Long): (Long, Long) = {
    var (x, y) = xy
    if (ry == 0) {
      if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
      val t = x; x = y; y = t
    }
    (x, y)
  }
  val hilbertXYToDUdf = udf { (n: Long, xIn: Long, yIn: Long) =>
    var rx = 0L; var ry = 0L; var d = 0L
    var x = xIn; var y = yIn
    var s = n / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      val r = rot(n, (x, y), rx, ry); x = r._1; y = r._2
      s /= 2
    }
    d
  }
  val hilbertDToXYUdf = udf { (n: Long, dIn: Long) =>
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var d = dIn
    var s = 1L
    while (s < n) {
      rx = 1 & (d / 2)
      ry = 1 & (d ^ rx)
      val r = rot(s, (x, y), rx, ry); x = r._1; y = r._2
      x += s * rx; y += s * ry
      d /= 4
      s *= 2
    }
    (x, y)
  }
  def fnHilbertXYToD(n: Column, x: Column, y: Column): Column =
    hilbertXYToDUdf(n.cast(LongType), x.cast(LongType), y.cast(LongType))
  def fnHilbertDToX(n: Column, d: Column): Column =
    hilbertDToXYUdf(n.cast(LongType), d.cast(LongType)).getField("_1")
  def fnHilbertDToY(n: Column, d: Column): Column =
    hilbertDToXYUdf(n.cast(LongType), d.cast(LongType)).getField("_2")

  /** powerUp/powerDown: next/previous power of `base` >=/<= value
    * (Value.swift:1129-1166). */
  val powerUpUdf = udf { (v: Double, base: Double) =>
    if (v <= 0 || base <= 1) None
    else Some(math.pow(base, math.ceil(math.log(v) / math.log(base) - 1e-9)))
  }
  val powerDownUdf = udf { (v: Double, base: Double) =>
    if (v <= 0 || base <= 1) None
    else Some(math.pow(base, math.floor(math.log(v) / math.log(base) + 1e-9)))
  }
  def fnPowerUp(v: Column, base: Column): Column = powerUpUdf(Warp.num(v), Warp.num(base))
  def fnPowerDown(v: Column, base: Column): Column = powerDownUdf(Warp.num(v), Warp.num(base))
}
