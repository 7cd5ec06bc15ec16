package graft.values

/** Locale table for value and formula parsing — fully data-driven like
  * the reference (WarpCore/Sources/Language.swift:69-380 ships "en" and
  * "nl": separators :122-135, constants :69-85, SI postfixes :88-120,
  * localized function names :137-358).
  *
  * `constants` maps a (upper-cased) literal word to its value;
  * [[WarpLanguage.Invalid]] marks the error constant (en "ERROR",
  * nl "FOUT"). `functionNames` maps localized spellings to the canonical
  * (en) function names the compiler dispatches on. `postfixes` are the
  * metric/IEC number-literal multipliers. */
final case class WarpLanguage(
  id: String,
  decimalSeparator: String,
  groupingSeparator: String,
  argumentSeparator: String,
  constants: Map[String, Any],
  functionNames: Map[String, String],
  postfixes: Map[String, Double])

object WarpLanguage {
  /** Marker value for the `.invalid` constant. */
  case object Invalid

  /** Metric + IEC + percent postfix multipliers
    * (Language.swift:88-120; SI prefix table is public standard data). */
  val siPostfixes: Map[String, Double] = Map(
    "da" -> 1e1, "h" -> 1e2, "k" -> 1e3, "M" -> 1e6, "G" -> 1e9,
    "T" -> 1e12, "P" -> 1e15, "E" -> 1e18, "Z" -> 1e21, "Y" -> 1e24,
    "d" -> 1e-1, "c" -> 1e-2, "m" -> 1e-3, "µ" -> 1e-6, "n" -> 1e-9,
    "p" -> 1e-12, "f" -> 1e-15, "a" -> 1e-18, "z" -> 1e-21, "y" -> 1e-24,
    "Ki" -> 1024.0, "Mi" -> 1024.0 * 1024, "Gi" -> 1024.0 * 1024 * 1024,
    // the reference's Ti is 1024^3 (Language.swift:115 repeats Gi — an
    // obvious typo in its public table); we use the correct 1024^4
    "Ti" -> 1024.0 * 1024 * 1024 * 1024,
    "%" -> 0.01, "‰" -> 0.001, "‱" -> 0.0001)

  val en: WarpLanguage = WarpLanguage(
    id = "en", decimalSeparator = ".", groupingSeparator = ",",
    argumentSeparator = ";",
    constants = Map(
      // 3.141592654, not math.Pi: the reference's PI constant is this
      // rounded literal (Language.swift:73) — formulas must match it
      "TRUE" -> true, "FALSE" -> false, "PI" -> 3.141592654,
      "NULL" -> null, "EMPTY" -> null, "ERROR" -> Invalid),
    functionNames = Map.empty, // canonical names ARE the en names
    postfixes = siPostfixes)

  /** Dutch locale: decimal comma, Excel-NL function spellings — the COMPLETE
    * reference table (Language.swift:252-358, all 108 entries), mapped to
    * this compiler's canonical spellings (the right-hand sides the formula
    * dispatcher matches on, see Formula's enAliases for the en synonyms). */
  val nl: WarpLanguage = WarpLanguage(
    id = "nl", decimalSeparator = ",", groupingSeparator = ".",
    argumentSeparator = ";",
    constants = Map(
      "WAAR" -> true, "ONWAAR" -> false, "PI" -> 3.141592654,
      "LEEG" -> null, "FOUT" -> Invalid),
    functionNames = Map(
      "ABS" -> "ABS", "BOOGCOS" -> "ACOS", "EN" -> "AND",
      "BOOGSIN" -> "ASIN", "BOOGTAN" -> "ATAN", "GEMIDDELDE" -> "AVERAGE",
      "KIEZEN" -> "CHOOSE", "TEKST.SAMENVOEGEN" -> "CONCAT",
      "COS" -> "COS", "COSH" -> "COSH", "AANTAL" -> "COUNT",
      "AANTALARG" -> "COUNTALL", "EXP" -> "EXP", "ALS" -> "IF",
      "ALS.FOUT" -> "IFERROR", "LINKS" -> "LEFT", "LENGTE" -> "LENGTH",
      "LN" -> "LN", "LOG" -> "LOG", "KLEINE.LETTERS" -> "LOWER",
      "MAX" -> "MAX", "DEEL" -> "MID", "MIN" -> "MIN", "NIET" -> "NOT",
      "OF" -> "OR", "ASELECTTUSSEN" -> "RANDOMBETWEEN", "ASELECT" -> "RANDOM",
      "RECHTS" -> "RIGHT", "AFRONDEN" -> "ROUND", "SIN" -> "SIN",
      "SINH" -> "SINH", "WORTEL" -> "SQRT",
      "SUBSTITUEREN.PATROON" -> "REGEXSUBSTITUTE",
      "SUBSTITUEREN" -> "SUBSTITUTE", "SOM" -> "SUM", "TAN" -> "TAN",
      "TANH" -> "TANH", "SPATIES.WISSEN" -> "TRIM",
      "HOOFDLETTERS" -> "UPPER", "EX.OF" -> "XOR",
      "EERSTE.GELDIG" -> "COALESCE", "WAARDEN.INPAKKEN" -> "PACKSCALAR",
      "NORM.INV.N" -> "NORMAL.INV", "POS.NEG" -> "SIGN",
      "SPLITS" -> "SPLIT", "ITEMS" -> "ITEMS",
      "GELIJKENIS" -> "LEVENSHTEIN", "URL.CODEREN" -> "URLENCODE",
      "IN" -> "IN", "NIET.IN" -> "NOTIN", "KLEINSTE" -> "MIN",
      "GROOTSTE" -> "MAX", "BEGINLETTERS" -> "PROPER", "NU" -> "NOW",
      "NAAR.UNIX" -> "TO.UNIX", "VAN.UNIX" -> "FROM.UNIX",
      "NAAR.ISO8601.UTC" -> "TO.ISO8601",
      "NAAR.ISO8601" -> "TO.LOCALISO8601", "VAN.ISO8601" -> "FROM.ISO8601",
      "NAAR.EXCELDATUM" -> "TO.EXCELDATE",
      "VAN.EXCELDATUM" -> "FROM.EXCELDATE", "DATUM.UTC" -> "DATE.UTC",
      "JAAR.UTC" -> "YEAR.UTC", "MAAND.UTC" -> "MONTH.UTC",
      "DAG.UTC" -> "DAY.UTC", "UUR.UTC" -> "HOUR.UTC",
      "MINUUT.UTC" -> "MINUTE.UTC", "SECONDE.UTC" -> "SECOND.UTC",
      "TIJDSDUUR" -> "DURATION", "NA" -> "AFTER", "OMKEREN" -> "NEGATE",
      "AFRONDEN.BOVEN" -> "CEILING", "AFRONDEN.BENEDEN" -> "FLOOR",
      "ASELECTTEKST" -> "RANDOMSTRING", "SCHRIJF.DATUM" -> "WRITE.DATE",
      "LEES.DATUM" -> "READ.DATE", "MACHT" -> "POWER", "UUID" -> "UUID",
      "AANTAL.UNIEK" -> "COUNTDISTINCT", "MEDIAAN.LAAG" -> "MEDIANLOW",
      "MEDIAAN.HOOG" -> "MEDIANHIGH", "MEDIAAN.PAKKET" -> "MEDIANPACK",
      "MEDIAAN" -> "MEDIAN", "STDEV.P" -> "STDEV.P", "STDEV.S" -> "STDEV.S",
      "VAR.P" -> "VAR.P", "VAR.S" -> "VAR.S", "VAN.JSON" -> "JSON.DECODE",
      "LEES.GETAL" -> "PARSENUMBER", "HILBERT.D" -> "HILBERT.XY.TO.D",
      "HILBERT.X" -> "HILBERT.D.TO.X", "HILBERT.Y" -> "HILBERT.D.TO.Y",
      "MACHT.OMHOOG" -> "POWER.UP", "MACHT.OMLAAG" -> "POWER.DOWN",
      "BASE64.ENCODEREN" -> "BASE64.ENCODE",
      "BASE64.DECODEREN" -> "BASE64.DECODE",
      "HEX.ENCODEREN" -> "HEX.ENCODE", "HEX.DECODEREN" -> "HEX.DECODE",
      "ENCODEREN" -> "ENCODE", "DECODEREN" -> "DECODE",
      "GROOTTE.VAN" -> "NUMBEROFBYTES", "LIJST" -> "LIST",
      "INPAKKEN" -> "PACK.LIST", "UITPAKKEN" -> "UNPACK.LIST",
      "INVOEGEN" -> "APPEND", "INVOEGEN.LIJST" -> "APPENDLIST",
      "NAAR.JSON" -> "JSON.ENCODE", "LIJMEN" -> "GLUE"),
    postfixes = siPostfixes)

  val byId: Map[String, WarpLanguage] = Seq(en, nl).map(l => l.id -> l).toMap
}
