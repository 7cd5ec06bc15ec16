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
    "Ti" -> 1024.0 * 1024 * 1024 * 1024,
    "%" -> 0.01, "‰" -> 0.001, "‱" -> 0.0001)

  val en: WarpLanguage = WarpLanguage(
    id = "en", decimalSeparator = ".", groupingSeparator = ",",
    argumentSeparator = ";",
    constants = Map(
      "TRUE" -> true, "FALSE" -> false, "PI" -> math.Pi,
      "NULL" -> null, "EMPTY" -> null, "ERROR" -> Invalid),
    functionNames = Map.empty, // canonical names ARE the en names
    postfixes = siPostfixes)

  /** Dutch locale: decimal comma, Excel-NL function spellings
    * (representative subset of Language.swift:137-358's 108 entries —
    * the mechanism is the point; extending the table is pure data). */
  val nl: WarpLanguage = WarpLanguage(
    id = "nl", decimalSeparator = ",", groupingSeparator = ".",
    argumentSeparator = ";",
    constants = Map(
      "WAAR" -> true, "ONWAAR" -> false, "PI" -> math.Pi,
      "LEEG" -> null, "FOUT" -> Invalid),
    functionNames = Map(
      "ALS" -> "IF", "ALS.FOUT" -> "IFERROR", "EN" -> "AND", "OF" -> "OR",
      "NIET" -> "NOT", "GEMIDDELDE" -> "AVERAGE", "SOM" -> "SUM",
      "AANTAL" -> "COUNT", "AANTALARG" -> "COUNTALL",
      "AANTAL.UNIEK" -> "COUNTDISTINCT",
      "MIN" -> "MIN", "MAX" -> "MAX", "ABS" -> "ABS",
      "BOOGCOS" -> "ACOS", "BOOGSIN" -> "ASIN", "BOOGTAN" -> "ATAN",
      "COS" -> "COS", "SIN" -> "SIN", "TAN" -> "TAN", "EXP" -> "EXP",
      "LN" -> "LN", "LOG" -> "LOG", "WORTEL" -> "SQRT",
      "AFRONDEN" -> "ROUND", "GEHEEL" -> "FLOOR",
      "KIEZEN" -> "CHOOSE", "LINKS" -> "LEFT", "RECHTS" -> "RIGHT",
      "MIDDEN" -> "MID", "LENGTE" -> "LENGTH",
      "KLEINE.LETTERS" -> "LOWER", "HOOFDLETTERS" -> "UPPER",
      "TEKST.SAMENVOEGEN" -> "CONCAT", "SUBSTITUEREN" -> "SUBSTITUTE",
      "MEDIAAN" -> "MEDIAN", "MEDIAAN.LAAG" -> "MEDIANLOW",
      "MEDIAAN.HOOG" -> "MEDIANHIGH", "MEDIAAN.PAKKET" -> "MEDIANPACK",
      "LIJST" -> "LIST", "INPAKKEN" -> "PACK.LIST",
      "UITPAKKEN" -> "UNPACK.LIST", "LIJMEN" -> "GLUE",
      "NAAR.JSON" -> "JSON.ENCODE", "LEES.GETAL" -> "PARSENUMBER",
      "MACHT.OMHOOG" -> "POWER.UP", "MACHT.OMLAAG" -> "POWER.DOWN",
      "BASE64.ENCODEREN" -> "BASE64.ENCODE",
      "BASE64.DECODEREN" -> "BASE64.DECODE",
      "HEX.ENCODEREN" -> "HEX.ENCODE", "HEX.DECODEREN" -> "HEX.DECODE"),
    postfixes = siPostfixes)

  val byId: Map[String, WarpLanguage] = Seq(en, nl).map(l => l.id -> l).toMap
}
