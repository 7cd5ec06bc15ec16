package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern/range generator source (reference: WarpCore/Sources/Sequencer.swift —
  * grammar in its header comment — and QBESequencerStep.swift:27).
  *
  * A pattern like `[A-Z]{2}` or `(foo|bar)[0-9]` denotes a finite language;
  * the reference enumerates it as a source table. Here the enumeration is
  * DISTRIBUTED: total cardinality is computed at plan time, `spark.range(0,
  * cardinality)` partitions the index space across executors, and each index
  * is decoded to its string via a mixed-radix positional decode — so a
  * billion-row generated table never passes through the driver.
  *
  * Supported grammar (subset of the reference's):
  *   atom     := literal char | '[' class ']' | '(' alt ('|' alt)* ')'
  *   class    := (char | char '-' char)+
  *   postfix  := atom ('{' n '}')?
  *   pattern  := postfix*
  */
object Sequencer {

  sealed trait Node {
    def cardinality: Long
    /** Decode the i-th element (0 <= i < cardinality). */
    def decode(i: Long): String
  }

  final case class Lit(s: String) extends Node {
    val cardinality = 1L
    def decode(i: Long): String = s
  }

  final case class Chars(chars: IndexedSeq[Char]) extends Node {
    val cardinality: Long = chars.length.toLong
    def decode(i: Long): String = chars(i.toInt).toString
  }

  final case class Seqn(nodes: List[Node]) extends Node {
    // overflow-checked: a pattern like [0-9a-z]{13} exceeds Long and must
    // error, not silently wrap into a wrong row count
    val cardinality: Long = nodes.map(_.cardinality)
      .foldLeft(1L)((a, b) => Math.multiplyExact(a, b))
    def decode(i: Long): String = {
      // mixed-radix, last node varies fastest (odometer order)
      val sb = new StringBuilder
      var rem = i
      val radices = nodes.map(_.cardinality)
      val out = new Array[String](nodes.length)
      var k = nodes.length - 1
      while (k >= 0) {
        val r = radices(k)
        out(k) = nodes(k).decode(rem % r)
        rem /= r
        k -= 1
      }
      out.foreach(sb ++= _)
      sb.result()
    }
  }

  final case class Alt(nodes: List[Node]) extends Node {
    val cardinality: Long = nodes.map(_.cardinality)
      .foldLeft(0L)((a, b) => Math.addExact(a, b))
    def decode(i: Long): String = {
      var rem = i
      for (n <- nodes) {
        if (rem < n.cardinality) return n.decode(rem)
        rem -= n.cardinality
      }
      throw new IndexOutOfBoundsException(s"$i >= $cardinality")
    }
  }

  final case class Rep(node: Node, n: Int) extends Node {
    private val inner = Seqn(List.fill(n)(node))
    val cardinality: Long = inner.cardinality
    def decode(i: Long): String = inner.decode(i)
  }

  /** Recursive-descent parser for the pattern grammar above. */
  def parse(pattern: String): Node = {
    var pos = 0
    def peek: Char = pattern(pos)
    def eof: Boolean = pos >= pattern.length

    def parseSeq(stopAt: Set[Char]): Node = {
      val nodes = scala.collection.mutable.ListBuffer[Node]()
      while (!eof && !stopAt.contains(peek)) nodes += parsePostfix()
      if (nodes.size == 1) nodes.head else Seqn(nodes.toList)
    }

    def parsePostfix(): Node = {
      val atom = parseAtom()
      if (!eof && peek == '{') {
        pos += 1
        val end = pattern.indexOf('}', pos)
        require(end > 0, s"unterminated {n} in '$pattern'")
        val n = pattern.substring(pos, end).trim.toInt
        pos = end + 1
        Rep(atom, n)
      } else atom
    }

    def parseAtom(): Node = peek match {
      case '[' =>
        pos += 1
        val chars = scala.collection.mutable.ArrayBuffer[Char]()
        while (!eof && peek != ']') {
          val c = peek; pos += 1
          if (!eof && peek == '-' && pos + 1 < pattern.length && pattern(pos + 1) != ']') {
            pos += 1
            val hi = peek; pos += 1
            chars ++= (c to hi)
          } else chars += c
        }
        require(!eof, s"unterminated [class] in '$pattern'")
        pos += 1 // ']'
        Chars(chars.toIndexedSeq)
      case '(' =>
        pos += 1
        val alts = scala.collection.mutable.ListBuffer[Node]()
        alts += parseSeq(Set('|', ')'))
        while (!eof && peek == '|') { pos += 1; alts += parseSeq(Set('|', ')')) }
        require(!eof && peek == ')', s"unterminated (group) in '$pattern'")
        pos += 1
        if (alts.size == 1) alts.head else Alt(alts.toList)
      case '\\' =>
        pos += 1
        require(!eof, s"dangling escape at end of '$pattern'")
        val c = peek; pos += 1
        Lit(c.toString)
      case c =>
        pos += 1
        Lit(c.toString)
    }

    val root = parseSeq(Set.empty)
    require(eof, s"trailing input at $pos in '$pattern'")
    root
  }

  def cardinality(pattern: String): Long = parse(pattern).cardinality

  /** Generated table: one string column, one row per language element,
    * enumerated distributively. */
  def dataset(spark: SparkSession, pattern: String, colName: String = "value"): DataFrame = {
    val root = parse(pattern)
    val card = root.cardinality
    val dec = udf((i: Long) => root.decode(i))
    spark.range(0, card).select(dec(col("id")).as(colName))
  }

  /** Numeric range source (the sequencer's `a..b` form) — pure spark.range. */
  def range(spark: SparkSession, from: Long, to: Long, colName: String = "n"): DataFrame =
    spark.range(from, to).withColumnRenamed("id", colName)

  /** One uniform sample from the pattern language (randomString); null
    * for a degenerate pattern denoting the empty language (e.g. `[]` or an
    * inverted range) — a malformed user pattern must not kill the task. */
  def randomFromPattern(pattern: String, rnd: scala.util.Random): String =
    // Try: a malformed USER pattern inside the per-row UDF must yield
    // invalid (null), not a task-killing parse exception
    scala.util.Try {
      val root = parse(pattern)
      if (root.cardinality <= 0) null
      else root.decode(math.floorMod(rnd.nextLong(), root.cardinality))
    }.getOrElse(null)
}
