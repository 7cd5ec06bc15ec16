package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Cross-engine result-TYPE gate for the oracle catalog (VERDICT r12
  * item 4).
  *
  * The r8-r12 corpus-statistics red family — five rounds of driver-red
  * rows on numerically identical values — was a result-type artifact:
  * DuckDB widens an integer `sum()` to HUGEINT, which serializes as
  * `decimal128(38,0)` on the driver's Arrow fetch path while Spark emits
  * LONG, so a type-sensitive hash diverges with `rows_match: true,
  * schema_match: true, hash_match: false`. This spec makes that class of
  * bug impossible to reintroduce: it binds EVERY `SparkEntry.oracleSql`
  * query in a real DuckDB (via the driver-side python package, over views
  * of the sf0.001 parquet tables) and fails if any output column's DuckDB
  * type is HUGEINT/UHUGEINT, or if any query fails to bind at all.
  *
  * Self-test built in: `q_diag_sum_uncast` is the DELIBERATELY-bare
  * conviction probe (its driver red + its cast twin's green convict the
  * HUGEINT repr by difference each round). The spec asserts the lint DOES
  * flag it — a planted bare sum that went undetected would fail here, so
  * the detector itself is regression-gated.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Queries allowed to emit HUGEINT: the uncast conviction probe only. */
  private val allowBare = Set("q_diag_sum_uncast")

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private val sfDir = "/root/testdata/sf0.001"

  private def pythonOk: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  test("no oracle output column binds to HUGEINT in DuckDB (bare integer sum gate)") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir missing")
    assume(pythonOk, "python3+duckdb unavailable; driver environment has it")

    val dir = Files.createTempDirectory("oraclelint")
    val sqlJson = dir.resolve("oracle_sql.json")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Verify.jsonQuote(k)}: ${Verify.jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(sqlJson, json)

    // Line protocol (no JSON parsing on the Scala side):
    //   BAD <tab> name <tab> column <tab> ducktype   — HUGEINT at output
    //   ERR <tab> name <tab> message                 — query failed to bind
    //   OK  <tab> n_checked
    val script =
      s"""import duckdb, json, sys
         |con = duckdb.connect()
         |for t in ${tables.map(t => s"'$t'").mkString("[", ",", "]")}:
         |    con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('$sfDir/%s.parquet')" % (t, t))
         |qs = json.load(open(sys.argv[1]))
         |n = 0
         |for name, q in sorted(qs.items()):
         |    try:
         |        rel = con.sql(q)
         |        for c, t in zip(rel.columns, rel.types):
         |            if 'HUGEINT' in str(t).upper():
         |                print('BAD\\t%s\\t%s\\t%s' % (name, c, t))
         |        n += 1
         |    except Exception as e:
         |        print('ERR\\t%s\\t%s' % (name, str(e).split(chr(10))[0][:300]))
         |print('OK\\t%d' % n)
         |""".stripMargin
    val scriptPath = dir.resolve("lint.py")
    Files.writeString(scriptPath, script)

    val pb = new ProcessBuilder("python3", scriptPath.toString, sqlJson.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    assert(rc == 0, s"lint.py exited $rc:\n$out")

    val lines = out.linesIterator.toSeq
    val bad = lines.filter(_.startsWith("BAD\t")).map(_.split("\t", -1))
    val errs = lines.filter(_.startsWith("ERR\t"))
    val okCount = lines.collectFirst { case l if l.startsWith("OK\t") =>
      l.split("\t")(1).toInt }

    assert(errs.isEmpty,
      s"oracle SQL failed to bind in DuckDB (driver gate would red these):\n${errs.mkString("\n")}")

    val offenders = bad.filterNot(b => allowBare.contains(b(1)))
    assert(offenders.isEmpty,
      "bare integer aggregate reaches an oracle output column (DuckDB widens " +
        "to HUGEINT = Arrow decimal128(38,0), hash-red vs Spark LONG; wrap in " +
        s"CAST(... AS BIGINT)):\n${offenders.map(_.mkString(" ")).mkString("\n")}")

    // detector self-test: the deliberately-bare probe MUST be flagged —
    // if it is not, the lint has gone blind (or the probe was retired
    // without updating the allowlist) and this gate is no longer guarding
    val flaggedUncast = bad.exists(b => b(1) == "q_diag_sum_uncast")
    val uncastPresent = SparkEntry.oracleSql.contains("q_diag_sum_uncast")
    assert(!uncastPresent || flaggedUncast,
      "q_diag_sum_uncast (deliberately bare sum) was NOT flagged HUGEINT — the lint is blind")

    assert(okCount.exists(_ == SparkEntry.oracleSql.size),
      s"checked ${okCount.getOrElse(-1)} of ${SparkEntry.oracleSql.size} oracle queries")
  }
}
