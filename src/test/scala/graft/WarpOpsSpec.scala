package graft

import org.apache.spark.sql.functions._
import graft.ops.WarpOps._
import graft.ops.WarpOps.Order

/** Operator-algebra tests (reference semantics cites in WarpOps). */
class WarpOpsSpec extends SparkSpec {

  test("rangeJoin: half-open containment via binned equi-join, no nested loop") {
    import spark.implicits._
    val vals = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0), (4L, 99.0)).toDF("id", "v")
    val ivs = Seq(("x", 0.0, 10.0), ("y", 10.0, 30.0), ("z", 20.0, 26.0)).toDF("tag", "lo", "hi")
    val out = graft.ops.RangeJoin.rangeJoin(vals, "v", ivs, "lo", "hi", binWidth = 7.0)
      .select("id", "tag").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "x"), (2L, "y"), (3L, "y"), (3L, "z"))) // 10.0: hi-exclusive, lo-inclusive
    val plan = graft.ops.RangeJoin.rangeJoin(vals, "v", ivs, "lo", "hi", 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan.take(1500))
    // left join: rows matching no interval survive null-extended (the
    // range predicate is inside the join condition, not a post-filter)
    val lj = graft.ops.RangeJoin.rangeJoin(vals, "v", ivs, "lo", "hi", 7.0, "left")
    assert(lj.count() == 5) // 4 matches + the unmatched 99.0 row
    assert(lj.filter(col("id") === 4 && col("tag").isNull).count() == 1)
    assertThrows[IllegalArgumentException](
      graft.ops.RangeJoin.rangeJoin(vals, "v", ivs, "lo", "hi", 7.0, "full"))
  }

  test("rangeJoin resolves shared column names without ambiguity") {
    import spark.implicits._
    // both sides have a column named "value" — references must qualify
    val left = Seq((1L, 5.0), (2L, 25.0)).toDF("id", "value")
    val right = Seq((0.0, 10.0, "low"), (20.0, 30.0, "value-band"))
      .toDF("value", "hi", "label")
    val out = graft.ops.RangeJoin.rangeJoin(left, "value", right, "value", "hi", 10.0)
    assert(out.count() == 2)
    assert(out.filter(col("id") === 2).select("label").as[String].collect()(0)
      == "value-band")
    // dotted column names resolve as literals, not nested-field paths
    val dl = Seq((1L, 5.0)).toDF("id", "price.usd")
    val dr = Seq((0.0, 10.0)).toDF("lo", "hi")
    assert(graft.ops.RangeJoin.rangeJoin(dl, "price.usd", dr, "lo", "hi", 10.0)
      .count() == 1)
  }

  test("asofJoin: latest right version at-or-before each event; null before first") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, "a", ts(5)), (2L, "a", ts(10)), (3L, "a", ts(2)),
      (4L, "b", ts(10)), (5L, "b", ts(1))).toDF("id", "k", "ts")
    val versions = Seq(
      ("a", ts(4), 40.0), ("a", ts(10), 100.0), // inclusive at equal ts
      ("b", ts(3), 30.0)).toDF("k", "vts", "price")
    val out = graft.ops.AsofJoin.asofJoin(events, versions, Seq("k"), "ts", "vts", Seq("price"))
      .select("id", "price").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) == 40.0)   // 10:05 -> version at 10:04
    assert(out(2L) == 100.0)  // 10:10 -> inclusive same-timestamp version
    assert(out(3L) == null)   // 10:02 precedes the first version
    assert(out(4L) == 30.0)
    assert(out(5L) == null)
  }
  import spark.implicits._

  test("calculate sees the PRE-update row snapshot (Data.swift:221-230)") {
    val df = Seq((1, 10), (2, 20)).toDF("id", "v")
    val out = df.calculate(Seq(
      "v" -> (col("v") * 2),
      "w" -> (col("v") + 100))) // must read OLD v
      .orderBy("id").collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 20, 110), (2, 40, 120)))
  }

  test("calculate overwrites in place, appends new columns at the end") {
    val df = Seq((1, "a")).toDF("id", "name")
    val out = df.calculate(Seq("name" -> lit("z"), "extra" -> lit(9)))
    assert(out.columns.toSeq == Seq("id", "name", "extra"))
  }

  test("selectColumns ignores missing names, is case-insensitive (Data.swift:256-258)") {
    val df = Seq((1, "a", true)).toDF("id", "Name", "flag")
    val out = df.selectColumns(Seq("NAME", "nope", "id"))
    assert(out.columns.toSeq == Seq("Name", "id")) // case-preserving, reordered
  }

  test("warpSort: numeric flag, desc, nulls-first asc (Data.swift:81-111)") {
    val df = Seq(("10", 1), ("9", 2), (null, 3)).toDF("v", "id")
    val asc = df.warpSort(Seq(Order(col("v"), ascending = true, numeric = true)))
      .select("id").as[Int].collect().toSeq
    assert(asc == Seq(3, 2, 1)) // null first, then 9 < 10 numerically
    val lex = df.warpSort(Seq(Order(col("v"), ascending = true, numeric = false)))
      .select("id").as[Int].collect().toSeq
    assert(lex == Seq(3, 1, 2)) // "10" < "9" lexicographically
  }

  test("warpUnion merges by name case-insensitively with missing columns (Data.swift:300-304)") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, true)).toDF("ID", "flag")
    val out = a.warpUnion(b)
    assert(out.columns.toSeq == Seq("id", "name", "flag"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[String]("name") == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getAs[Boolean]("flag"))
  }

  test("warpJoin drops name-colliding right columns (Data.swift:113-145)") {
    val l = Seq((1, "L")).toDF("k", "name")
    val r = Seq((1, "R", 9.5)).toDF("k", "name", "score")
    val out = l.warpJoin(r, l("k") === r("k"), "inner")
    assert(out.columns.toSeq == Seq("k", "name", "score"))
    assert(out.collect()(0).getAs[String]("name") == "L") // left wins
  }

  test("rank computes running aggregates in order (Data.swift:306-311)") {
    val df = Seq((3, 30.0), (1, 10.0), (2, 20.0)).toDF("id", "v")
    val out = df.rank(Seq(
      ("rn", w => row_number().over(w)),
      ("run", w => sum("v").over(w))),
      Seq(Order(col("id"))))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Int]("rn")).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getAs[Double]("run")).toSeq == Seq(10.0, 30.0, 60.0))
  }

  test("rankDistributed matches global-window rank on ties/nulls/desc keys") {
    import graft.ops.WarpOps.RunningAgg._
    // adversarial frame: duplicate keys (ties), nulls in both the sort key
    // and the aggregated value, a string collation key, enough rows that
    // every range bucket is populated
    val rows = (1 to 500).map { i =>
      val k: java.lang.Integer = if (i % 97 == 0) null else i % 37
      val s = s"g${i % 11}"
      val v: java.lang.Double = if (i % 13 == 0) null else (i % 29).toDouble
      (i, k, s, v)
    }
    val df = rows.toDF("id", "k", "s", "v")
    val orders = Seq(Order(col("k")), Order(col("s"), ascending = false, numeric = false),
      Order(col("id")))
    val slow = df.rank(Seq(
      ("rn", w => count(lit(1)).over(w)),
      ("run", w => sum(col("v").cast("decimal(20,6)")).over(w)),
      ("mn", w => min(col("v")).over(w)),
      ("mx", w => max(col("v")).over(w))), orders)
    val fast = df.rankDistributed(Seq(
      RCount("rn"), RSum("run", col("v").cast("decimal(20,6)")),
      RMin("mn", col("v")), RMax("mx", col("v"))), orders, buckets = 8)
    val key = (r: org.apache.spark.sql.Row) => r.getAs[Int]("id")
    val a = slow.collect().map(r => key(r) -> r.toSeq.drop(4)).toMap
    val b = fast.collect().map(r => key(r) -> r.toSeq.drop(4)).toMap
    assert(a.size == 500 && b.size == 500)
    for (id <- a.keys) assert(a(id) == b(id), s"row $id: ${a(id)} vs ${b(id)}")
  }

  test("rankDistributed RAvg matches global running average") {
    import graft.ops.WarpOps.RunningAgg._
    val df = (1 to 100).map(i =>
      (i, if (i % 7 == 0) null else java.lang.Double.valueOf(i.toDouble)))
      .toDF("id", "v")
    val slow = df.rank(Seq(("m", w => avg(col("v").cast("decimal(20,6)")).over(w))),
      Seq(Order(col("id"))))
    val fast = df.rankDistributed(Seq(RAvg("m", col("v").cast("decimal(20,6)"))),
      Seq(Order(col("id"))), buckets = 4)
    def num(x: Any): Option[Double] =
      Option(x).map(_.asInstanceOf[Number].doubleValue())
    val a = slow.collect().map(r => r.getInt(0) -> num(r.get(1))).toMap
    val b = fast.collect().map(r => r.getInt(0) -> num(r.get(1))).toMap
    for (id <- a.keys)
      assert((a(id), b(id)) match {
        case (None, None) => true
        case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
        case _ => false
      }, s"row $id: ${a(id)} vs ${b(id)}")
  }

  test("flatten melts every cell with row id (Data.swift:270-276)") {
    val df = Seq((1, "a", "b")).toDF("id", "c1", "c2")
    val out = df.flatten("v", Some("src"), Some(("rid", col("id"))))
    assert(out.columns.toSeq == Seq("rid", "src", "v"))
    assert(out.count() == 3) // id, c1, c2 all melt
  }

  test("explode vertical/horizontal (QBEExplodeStep.swift)") {
    val df = Seq((1, "a,b,c")).toDF("id", "csv")
    assert(df.explodeVertically("csv", ",").count() == 3)
    val h = df.explodeHorizontally("csv", ",", 2)
    assert(h.columns.toSeq == Seq("id", "csv", "csv_1", "csv_2"))
    assert(h.collect()(0).getAs[String]("csv_2") == "b")
  }

  test("explodeVertically keeps rows whose cell is null") {
    val df = Seq((1, "a,b"), (2, null)).toDF("id", "csv")
    val out = df.explodeVertically("csv", ",")
    assert(out.count() == 3) // a, b, and the null row — not silently dropped
    assert(out.filter(col("id") === 2).count() == 1)
  }

  test("asofJoin aligns key columns case-insensitively") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq((1L, "a", ts(5))).toDF("id", "k", "ts")
    val versions = Seq(("a", ts(4), 40.0)).toDF("K", "vts", "price") // upper K
    val out = graft.ops.AsofJoin.asofJoin(events, versions,
      Seq("k"), "ts", "vts", Seq("price")).select("price").collect()
    assert(out(0).getDouble(0) == 40.0) // key not nulled by case mismatch
  }

  test("rowsByExample matches empty example cells (empty == empty)") {
    val df = Seq(("x", "1"), ("x", null), ("y", "2")).toDF("a", "b")
    val kept = df.rowsByExample(Seq("a", "b"), Seq(Seq("x", null)), keep = true)
    assert(kept.count() == 1 && kept.collect()(0).getString(0) == "x")
    val removed = df.rowsByExample(Seq("a", "b"), Seq(Seq("x", null)), keep = false)
    assert(removed.count() == 2)
  }

  test("dummies: nulls do not count toward the cardinality guard") {
    val df = Seq((1, "a"), (2, "b"), (3, null)).toDF("id", "v")
    val out = df.dummies("v", maxValues = 2) // 2 real values + a null is OK
    assert(out.columns.toSeq == Seq("id", "v", "v_a", "v_b"))
    assert(out.count() == 3)
  }

  test("warpPivot generates h1_h2 column names (Raster.swift:1012-1022)") {
    val df = Seq(("x", "u", "F", 1.0), ("x", "v", "O", 2.0)).toDF("g", "h1", "h2", "v")
    val out = df.warpPivot(Seq(col("h1"), col("h2")), Seq("g"), sum("v"))
    assert(out.columns.sorted.toSeq == Seq("g", "u_F", "v_O"))
  }

  test("dummies one-hot encodes distinct values (QBEDummiesStep.swift)") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val out = df.dummies("v")
    assert(out.columns.toSeq == Seq("id", "v", "v_a", "v_b"))
    assert(out.filter(col("id") === 1).collect()(0).getAs[Boolean]("v_a"))
  }

  test("search matches any column, case-insensitive (QBESearchStep.swift)") {
    val df = Seq((1, "Hello"), (2, "world")).toDF("id", "v")
    assert(df.search("HELL").count() == 1)
    assert(df.search("1").count() == 1) // matches the id column too
  }

  test("transpose flips the matrix (Raster.swift:657-694)") {
    val df = Seq(("r1", 1, 2), ("r2", 3, 4)).toDF("k", "a", "b")
    val t = df.warpTranspose()
    assert(t.columns.toSeq == Seq("column", "r1", "r2"))
    assert(t.count() == 2)
  }

  test("unique returns distinct expression values (Data.swift:252-254)") {
    val df = Seq(1, 2, 2, 3).toDF("v")
    assert(df.unique(col("v") * 10, "u").as[Int].collect().toSet == Set(10, 20, 30))
  }

  test("randomSample returns exactly n rows without replacement") {
    val df = spark.range(1000).toDF("id")
    val s = df.randomSample(50)
    assert(s.count() == 50)
    assert(s.distinct().count() == 50)
  }


  test("profileColumns: descriptives in one pass, warp coercion, exact vs HLL twin") {
    import spark.implicits._
    val df = Seq(
      (1L, "3", Some(10.0)), (2L, "x", Some(10.0)), (3L, "5", None), (4L, "x", Some(30.0))
    ).toDF("id", "s", "v")
    val p = df.profileColumns(Seq("id", "s", "v"), exactDistinct = true)
      .orderBy("column").collect()
    val byCol = p.map(r => r.getString(0) -> r).toMap
    // id: plain numeric
    assert(byCol("id").getDouble(1) == 2.5 && byCol("id").getLong(5) == 4
      && byCol("id").getLong(6) == 4 && byCol("id").getLong(7) == 0)
    // s: mixed strings — avg over the warp-coercible subset only ("3","5")
    assert(byCol("s").getDouble(1) == 4.0)
    assert(byCol("s").getString(3) == "3" && byCol("s").getString(4) == "x")
    assert(byCol("s").getLong(6) == 3) // distinct: 3, 5, x
    // v: null excluded from avg and counted as empty
    assert(byCol("v").getDouble(1) == 50.0 / 3)
    assert(byCol("v").getLong(6) == 2 && byCol("v").getLong(7) == 1)
    // HLL twin: same shape, distinct approximately right at tiny n
    val approx = df.profileColumns(Seq("s")).collect()(0)
    assert(approx.getLong(6) >= 2 && approx.getLong(6) <= 4)
  }


  test("bracket median equals the buffering exact median across distributions") {
    import graft.ops.BracketMedian
    val rnd = new scala.util.Random(7)
    // continuous, heavy-duplicate discrete, skewed, tiny, and odd/even
    // group sizes — per group the bracket path must match Spark's exact
    // `median` bit for bit
    val rows = Seq.tabulate(5000) { i =>
      val g = i % 7
      val v = g match {
        case 0 => rnd.nextDouble() * 100                  // continuous
        case 1 => (rnd.nextInt(5) + 1).toDouble           // 5 distinct values
        case 2 => math.pow(rnd.nextDouble(), 8) * 1e6     // heavy skew
        case 3 => 42.0                                    // constant
        case _ => rnd.nextGaussian()
      }
      (g.toLong, v)
    } ++ Seq((7L, 1.0), (8L, 1.0), (8L, 2.0), (9L, 1.0), (9L, 2.0), (9L, 3.0))
    val df = rows.toDF("g", "v")
    val exact = df.groupBy("g").agg(median(col("v")).as("m"),
      graft.functions.WarpAggregates.warpMedianLow(col("v")).as("lo"),
      graft.functions.WarpAggregates.warpMedianHigh(col("v")).as("hi"))
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val bracket = BracketMedian.exactMedianFamily(df, Seq("g"), "v", prefix = "m")
      .select("g", "m", "m_low", "m_high")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(bracket == exact)
    val single = BracketMedian.exactMedian(df, Seq("g"), "v", out = "m")
    assert(single.columns.toSeq == Seq("g", "m"))
  }

  test("bracket quantiles equal the buffering exact percentile bit for bit") {
    import graft.ops.BracketMedian
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(6000) { i =>
      val g = i % 5
      val v = g match {
        case 0 => rnd.nextDouble() * 1000
        case 1 => (rnd.nextInt(4) + 1).toDouble // heavy duplicates
        case 2 => math.pow(rnd.nextDouble(), 6) * 1e5
        case 3 => 7.0
        case _ => rnd.nextGaussian()
      }
      (g.toLong, v)
    } ++ Seq((5L, 3.0), (6L, 3.0), (6L, 9.0)) // 1- and 2-element groups
    val df = rows.toDF("g", "v")
    val qs = Seq("p05" -> 0.05, "p25" -> 0.25, "p50" -> 0.5,
      "p75" -> 0.75, "p95" -> 0.95, "p99" -> 0.99)
    val want = df.groupBy("g")
      .agg(percentile(col("v"), array(qs.map(q => lit(q._2)): _*)).as("a"))
      .select(col("g"), col("a")(0), col("a")(1), col("a")(2), col("a")(3),
        col("a")(4), col("a")(5))
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    val got = BracketMedian.exactQuantiles(df, Seq("g"), "v", qs)
      .select("g", "p05", "p25", "p50", "p75", "p95", "p99")
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == want)
    // q=0 / q=1 are the extremes
    val ext = BracketMedian.exactQuantiles(df.filter(col("g") === 6), Seq("g"), "v",
      Seq("lo" -> 0.0, "hi" -> 1.0)).select("lo", "hi").head()
    assert(ext.getDouble(0) == 3.0 && ext.getDouble(1) == 9.0)
  }

  test("skewReport: hot key shows in max and ratio, totals conserve") {
    import graft.ops.Robust
    val rows = (1 to 1000).map(i => ("hot", i)) ++
      (1 to 99).flatMap(k => (1 to 10).map(i => (s"k$k", i)))
    val r = Robust.skewReport(rows.toDF("k", "v"), Seq("k")).head()
    assert(r.getAs[Long]("n_keys") == 100)
    assert(r.getAs[Long]("n_rows") == 1990)
    assert(r.getAs[Long]("max_cnt") == 1000)
    assert(r.getAs[Double]("p50") == 10.0)
    assert(r.getAs[Double]("skew_ratio") == 100.0)
  }

  test("dedupByTolerance: greedy chain, not raw-gap islands") {
    import graft.ops.TimeSeries
    def t(us: Long) = new java.sql.Timestamp(us / 1000) {
      { setNanos(((us % 1000000) * 1000).toInt) }
    }
    // burst 0,5,12 with tol=10: chain keeps 0 AND 12 (5 suppressed);
    // an island formulation would wrongly keep only 0
    val df = Seq((1L, t(0L), 100L), (1L, t(5L), 101L), (1L, t(12L), 102L),
      (1L, t(30L), 103L), (2L, t(3L), 104L)).toDF("k", "ts", "id")
    val got = TimeSeries.dedupByTolerance(df, Seq("k"), "ts",
        toleranceUs = 10L, tieBreak = "id")
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (1L, 102L), (1L, 103L), (2L, 104L)))
    // equal timestamps: the tiebreak row survives, the other suppresses
    val tie = Seq((3L, t(7L), 201L), (3L, t(7L), 200L)).toDF("k", "ts", "id")
    assert(TimeSeries.dedupByTolerance(tie, Seq("k"), "ts", 10L, "id")
      .select("id").as[Long].collect().toSeq == Seq(200L))
    // brute-force law on random bursts
    val rnd = new scala.util.Random(13)
    val evs = Seq.tabulate(300)(i => ((i % 4).toLong, rnd.nextInt(500).toLong, i.toLong))
    val rdf = evs.map { case (k, us, id) => (k, t(us), id) }.toDF("k", "ts", "id")
    val want = evs.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      var last = Long.MinValue
      es.sortBy(e => (e._2, e._3)).flatMap { case (_, us, id) =>
        if (last == Long.MinValue || us - last > 25L) { last = us; Some((k, id)) }
        else None
      }
    }.toSet
    val have = TimeSeries.dedupByTolerance(rdf, Seq("k"), "ts", 25L, "id")
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(have == want)
  }

  test("winsorize: clamps to exact quantile caps, interior rows untouched") {
    import graft.ops.Robust
    val vs = (1 to 100).map(_.toDouble)
    val df = vs.map(("g", _)).toDF("g", "v")
    val got = Robust.winsorize(df, Seq("g"), "v", pLo = 0.1, pHi = 0.9)
      .select("v", "winsorized", "winsorized_clipped")
      .as[(Double, Double, Boolean)].collect().toSeq.sortBy(_._1)
    // type-7 caps computed with the operator's own interpolation form
    def cap(p: Double): Double = {
      val pos = 99.0 * p
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (lo == hi) vs(lo)
      else (hi - pos) * vs(lo) + (pos - math.floor(pos)) * vs(hi)
    }
    val (lo10, hi90) = (cap(0.1), cap(0.9))
    got.foreach { case (v, w, c) =>
      if (v < lo10) assert(w == lo10 && c)
      else if (v > hi90) assert(w == hi90 && c)
      else assert(w == v && !c)
    }
    assert(got.count(_._3) == 20)
    // a null value must STAY null (least/greatest skip nulls: an unguarded
    // clamp silently imputes to the lower cap) and never count as clipped
    val withNull = (vs.map(v => ("g", Some(v))) :+ ("g" -> Option.empty[Double]))
      .toDF("g", "v")
    val nr = Robust.winsorize(withNull, Seq("g"), "v", pLo = 0.1, pHi = 0.9)
      .filter(col("v").isNull).select("winsorized", "winsorized_clipped")
      .collect()
    assert(nr.length == 1 && nr(0).isNullAt(0) && !nr(0).getBoolean(1))
  }

  test("outliers: all-null groups pass through with null z and false flag") {
    import graft.ops.Robust
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(100.0)),
      ("b", None), ("b", None)).toDF("g", "v")
    val got = Robust.outliers(df, Seq("g"), "v", cutoff = 2.0)
    assert(got.count() == 5) // inner joins would drop group b entirely
    val b = got.filter(col("g") === "b")
      .select("robust_z", "robust_z_outlier").collect()
    assert(b.length == 2 && b.forall(r => r.isNullAt(0) && !r.getBoolean(1)))
  }

  test("imputeMedian: nulls get the group median, all-null groups stay null") {
    import graft.ops.Robust
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", Option.empty[Double]),
      ("b", Some(5.0)), ("b", None), ("c", None), ("c", None)).toDF("g", "v")
    val got = Robust.imputeMedian(df, Seq("g"), "v")
      .select("g", "imputed", "imputed_was_null")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2)))
      .groupBy(_._1).view.mapValues(_.toSet).toMap
    assert(got("a") == Set(("a", Some(1.0), false), ("a", Some(3.0), false),
      ("a", Some(2.0), true)))
    assert(got("b") == Set(("b", Some(5.0), false), ("b", Some(5.0), true)))
    assert(got("c") == Set(("c", None, true))) // nothing to impute from
  }

  test("drift: zero gap on identical samples, full gap on disjoint ones") {
    import graft.ops.Robust
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val same = Robust.drift(a, a, "v", nBins = 10)
      .select("gap").as[Double].collect()
    assert(same.forall(_ == 0.0))
    // disjoint ranges: cumulative shares fully separate mid-way
    val b = (101 to 200).map(_.toDouble).toDF("v")
    val dj = Robust.drift(a, b, "v", nBins = 10)
      .select("bin", "gap").as[(Int, Double)].collect().toMap
    assert(dj(4) == 1.0 && dj(9) == 0.0) // a fully cumulated, b not started
    // counts conserve
    val cs = Robust.drift(a, b, "v", 10)
      .agg(sum(col("cnt_a")), sum(col("cnt_b"))).head()
    assert(cs.getLong(0) == 100 && cs.getLong(1) == 100)
    // degenerate: constant value -> single populated bin, gap 0
    val c = Seq(5.0, 5.0).toDF("v")
    assert(Robust.drift(c, c, "v", 4).filter(col("gap") =!= 0.0).count() == 0)
  }

  test("equiDepthBins: near-equal depths, edge values fall to the lower bin") {
    import graft.ops.Robust
    val rnd = new scala.util.Random(5)
    val df = Seq.tabulate(4000)(i => (i % 2, rnd.nextDouble() * 100)).toDF("g", "v")
    val binned = Robust.equiDepthBins(df, Seq("g"), "v", nBins = 5)
    val depths = binned.groupBy("g", "bin").count()
      .as[(Int, Int, Long)].collect()
    assert(depths.map(_._2).toSet == Set(0, 1, 2, 3, 4))
    // equi-depth: every bin within 2% of n/5
    depths.foreach { case (_, _, c) => assert(math.abs(c - 400) <= 8, s"depth $c") }
    // a value equal to an edge goes DOWN: with v={1,2,3,4}, nBins=2 the
    // median is 2.5; exact 2.0 stays in bin 0
    val edge = Seq((0, 1.0), (0, 2.0), (0, 3.0), (0, 4.0)).toDF("g", "v")
    val bins = Robust.equiDepthBins(edge, Seq("g"), "v", nBins = 2)
      .select("v", "bin").as[(Double, Int)].collect().toMap
    assert(bins == Map(1.0 -> 0, 2.0 -> 0, 3.0 -> 1, 4.0 -> 1))
    // nulls keep a null bin
    val n = Seq((0, Option.empty[Double]), (0, Some(1.0)), (0, Some(2.0)))
      .toDF("g", "v")
    assert(Robust.equiDepthBins(n, Seq("g"), "v", 2).filter(col("v").isNull)
      .select("bin").head().isNullAt(0))
  }

  test("robust outliers equal brute-force median/MAD modified z-scores") {
    import graft.ops.Robust
    def bruteMed(xs: Seq[Double]): Double = {
      val a = xs.sorted; val n = a.length
      (a((n + 1) / 2 - 1) + a(n / 2)) / 2
    }
    val rows = // a: clear outlier; b: constant (MAD=0); c: tiny; d: even n
      Seq.tabulate(11)(i => ("a", (i + 1).toDouble)) ++ Seq(("a", 100.0)) ++
      Seq.fill(5)(("b", 7.0)) ++
      Seq(("c", 1.0), ("c", 2.0), ("c", 9.0)) ++
      Seq(("d", 1.0), ("d", 2.0), ("d", 3.0), ("d", 10.0))
    val df = rows.toDF("g", "v")
    val got = Robust.outliers(df, Seq("g"), "v", cutoff = 2.0)
      .select("g", "v", "robust_z", "robust_z_outlier")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))).toSet
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2))
    val want = rows.map { case (g, v) =>
      val med = bruteMed(byG(g))
      val mad = bruteMed(byG(g).map(x => math.abs(x - med)))
      val z = if (mad > 0) Some(0.6745 * (v - med) / mad) else None
      (g, v, z, z.exists(x => math.abs(x) > 2.0))
    }.toSet
    assert(got == want)
    assert(got.exists { case (g, v, _, o) => g == "a" && v == 100.0 && o })
    assert(got.filter(_._1 == "b").forall { case (_, _, z, o) => z.isEmpty && !o })
  }

  test("resampleFill: dense grid, forward fill, last-in-bucket tiebreak") {
    import graft.ops.TimeSeries
    def t(us: Long) = new java.sql.Timestamp(us / 1000) {
      { setNanos(((us % 1000000) * 1000).toInt) }
    }
    // step=10us. user 1: two events in bucket 0 (later one wins), gap over
    // buckets 1-2, one event in bucket 3. user 2: single event.
    val df = Seq(
      (1L, t(0L), 1.0, 100L), (1L, t(5L), 9.0, 101L),
      (1L, t(33L), 2.0, 102L),
      (2L, t(47L), 4.0, 103L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = TimeSeries.resampleFill(df, "user_id", "ts", "value",
        stepUs = 10L, tieBreak = "event_id")
      .select("user_id", "bucket_ts", "value", "filled")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 9.0, false), (1L, 10L, 9.0, true), (1L, 20L, 9.0, true),
      (1L, 30L, 2.0, false), (2L, 40L, 4.0, false)))
    // same-timestamp tie falls back to the tiebreak column
    val tie = Seq((3L, t(0L), 5.0, 1L), (3L, t(0L), 6.0, 2L)).toDF("user_id", "ts", "value", "event_id")
    assert(TimeSeries.resampleFill(tie, "user_id", "ts", "value", 10L, "event_id")
      .select("value").head().getDouble(0) == 6.0)
    // linear interpolation: 9.0 at bucket 0, 2.0 at bucket 3 -> thirds
    val li = TimeSeries.resampleInterp(df, "user_id", "ts", "value",
        stepUs = 10L, tieBreak = "event_id")
      .select("user_id", "bucket_ts", "value", "filled")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(li == Seq(
      (1L, 0L, 9.0, false),
      (1L, 10L, 9.0 + (2.0 - 9.0) * (1.0 / 3.0), true),
      (1L, 20L, 9.0 + (2.0 - 9.0) * (2.0 / 3.0), true),
      (1L, 30L, 2.0, false), (2L, 40L, 4.0, false)))
  }

  test("resample grid: chunked explode crosses 64Ki block boundaries; huge span raises") {
    import graft.ops.TimeSeries
    def t(us: Long) = new java.sql.Timestamp(us / 1000) {
      { setNanos(((us % 1000000) * 1000).toInt) }
    }
    // span of 200_001 buckets at step=1us crosses 4 coarse blocks; the
    // dense grid must still be exactly lo..hi with the endpoints observed
    val wide = Seq((1L, t(0L), 1.0, 1L), (1L, t(200000L), 2.0, 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val g = TimeSeries.resampleFill(wide, "user_id", "ts", "value",
      stepUs = 1L, tieBreak = "event_id")
    assert(g.count() == 200001L)
    val agg = g.agg(min("bucket_ts"), max("bucket_ts"),
      count_distinct(col("bucket_ts"))).head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) == (0L, 200000L, 200001L))
    // a key spanning >= 2^32 steps would be a multi-billion-row output:
    // the plan must raise the coarsen-stepUs error, not grind or OOM
    val huge = Seq((1L, t(0L), 1.0, 1L), (1L, t((1L << 32) * 1000000L), 2.0, 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val ex = intercept[Exception] {
      TimeSeries.resampleFill(huge, "user_id", "ts", "value",
        stepUs = 1000000L, tieBreak = "event_id").count()
    }
    assert(ex.getMessage.contains("coarsen stepUs") ||
      Option(ex.getCause).exists(_.getMessage.contains("coarsen stepUs")))
  }

  test("twa: large observations survive the decimal mass (no 1e4 cap); bucket bound raises") {
    import graft.ops.TimeSeries
    def t(us: Long) = new java.sql.Timestamp(us / 1000) {
      { setNanos(((us % 1000000) * 1000).toInt) }
    }
    // |value| >= 1e4 used to overflow the DECIMAL(10,6) value cast to
    // null in non-ANSI mode, silently dropping the observation's mass
    val df = Seq((1L, t(0L), 100000.0, 1L), (1L, t(10L), 0.0, 2L))
      .toDF("k", "ts", "v", "e")
    val out = TimeSeries.twa(df, col("k"), col("ts"), col("v"),
      bucketUs = 1000000L, tieCol = col("e")).collect()(0)
    // mass = 100000 * 10us over a 10us span -> twap = 100000
    assert(out.getAs[Double]("twap") == 100000.0)
    // spans ride DECIMAL(12,0): buckets wider than 1e12 us must raise
    intercept[IllegalArgumentException] {
      TimeSeries.twa(df, col("k"), col("ts"), col("v"),
        bucketUs = 1000000000000L, tieCol = col("e"))
    }
  }

  test("rollingByTime equals the brute-force trailing-window filter, sub-second exact") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) {
      { setNanos(((us % 1000000) * 1000).toInt) }
    }
    // two users; sub-second spacing exercises the microsecond frame
    val rows = Seq(
      (1L, 10L, 1_000_000L, 1.0), (2L, 10L, 1_500_000L, 2.0),
      (3L, 10L, 4_600_001L, 4.0),  // 3.6s window: drops the first event
      (4L, 20L, 1_000_000L, 8.0), (5L, 20L, 4_600_000L, 16.0)) // exactly at the edge: kept
    val df = rows.map { case (e, u, us, v) => (e, u, t(us), v) }
      .toDF("event_id", "user_id", "ts", "value")
    val got = df.rollingByTime(Seq(col("user_id")), col("ts"), 3_600_000L,
        Seq("n" -> (w => count(lit(1)).over(w)),
          "s" -> (w => sum(col("value")).over(w))))
      .select("event_id", "n", "s").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val brute = rows.map { case (e, u, us, _) =>
      val in = rows.filter { case (_, u2, us2, _) => u2 == u && us2 <= us && us2 >= us - 3_600_000L }
      e -> ((in.size.toLong, in.map(_._4).sum))
    }.toMap
    assert(got == brute, s"got $got\nbrute $brute")
  }

  test("funnel: strict ordering, abandonment nulls, out-of-order steps don't count") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val df = Seq(
      // user 1: full funnel in order
      (1L, "A", t(10)), (1L, "B", t(20)), (1L, "C", t(30)),
      // user 2: B BEFORE A — must not count; funnel stops at A
      (2L, "B", t(5)), (2L, "A", t(10)),
      // user 3: A and C but no B — C unreachable
      (3L, "A", t(10)), (3L, "C", t(40)),
      // user 4: never enters the funnel — absent from output
      (4L, "B", t(10)), (4L, "C", t(20)),
      // user 5: simultaneous A and B (strict >) — B must not count
      (5L, "A", t(10)), (5L, "B", t(10))
    ).toDF("user_id", "et", "ts")
    val got = df.funnel(col("user_id"), col("ts"), Seq(
        "a" -> (col("et") === "A"), "b" -> (col("et") === "B"),
        "c" -> (col("et") === "C")))
      .select(col("key"), col("reached")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 1), got.toString)
  }

  test("retentionCohorts: cohort = first-event period, distinct actives per offset") {
    import spark.implicits._
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    val df = Seq(
      (1L, t(0)), (1L, t(1)), (1L, t(1)),   // cohort 0; active d0, d1 (dup d1 counts once)
      (2L, t(0)), (2L, t(2)),               // cohort 0; active d0, d2
      (3L, t(1))                            // cohort 1; active d1 only
    ).toDF("user_id", "ts")
    val got = df.retentionCohorts(col("user_id"), col("ts"), 86400L * 1000000)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)), got.toString)
  }

  test("distinct sketches: shard merge equals one-pass sketch; estimate near exact") {
    import spark.implicits._
    import graft.ops.WarpOps
    val df = Seq.tabulate(3000)(i => (i % 7, s"val_${i % 911}")).toDF("shard", "v")
    val shards = WarpOps.distinctSketchByShard(df, col("shard"), col("v"))
    assert(shards.count() == 7)
    val merged = WarpOps.mergeDistinctSketches(shards)
      .collect()(0).getLong(0)
    // merging shard sketches == sketching the whole corpus in one pass
    val onePass = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .collect()(0).getLong(0)
    assert(merged == onePass, s"merge $merged != one-pass $onePass")
    // estimate within HLL error bounds of the true 911
    assert(math.abs(merged - 911.0) / 911.0 < 0.05, s"estimate $merged")
  }

  test("hllMd5Report: estimate within error bounds, raw and linear-counting branches, invariant") {
    import spark.implicits._
    import graft.ops.WarpOps
    // 911 distinct at m=256 (p=8): raw-estimator branch, std error ~6.5%
    val df = Seq.tabulate(3000)(i => s"val_${i % 911}").toDF("v")
    val r = WarpOps.hllMd5Report(df, col("v"), p = 8).collect()(0)
    assert(r.getAs[Int]("m") == 256)
    assert(r.getAs[Long]("n_exact") == 911)
    assert(r.getAs[Double]("rel_error") < 0.2,
      s"estimate ${r.getAs[Double]("estimate")} too far from 911")
    // 3 distinct at m=256: linear-counting branch; at most 3 registers used
    val tiny = WarpOps.hllMd5Report(Seq("a", "b", "c", "a").toDF("v"),
      col("v"), p = 8).collect()(0)
    assert(tiny.getAs[Long]("used_registers") <= 3)
    val zeros = tiny.getAs[Long]("zeros")
    val lc = 256.0 * math.log(256.0 / zeros)
    assert(math.abs(tiny.getAs[Double]("estimate") - lc) < 1e-5)
    // empty / all-null input: one row, estimate 0, null rel_error
    val empty = WarpOps.hllMd5Report(
      Seq.empty[Option[String]].toDF("v"), col("v")).collect()(0)
    assert(empty.getAs[Double]("estimate") == 0.0 && empty.isNullAt(5))
    val nulls = WarpOps.hllMd5Report(
      Seq[Option[String]](None, None).toDF("v"), col("v")).collect()(0)
    assert(nulls.getAs[Long]("used_registers") == 0L &&
      nulls.getAs[Double]("estimate") == 0.0)
    // integer-scaled register sum: repartitioning cannot move the result
    val a = WarpOps.hllMd5Report(df, col("v"), p = 8).collect()(0).toSeq
    val b = WarpOps.hllMd5Report(df.repartition(23), col("v"), p = 8)
      .collect()(0).toSeq
    assert(a == b)
  }

  test("hllMd5SetAlgebra: union sketch equals the rescan sketch; exact algebra holds") {
    import spark.implicits._
    import graft.ops.WarpOps
    // groups with known overlap: A = 0..599, B = 400..999 -> |A|=600,
    // |B|=600, |A∪B|=1000, |A∩B|=200
    val rows = (0 until 600).map(i => ("A", s"v$i")) ++
      (400 until 1000).map(i => ("B", s"v$i")) ++
      (0 until 50).map(i => ("C", s"w$i")) // disjoint from both
    val df = rows.toDF("g", "v").repartition(7)
    val out = WarpOps.hllMd5SetAlgebra(df, col("g"), col("v"), p = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_union") == 1000 && ab.getAs[Long]("n_inter") == 200)
    // the merged-register union estimate must EQUAL the union's own
    // sketch (register max is lossless merge — not approximately, exactly)
    val rescan = WarpOps.hllMd5Report(
      df.filter(col("g") =!= "C").select("v"), col("v"), p = 8)
      .collect()(0).getAs[Double]("estimate")
    assert(ab.getAs[Double]("est_union") == rescan)
    // disjoint pair: exact intersection 0; estimate within sketch noise
    val ac = out(("A", "C"))
    assert(ac.getAs[Long]("n_inter") == 0)
    assert(math.abs(ac.getAs[Double]("est_inter")) < 0.5 * 600)
    // estimates land within HLL error of truth at m=256
    assert(math.abs(ab.getAs[Double]("est_union") - 1000) / 1000 < 0.25)
    // sketch-only mode (the 100 TB path): identical estimates, null
    // exact companions, and the distinct/recount stages absent from the
    // plan (no count(distinct ...) anywhere)
    val sk = WarpOps.hllMd5SetAlgebra(df, col("g"), col("v"), p = 8,
      exact = false)
    val skAb = sk.collect().map(r => (r.getString(0), r.getString(1)) -> r)
      .toMap.apply(("A", "B"))
    assert(skAb.getAs[Double]("est_union") == ab.getAs[Double]("est_union"))
    assert(skAb.isNullAt(skAb.fieldIndex("n_union")) &&
      skAb.isNullAt(skAb.fieldIndex("n_inter")))
  }

  test("histogram: edges closed-top, out-of-range and non-coercible dropped") {
    import spark.implicits._
    val df = Seq("0", "4.9", "5", "9.9", "10", "x", "-1", "10.1", null)
      .toDF("v")
    val h = df.histogram(col("v"), 0.0, 10.0, 2)
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1).toSeq
    // [0,5): 0, 4.9; [5,10]: 5, 9.9 and hi itself folds into the top bin
    assert(h == Seq((0, 0.0, 5.0, 2L), (1, 5.0, 10.0, 3L)))
  }

  test("bracket medianPack equals the collect_list pack reducer, odd and even") {
    import graft.ops.BracketMedian
    val rnd = new scala.util.Random(11)
    // odd group, even group, duplicate-middle even group, singleton
    val rows = Seq.tabulate(999)(i => (0L, rnd.nextInt(50).toDouble)) ++
      Seq.tabulate(1000)(i => (1L, rnd.nextInt(50).toDouble)) ++
      Seq((2L, 5.0), (2L, 5.0), (2L, 5.0), (2L, 9.0)) ++ Seq((3L, 7.0))
    val df = rows.toDF("g", "v")
    val legacy = df.groupBy("g")
      .agg(graft.functions.WarpAggregates.warpMedianPack(col("v")).as("p"),
        count(col("v")).as("n"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val scalable = BracketMedian.exactMedianPack(df, Seq("g"), "v", out = "p")
      .select("g", "p", "p_n")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(scalable == legacy)
  }

  test("bracket median keeps null group keys like groupBy-median does") {
    import graft.ops.BracketMedian
    val df = Seq((Option(1L), 5.0), (None, 1.0), (None, 3.0)).toDF("g", "v")
    val got = BracketMedian.exactMedian(df, Seq("g"), "v", out = "m")
      .as[(Option[Long], Double)].collect().toMap
    assert(got == Map(Option(1L) -> 5.0, None -> 2.0))
  }

  test("bracket median skips nulls and drops all-null groups") {
    import graft.ops.BracketMedian
    val df = Seq((1L, Some(1.0)), (1L, None), (1L, Some(3.0)), (2L, None))
      .toDF("g", "v")
    val got = BracketMedian.exactMedian(df, Seq("g"), "v", out = "m")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 2.0))
  }
}
