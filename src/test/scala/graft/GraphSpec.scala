package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Graph

/** PageRank laws on hand-built graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 3) =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("two-node cycle is the uniform fixed point") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"), iters = 5)
    assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
  }

  test("rank mass is conserved (sums to 1) with dangling nodes present") {
    // c is dangling: a->c, b->c, a->b
    val r = ranks(Seq("a" -> "c", "b" -> "c", "a" -> "b"), iters = 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("c") > r("b") && r("b") > 0) // the sink collects the most mass
  }

  test("a hub pointed to by everyone outranks the spokes") {
    val spokes = (1 to 6).map(i => s"n$i" -> "hub")
    val back = (1 to 6).map(i => "hub" -> s"n$i") // keep hub non-dangling
    val r = ranks(spokes ++ back)
    assert((1 to 6).forall(i => r("hub") > r(s"n$i")))
  }

  test("pagerank is invariant to input partitioning (decimal-exact sums)") {
    val edges = (1 to 40).flatMap(i => Seq(s"u${i % 7}" -> s"v${i % 11}", s"v${i % 11}" -> s"u${i % 5}"))
    val df = edges.toDF("s", "d")
    val a = Graph.pageRank(df.repartition(1), "s", "d", 3)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(df.repartition(13), "s", "d", 3)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("salted dst-sum is bit-identical on a power-law hub graph") {
    // one hub receives half of all edges (the 100 TB skew shape: a few
    // domains collect most links). The doc's claim — the DECIMAL(30,15)
    // contribution sum is associative, so salting the hub's partial sums
    // is EXACT, not approximate — is pinned here: any salt width must
    // reproduce the unsalted ranks bit for bit, dangling mass included.
    val rnd = new scala.util.Random(11)
    val hubEdges = (1 to 300).map(i => s"n$i" -> "hub")
    val rest = (1 to 300).map { i =>
      s"n${rnd.nextInt(300) + 1}" -> s"n${rnd.nextInt(320) + 1}"
    } // targets n301..n320 exist only as dsts -> dangling nodes present
    val df = (hubEdges ++ rest).toDF("s", "d").repartition(7)
    val plain = Graph.pageRank(df, "s", "d", 3)
      .orderBy("node").collect().toSeq
    val salted = Graph.pageRank(df, "s", "d", 3, dstSalt = 8)
      .orderBy("node").collect().toSeq
    assert(salted == plain)
    // sanity: skew is real — the hub holds a large share of total mass
    val m = plain.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("hub") > 0.1)
  }

  test("multi-edges weight the contribution multiply (documented contract)") {
    // a->b twice, a->c once: b receives 2/3 of a's damped mass
    val r = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c", "b" -> "a", "c" -> "a"), iters = 1)
    assert(r("b") > r("c"))
  }

  test("personalized pagerank: mass conserved, concentrates at seeds, salt-invariant") {
    import spark.implicits._
    // hub graph: everyone links to the hub and back; seed = one spoke
    val edges = ((1 to 40).flatMap(i => Seq(s"n$i" -> "hub", "hub" -> s"n$i"))
      :+ ("iso1" -> "iso2") :+ ("iso2" -> "iso1")).toDF("src", "dst")
    val seeds = Seq("n1").toDF("id")
    val pr = Graph.personalizedPageRank(edges, "src", "dst", seeds, "id",
        iters = 4).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // walk restarts only at n1: the isolated 2-cycle is unreachable
    assert(pr("iso1") == 0.0 && pr("iso2") == 0.0)
    // the seed outranks every other spoke; the hub carries real mass
    assert((2 to 40).forall(i => pr("n1") > pr(s"n$i")), pr("n1"))
    assert(pr("hub") > 0.1)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9) // mass conserved
    // salted dst-sum is value-identical
    val salted = Graph.personalizedPageRank(edges, "src", "dst", seeds, "id",
        iters = 4, dstSalt = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == pr)
  }

  test("personalized pagerank: dangling mass restarts at the seeds") {
    import spark.implicits._
    // a -> sink (no out-edges): sink's mass must return to the seed a,
    // not spread uniformly
    val edges = Seq("a" -> "sink").toDF("src", "dst")
    val pr = Graph.personalizedPageRank(edges, "src", "dst",
        Seq("a").toDF("id"), "id", iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr("a") > pr("sink")) // restart keeps the seed on top
  }

  test("kCorePeel: cascading path peel, K5 core survives, duplicates canonicalize") {
    import spark.implicits._
    def run(edges: Seq[(String, String)], k: Int, rounds: Int) =
      Graph.kCorePeel(edges.toDF("s", "d"), "s", "d", k, rounds)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // path a-b-c-d-e at k=2: endpoints fall each round (the cascade the
    // fixed-round form must expose), empty at round 3
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    assert(run(path, 2, 1) == Map("b" -> 1L, "c" -> 2L, "d" -> 1L))
    // round 2 keeps only c, but both its neighbors died with their edges:
    // a node with no surviving edge is OUT (edge-derived output — exactly
    // what the unrolled oracle computes)
    assert(run(path, 2, 2).isEmpty)
    assert(run(path, 2, 3).isEmpty)
    // K5 with a pendant tail: tail peels, the 4-core K5 survives intact
    val k5 = for (a <- Seq("1", "2", "3", "4", "5");
                  b <- Seq("1", "2", "3", "4", "5"); if a < b) yield (a, b)
    val g = k5 ++ Seq("5" -> "t1", "t1" -> "t2")
    val got = run(g, 4, 3)
    assert(got == Map("1" -> 4L, "2" -> 4L, "3" -> 4L, "4" -> 4L, "5" -> 4L))
    // duplicate/reverse/self edges don't inflate degrees
    val messy = Seq("a" -> "b", "b" -> "a", "a" -> "b", "a" -> "a")
    assert(run(messy, 1, 1) == Map("a" -> 1L, "b" -> 1L))
  }

  private def tris(edges: Seq[(String, String)]): Set[(String, String, String)] = {
    import spark.implicits._
    Graph.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  test("triangles: K4 has 4; a path has none; each triangle found once") {
    val k4 = for (a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d");
                  if a < b) yield (a, b)
    assert(tris(k4) == Set(("a", "b", "c"), ("a", "b", "d"),
      ("a", "c", "d"), ("b", "c", "d")))
    assert(tris(Seq("a" -> "b", "b" -> "c", "c" -> "d")).isEmpty)
  }

  test("triangles: self-loops, duplicate and reverse edges canonicalize away") {
    val messy = Seq("a" -> "b", "b" -> "a", "a" -> "b", "a" -> "a",
      "b" -> "c", "c" -> "a", "a" -> "c", "c" -> "c")
    assert(tris(messy) == Set(("a", "b", "c")))
  }

  test("triangles: hub star is triangle-free; one cross edge closes exactly its wedge") {
    val star = (1 to 50).map(i => "hub" -> s"n$i")
    assert(tris(star).isEmpty)
    val got = tris(star :+ ("n3" -> "n17"))
    assert(got == Set(("hub", "n17", "n3"))) // string-sorted triple
  }

  test("triangles matches brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((s"v${rnd.nextInt(30)}", s"v${rnd.nextInt(30)}"))
    // brute force over the canonical undirected set
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (Seq(e._1, e._2).min, Seq(e._1, e._2).max)).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } yield (a, b, c)).toSet
    assert(tris(edges) == brute)
  }
}
