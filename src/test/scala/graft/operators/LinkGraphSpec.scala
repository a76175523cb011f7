package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PageRank vs an independent in-test reference implementation, plus
  * the structural invariants (mass conservation, dangling handling,
  * duplicate collapse, isolated nodes). */
class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Dense reference PageRank over node ids 0..n-1. */
  private def reference(n: Int, edges: Seq[(Int, Int)], iters: Int,
      d: Double = 0.85): Array[Double] = {
    val uniq = edges.distinct
    val out = Array.fill(n)(0)
    uniq.foreach { case (s, _) => out(s) += 1 }
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)((1.0 - d) / n)
      val dangling = (0 until n).filter(out(_) == 0).map(r).sum
      for (v <- 0 until n) next(v) += d * dangling / n
      uniq.foreach { case (s, t) => next(t) += d * r(s) / out(s) }
      r = next
    }
    r
  }

  private def run(edges: Seq[(Int, Int)], iters: Int,
      nodes: Seq[Int] = Nil): Map[Long, Double] = {
    val e = edges.toDF("src", "dst")
    val nd = if (nodes.isEmpty) null else nodes.toDF("id")
    LinkGraph.pageRank(e, "src", "dst", iters, nodes = nd)
      .as[(Long, Double)].collect().toMap
  }

  test("matches the dense reference on a mixed graph with dangling nodes") {
    // 0→1, 0→2, 1→2, 2→0, 3 dangling, 4→0 ; node 5 isolated (via nodes)
    val edges = Seq((0, 1), (0, 2), (1, 2), (2, 0), (4, 0), (0, 1) /* dup */)
    for (iters <- Seq(1, 3, 10)) {
      val got = run(edges, iters, nodes = Seq(3, 5))
      val want = reference(6, edges, iters)
      assert(got.size == 6)
      for (v <- 0 until 6)
        assert(math.abs(got(v.toLong) - want(v)) < 1e-12, s"node $v iters $iters")
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conserved")
    }
  }

  test("symmetric cycle converges to uniform; star concentrates on the hub") {
    val cycle = run(Seq((0, 1), (1, 2), (2, 0)), 8)
    cycle.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    val starEdges = Seq((1, 0), (2, 0), (3, 0), (0, 1))
    val star = run(starEdges, 10)
    val want = reference(4, starEdges, 10)
    for (v <- 0 until 4)
      assert(math.abs(star(v.toLong) - want(v)) < 1e-12, s"node $v")
    // the leaves tie and rank below both the hub and its sole target
    assert(math.abs(star(2L) - star(3L)) < 1e-12, "leaves tie")
    assert(star(2L) < star(0L) && star(2L) < star(1L))
  }

  test("all-dangling graph: teleport-only fixed point stays uniform") {
    // nodes exist only through the nodes frame; no edges at all
    val got = run(Seq.empty[(Int, Int)], 4, nodes = Seq(0, 1, 2, 3))
    got.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("label propagation: two cliques joined by one bridge resolve to two labels") {
    import spark.implicits._
    // cliques {0,1,2} and {10,11,12}, one bridge 2-10
    val clique = (a: Seq[Long]) =>
      for (x <- a; y <- a if x < y) yield (x, y)
    val edges = (clique(Seq(0L, 1L, 2L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((2L, 10L))).toDF("src", "dst")
    val got = LinkGraph.labelPropagation(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique is internally uniform and the two communities stay
    // distinct (the bridge node's ORIGINAL id may be the label that
    // wins a clique — synchronous min-tie-break leaks it in round 1 —
    // so assert community structure, not specific label values)
    assert(Seq(0L, 1L, 2L).map(got).distinct.size == 1)
    assert(Seq(10L, 11L, 12L).map(got).distinct.size == 1)
    assert(got(0L) != got(10L))
  }

  test("label propagation is deterministic; odd cycles converge; self-loops drop") {
    import spark.implicits._
    // triangle (odd cycle — converges; even paths oscillate under
    // synchronous updates, the documented trade for determinism)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 5L)).toDF("src", "dst")
    val a = LinkGraph.labelPropagation(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LinkGraph.labelPropagation(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(!a.contains(5L)) // pure self-loop node has no real edges
    assert(a.values.toSet.size == 1) // the triangle converges to one label
    // the nodes-universe form keeps isolates with their own label
    val withIso = LinkGraph.labelPropagation(edges, "src", "dst",
      iterations = 3, nodes = Seq(5L, 9L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withIso(5L) == 5L && withIso(9L) == 9L)
    assert(withIso.filterKeys(Set(1L, 2L, 3L)).toMap ==
      a.filterKeys(Set(1L, 2L, 3L)).toMap)
  }

  test("stable LP: 4-cycle oscillation is detected and min-resolved; " +
      "converged graphs read stable") {
    import spark.implicits._
    // even cycle 0-1-2-3: synchronous LP flips between [1,0,1,0] and
    // [0,1,0,1] forever — every node unstable, min of the pair = 0
    // everywhere (one community, which is the right answer)
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val got = LinkGraph.labelPropagationStable(cyc, "src", "dst",
      iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.forall(!_._3), s"expected all-oscillating: ${got.toSeq}")
    assert(got.forall(_._2 == 0L), s"min-resolve: ${got.toSeq}")
    // parity-independence: the plain variant reads opposite phases at
    // 3 vs 4 rounds; the stable variant reads the same answer
    val it4 = LinkGraph.labelPropagationStable(cyc, "src", "dst",
      iterations = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.sortBy(_._1).toSeq == it4.sortBy(_._1).toSeq)
    // a converged triangle reports stable and matches the plain variant
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val st = LinkGraph.labelPropagationStable(tri, "src", "dst",
      iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val plain = LinkGraph.labelPropagation(tri, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st.forall(_._3))
    assert(st.forall(t => plain(t._1) == t._2))
  }
}
