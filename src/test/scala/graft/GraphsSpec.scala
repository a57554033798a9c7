package graft

import graft.operators.Graphs

/** Hand-computed PageRank fixtures (the oracle pins the real-data run;
  * these pin the arithmetic and the invariants). */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def pr(edges: Seq[(String, String, Long)], iters: Int) =
    Graphs.pageRank(edges.toDF("s", "t", "w"), "s", "t", "w", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("cycle is the fixpoint: uniform rank 1.0 survives any iteration count") {
    val cycle = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    assert(pr(cycle, 1) == Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    assert(pr(cycle, 5) == Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
  }

  test("single edge: source decays to the base, sink stabilizes, dangling mass leaks") {
    // a→b: r1(b) = 0.15 + 0.85·1.0 = 1.0; from iter 2 on b only receives
    // a's base 0.15 → 0.15 + 0.85·0.15 = 0.2775
    val out = pr(Seq(("a", "b", 1L)), 3)
    assert(out == Map("a" -> 0.15, "b" -> 0.2775), s"got: $out")
  }

  test("weighted fan-out splits contributions by floored integer shares") {
    // a→b w=3, a→c w=1: b gets (1e6·3) div 4 = 750000, c gets 250000
    // r1(b) = 150000 + 85·750000 div 100 = 787500; r1(c) = 362500
    val out = pr(Seq(("a", "b", 3L), ("a", "c", 1L)), 1)
    assert(out == Map("a" -> 0.15, "b" -> 0.7875, "c" -> 0.3625), s"got: $out")
  }

  test("rank is partitioning-invariant (exact integer arithmetic)") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 20}", s"n${(i * 7 + 3) % 20}", (i % 5 + 1).toLong))
    def run(parts: Int) = Graphs.pageRank(
      edges.toDF("s", "t", "w").repartition(parts), "s", "t", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(13))
  }

  // ---- triangleStats ----

  private def tri(edges: Seq[(String, String)]) =
    Graphs.triangleStats(edges.toDF("s", "t"), "s", "t")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("triangleStats: triangle plus pendant, with direction/multiplicity/self-loops erased") {
    // Triangle a-b-c plus pendant edge c-d; duplicates, a reversed copy
    // and a self-loop must all collapse into the simple undirected graph.
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
      ("c", "d"), ("c", "d"), ("d", "d"))
    val out = tri(edges)
    // deg: a=2 b=2 c=3 d=1; one triangle touches a, b, c.
    // clustering: a,b = (10000·2·1) div (2·1) = 10000 → 1.0;
    // c = 20000 div 6 = 3333 → 0.3333; d: degree < 2 → 0.
    assert(out == Map(
      "a" -> ((2L, 1L, 1.0)), "b" -> ((2L, 1L, 1.0)),
      "c" -> ((3L, 1L, 0.3333)), "d" -> ((1L, 0L, 0.0))), s"got: $out")
  }

  test("triangleStats: a 4-cycle has no triangles") {
    val out = tri(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")))
    assert(out.values.forall { case (d, t, cc) => d == 2 && t == 0 && cc == 0.0 })
  }

  test("triangleStats: K4 — every node in 3 triangles, clustering 1.0") {
    val nodes = Seq("a", "b", "c", "d")
    val edges = for { x <- nodes; y <- nodes if x < y } yield (x, y)
    val out = tri(edges)
    assert(out == nodes.map(_ -> ((3L, 3L, 1.0))).toMap, s"got: $out")
  }

  test("triangleStats is partitioning-invariant") {
    val edges = (0 until 300).map(i => (s"n${i % 25}", s"n${(i * 11 + 2) % 25}"))
    def run(parts: Int) = Graphs.triangleStats(
      edges.toDF("s", "t").repartition(parts), "s", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(run(1) == run(13))
  }

  // ---- k-core ----

  private def core(edges: Seq[(String, String)], k: Int, rounds: Int) =
    Graphs.kCore(edges.toDF("s", "t"), "s", "t", k, rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("kCore: pendant peels off a triangle, the chain it exposes peels next round") {
    // triangle a-b-c, path c-d-e: round 1 drops e (deg 1); round 2 drops
    // d (its degree FELL to 1 when e left — the cascade fixed rounds
    // must capture); the triangle survives with in-core degree 2
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
    assert(core(edges, k = 2, rounds = 3) ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // one round is NOT enough: d still present (fixed-round semantics)
    assert(core(edges, k = 2, rounds = 1).contains("d"))
  }

  test("kCore: a cycle has no 3-core; K4 is its own 3-core") {
    assert(core(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")),
      k = 3, rounds = 3).isEmpty)
    val nodes = Seq("a", "b", "c", "d")
    val k4 = for { x <- nodes; y <- nodes if x < y } yield (x, y)
    assert(core(k4, k = 3, rounds = 3) == nodes.map(_ -> 3L).toMap)
  }

  // ---- HITS ----

  private def runHits(edges: Seq[(String, String, Long)], iters: Int) =
    Graphs.hits(edges.toDF("s", "t", "w"), "s", "t", "w", iters)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap

  test("hits: a pure hub and a pure authority separate after one iteration") {
    // h -> a1, h -> a2: h is the only hub, a1/a2 the only authorities.
    val out = runHits(Seq(("h", "a1", 1L), ("h", "a2", 1L)), iters = 1)
    // auth raw: a1 = a2 = 1e6; norm over |V|=3 → (1e6·3·1e6)//2e6 = 1.5e6.
    // hub raw: h = 1.5e6 + 1.5e6 = 3e6, only mass → (3e6·3·1e6)//3e6 = 3e6.
    assert(out("h") == ((0.0, 3.0)), s"got: $out")
    assert(out("a1") == ((1.5, 0.0)) && out("a2") == ((1.5, 0.0)), s"got: $out")
  }

  test("hits: edge weight shifts authority mass proportionally") {
    // one hub, two authorities, 3:1 weights → auth split 3:1 after norm
    val out = runHits(Seq(("h", "x", 3L), ("h", "y", 1L)), iters = 1)
    // raw: x = 3e6, y = 1e6, Σ = 4e6, |V| = 3:
    // x = (3e6·3e6·1e6... ) → (3e6·3·1e6)//4e6 = 2.25e6; y = 0.75e6
    assert(out("x")._1 == 2.25 && out("y")._1 == 0.75, s"got: $out")
  }

  test("hits is partitioning-invariant (exact integer arithmetic)") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 13}", s"n${(i * 7 + 3) % 13}", (i % 5 + 1).toLong))
    def run(parts: Int) = Graphs.hits(
      edges.toDF("s", "t", "w").repartition(parts), "s", "t", "w", iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(run(1) == run(11))
  }

  /** Sequential twin of labelPropagation: synchronous rounds, max
    * weight-sum, ties to the smallest label, no-vote nodes fall back to
    * their own id — the operator's exact contract. */
  private def refLp(edges: Seq[(String, String, Long)],
                    rounds: Int): Map[String, String] = {
    val sym = edges.flatMap { case (s, t, w) => Seq((s, t, w), (t, s, w)) }
    val nodes = sym.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 0 until rounds) {
      lab = nodes.map { n =>
        val votes = sym.filter(_._2 == n)
          .groupBy(e => lab(e._1)).view.mapValues(_.map(_._3).sum).toMap
        if (votes.isEmpty) n -> n
        else { val mx = votes.values.max
          n -> votes.collect { case (l, v) if v == mx => l }.min }
      }.toMap
    }
    lab
  }

  private def lp(edges: Seq[(String, String, Long)], rounds: Int) =
    Graphs.labelPropagation(edges.toDF("s", "t", "w"), "s", "t", "w", rounds)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("labelPropagation: two cliques with a weak bridge settle into two communities") {
    val tri = (p: String) => Seq((s"${p}1", s"${p}2", 10L),
      (s"${p}2", s"${p}3", 10L), (s"${p}1", s"${p}3", 10L))
    val edges = tri("a") ++ tri("b") :+ (("a3", "b1", 1L))
    val out = lp(edges, rounds = 5)
    assert(Set("a1", "a2", "a3").map(out) == Set("a1"),
      s"clique A must agree on a1: $out")
    assert(Set("b1", "b2", "b3").map(out) == Set("b1"),
      s"clique B must agree on b1: $out")
    assert(out == refLp(edges, 5), "must equal the sequential twin")
  }

  test("labelPropagation equals the sequential twin and is partitioning-invariant") {
    val edges = (0 until 120).map(i =>
      (s"n${i % 17}", s"n${(i * 5 + 2) % 17}", (i % 4 + 1).toLong))
      .filter { case (s, t, _) => s != t }.distinct
    val one = lp(edges, rounds = 4)
    assert(one == refLp(edges, 4), "engine must equal the sequential reference")
    val many = Graphs.labelPropagation(
      edges.toDF("s", "t", "w").repartition(13), "s", "t", "w", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one == many, "labels must not depend on partitioning")
  }

  test("labelPropagation: the documented bipartite 2-cycle is reproducible, not a hang") {
    // K2,2 with self-labels: synchronous LP oscillates — every node swaps
    // sides each round. Fixed rounds make the oscillation a DETERMINISTIC
    // function of the round count (the docstring's contract), where a
    // convergence loop would spin forever.
    val edges = Seq(("l1", "r1", 1L), ("l1", "r2", 1L),
      ("l2", "r1", 1L), ("l2", "r2", 1L))
    val even = lp(edges, rounds = 4)
    val odd = lp(edges, rounds = 5)
    assert(even == refLp(edges, 4) && odd == refLp(edges, 5),
      "both parities must equal the sequential twin")
    assert(even != odd, "the 2-cycle must be visible across parities")
    assert(lp(edges, rounds = 4) == even, "and exactly reproducible")
  }

  test("modularity: hand-computed Newman Q on two cliques; one-community scores 0") {
    val edges = Seq(("a1", "a2", 1L), ("a2", "a3", 1L), ("a1", "a3", 1L),
      ("b1", "b2", 1L), ("b2", "b3", 1L), ("b1", "b3", 1L),
      ("a3", "b1", 1L)).toDF("u", "v", "w")
    val goodLabels = Seq("a1", "a2", "a3").map(_ -> "A") ++
      Seq("b1", "b2", "b3").map(_ -> "B")
    val good = Graphs.modularity(edges, "u", "v", "w",
        goodLabels.toDF("node", "community"), "node", "community")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // m=7; per clique: w_in=3, deg_sum=7 → (1e4·(4·7·3 − 49)) div 196 = 1785
    assert(good == Map("A" -> ((3L, 3L, 7L, 1785L)),
      "B" -> ((3L, 3L, 7L, 1785L))), s"got: $good")
    // exact total from the exact columns: Q = (4m·Σw_in − Σdeg²)/(4m²)
    val q = (4 * 7 * 6 - (49 + 49)) * 10000 / (4 * 49)
    assert(q == 3571, s"sanity: true Q is 0.3571, got $q")
    val one = Graphs.modularity(edges, "u", "v", "w",
        goodLabels.map { case (n, _) => (n, "all") }.toDF("node", "community"),
        "node", "community")
      .collect().map(r => r.getLong(4)).head
    assert(one == 0L, "the everything-in-one-community degenerate scores exactly 0")
  }

  test("coOccurrence: hand-computed lift, minCount cut, hot-basket drop") {
    // kept baskets: b1{p,q}, b2{p,q}, b3{x,y}; b4 has 5 items > cap 4
    val rows = Seq(("b1", "p"), ("b1", "q"), ("b1", "p"), // dup deduped
      ("b2", "p"), ("b2", "q"), ("b3", "x"), ("b3", "y")) ++
      (1 to 5).map(i => ("b4", s"cap$i"))
    val out = Graphs.coOccurrence(rows.toDF("bk", "it"), "bk", "it",
        maxBasketSize = 4, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // (p,q): n_both=2, N=3, sup p=q=2 → lift = (10000·2·3) div 4 = 15000
    assert(out == Map(("p", "q") -> ((2L, 15000L))), s"got: $out")
  }

  test("coOccurrence: independent pairs read 10000 bp, pairs below minCount vanish") {
    // b1{p,q,r}, b2{p,q}, b3{p,q}: (p,q) n=3, sup 3·3, N=3 → exactly 10000
    val rows = Seq(("b1", "p"), ("b1", "q"), ("b1", "r"),
      ("b2", "p"), ("b2", "q"), ("b3", "p"), ("b3", "q"))
    val out = Graphs.coOccurrence(rows.toDF("bk", "it"), "bk", "it",
        maxBasketSize = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(("p", "q") -> ((3L, 10000L))),
      s"(p,r)/(q,r) are single-basket and must be cut: $out")
  }

  test("linkPrediction: hand-computed RA on a path+hub graph; existing edges excluded") {
    // path a-b-c plus hub h linked to a and c:
    //   non-edges with common neighbors: (a,c) via b (deg 2) and h (deg 2)
    //   → n_common=2, ra = 2·(1e6 div 2) = 1e6; (b,h) via a and c (both
    //   deg 2)... wait a links b,h → deg(a)=2; c links b,h → deg(c)=2.
    //   (b,h): common a,c → ra = 500000+500000 = 1e6, n_common=2.
    val edges = Seq(("a", "b"), ("b", "c"), ("h", "a"), ("h", "c"))
      .toDF("s", "t")
    val out = Graphs.linkPrediction(edges, "s", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(("a", "c") -> ((2L, 1000000L)),
      ("b", "h") -> ((2L, 1000000L))), s"got: $out")
  }

  test("linkPrediction: maxDegree cuts hub wedge centers; duplicate/reversed input edges collapse") {
    // star: hub z linked to 5 leaves (deg 5); leaves pairwise predicted
    // via z with ra = 1e6 div 5 = 200000 — unless z is degree-capped out
    val star = (1 to 5).flatMap(i => Seq(("z", s"l$i"), (s"l$i", "z")))
      .toDF("s", "t")
    val full = Graphs.linkPrediction(star, "s", "t").collect()
    assert(full.length == 10 && full.forall(_.getLong(3) == 200000L))
    assert(Graphs.linkPrediction(star, "s", "t", maxDegree = 4).count() == 0L)
  }

  // ---- bfsHops ----

  private def bfs(edges: Seq[(String, String)], seeds: Seq[String],
                  rounds: Int, directed: Boolean = false) =
    Graphs.bfsHops(edges.toDF("s", "t"), "s", "t",
        seeds.toDF("node"), "node", rounds, directed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("bfsHops: path graph — exact hop counts, horizon cuts the tail, seed wins at 0") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(bfs(path, Seq("a"), rounds = 2) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    assert(bfs(path, Seq("a"), rounds = 4) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
    // a seeded interior node is hop 0, not its distance from the other seed
    assert(bfs(path, Seq("a", "c"), rounds = 4) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 0L, "d" -> 1L, "e" -> 2L))
  }

  test("bfsHops: direction respected when directed, erased when not; isolated seed emits at 0") {
    val e = Seq(("a", "b"), ("c", "b"))
    assert(bfs(e, Seq("a"), rounds = 3, directed = true) ==
      Map("a" -> 0L, "b" -> 1L))
    assert(bfs(e, Seq("a"), rounds = 3) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    assert(bfs(e, Seq("x"), rounds = 2) == Map("x" -> 0L))
  }

  test("bfsHops: min wins over multiple paths and is partitioning-invariant") {
    // diamond with a long way round: a→b→z and a→c→d→z
    val e = Seq(("a", "b"), ("b", "z"), ("a", "c"), ("c", "d"), ("d", "z"))
    val out = bfs(e, Seq("a"), rounds = 4)
    assert(out("z") == 2L, s"got: $out")
    val big = (0 until 300).map(i => (s"n${i % 30}", s"n${(i * 11 + 7) % 30}"))
    def run(parts: Int) = Graphs.bfsHops(
      big.toDF("s", "t").repartition(parts), "s", "t",
      Seq("n0", "n7").toDF("node"), "node", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  // ---- frequentTriples ----

  test("frequentTriples: hand-counted supports, minCount cut, hot-basket drop") {
    // baskets: {1,2,3} ×2, {1,2,3,4}, {1,2} — triple (1,2,3) in 3
    // baskets; (1,2,4),(1,3,4),(2,3,4) in 1 each (cut at minCount 2);
    // a 5-item basket is dropped by maxBasketSize=4 before pairing.
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L), (12L, 4L),
      (13L, 1L), (13L, 2L),
      (14L, 1L), (14L, 2L), (14L, 3L), (14L, 4L), (14L, 5L))
    val out = Graphs.frequentTriples(rows.toDF("bk", "it"), "bk", "it",
        maxBasketSize = 4, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(out == Map((1L, 2L, 3L) -> 3L), s"got: $out")
  }

  test("frequentTriples equals brute-force triple counting (apriori property)") {
    // pseudo-random baskets; brute force = enumerate + filter
    val rows = (0 until 400).map { i =>
      ((i * 7919 % 40).toLong, (i * 104729 % 12).toLong)
    }.distinct
    val out = Graphs.frequentTriples(rows.toDF("bk", "it"), "bk", "it",
        maxBasketSize = 8, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val kept = rows.groupBy(_._1).filter(_._2.size <= 8)
      .values.flatten.toSeq
    val brute = kept.groupBy(_._1).values.toSeq
      .flatMap { b =>
        val its = b.map(_._2).sorted
        for (x <- its; y <- its if x < y; z <- its if y < z) yield (x, y, z)
      }
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    assert(out == brute, s"engine: $out\nbrute: $brute")
  }

  test("itemItemCf: cosine ranks and exact integer tiebreak") {
    import spark.implicits._
    val bi = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 1L), (4L, 2L)).toDF("bk", "it")
    val out = Graphs.itemItemCf(bi, "bk", "it", maxBasketSize = 10,
        minCount = 2, k = 2)
      .orderBy("item", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // sup: 1->3, 2->4, 3->2; pairs: (1,2)=3, (2,3)=2; (1,3)=1 cut
    // cos(1,2)=3/sqrt(12)=0.8660, cos(2,3)=2/sqrt(8)=0.7071
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 3L, 0.866),
      (2L, 1L, 1L, 3L, 0.866),
      (2L, 2L, 3L, 2L, 0.7071),
      (3L, 1L, 2L, 2L, 0.7071)), out.toSeq.toString)
  }

  test("assortativity: a star is exactly -1; a regular graph is NULL") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r1 = Graphs.assortativity(star, "a", "b").collect()(0)
    assert(r1.getLong(0) == 3L && r1.getDouble(1) == -1.0, r1.toString)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val r2 = Graphs.assortativity(tri, "a", "b").collect()(0)
    assert(r2.getLong(0) == 3L && r2.isNullAt(1), r2.toString)
  }
}
