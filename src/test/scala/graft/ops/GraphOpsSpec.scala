package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Fixed-iteration integer PageRank. */
class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("pageRank: one iteration reproduces the hand-computed integer update") {
    // nodes {1,2,3}, edges 1→2, 2→1, 1→3 (w=1); scale 1e6 → base = 333333
    // contribs: node1 splits 333333 div 2 = 166666 to 2 and 3; node2 sends
    // 333333 to 1. r1 = (85·in + 15·333333) div 100:
    //   node1: (85·333333 + 15·333333) div 100 = 333333
    //   node2 = node3: (85·166666 + 15·333333) div 100 = 191666
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val out = GraphOps
      .pageRank(edges, "src", "dst", "w", iters = 1, scale = 1000000L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(1L -> 333333L, 2L -> 191666L, 3L -> 191666L))
  }

  test("pageRank: rank mass never exceeds scale and dangling leak only shrinks it") {
    // node 3 is dangling (no out-edges): its mass leaks each round, so the
    // total is strictly below scale but every rank stays positive
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val ranks = GraphOps
      .pageRank(edges, "src", "dst", "w", iters = 3, scale = 1000000000000L)
      .collect()
      .map(_.getLong(1))
    assert(ranks.sum <= 1000000000000L && ranks.forall(_ > 0L))
  }

  test("pageRank: weights shift rank toward the heavier destination") {
    // 1 sends 3/4 of its mass to 2 and 1/4 to 3; 2 and 3 return to 1
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val out = GraphOps
      .pageRank(edges, "src", "dst", "w", iters = 3, scale = 1000000000000L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out(2L) > out(3L), s"weighted split ignored: $out")
    assert(out(1L) > out(2L), s"the hub must dominate: $out")
  }

  test("triangleStats: K4 minus an edge, messy input canonicalized") {
    // edges {12,13,23,24,34} → triangles {123},{234}; degrees 2,3,3,2 →
    // wedges 1+3+3+1 = 8; clustering 3·2/8 = 0.75. Input includes a
    // reversed duplicate, a self-loop, and a repeated edge — all of
    // which canonicalization must absorb.
    val edges = Seq(
      (1L, 2L), (3L, 1L), (2L, 3L), (2L, 4L), (4L, 3L),
      (2L, 1L), (4L, 4L), (2L, 3L)
    ).toDF("s", "d")
    val r = GraphOps.triangleStats(edges, "s", "d").collect().head
    assert(r.getLong(0) == 4L, s"vertices: $r")
    assert(r.getLong(1) == 5L, s"edges: $r")
    assert(r.getLong(2) == 8L, s"wedges: $r")
    assert(r.getLong(3) == 2L, s"triangles: $r")
    assert(r.getDouble(4) == 0.75, s"clustering: $r")
  }

  test("triangleStats: non-integral vertex ids fail loudly, never count 0 silently") {
    // the adjacency arrays cast ids to long — a string-keyed graph would
    // otherwise null every neighbor and report zero triangles
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val e = intercept[IllegalArgumentException] {
      GraphOps.triangleStats(edges, "s", "d")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("triangleStats: a triangle-free path graph reports zero with live wedges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val r = GraphOps.triangleStats(edges, "s", "d").collect().head
    assert(r.getLong(3) == 0L && r.getLong(2) == 2L)
    assert(r.getDouble(4) == 0.0)
  }

  test("orientByDegree: hub wedge load spreads to neighbors; census unchanged") {
    // star with hub id 500 in the MIDDLE of leaf ids 0..199/800..999 — the
    // worst case for id-order canonicalization (half the edges orient into
    // the hub, half out, so the hub key carries ~(n/2)² wedge pairs in the
    // join) — plus 3 leaf-leaf closures giving 3 known triangles.
    val hub = 500L
    val leaves = ((0L until 200L) ++ (800L until 1000L)).toSeq
    val star = leaves.map(l => (hub, l))
    val closures = Seq((0L, 801L), (1L, 802L), (2L, 803L))
    val edges = (star ++ closures).toDF("s", "d")

    // census correctness is orientation-invariant
    val r = GraphOps.triangleStats(edges, "s", "d").collect().head
    assert(r.getLong(0) == 401L, s"vertices: $r")
    assert(r.getLong(1) == 403L, s"edges: $r")
    assert(r.getLong(3) == 3L, s"triangles: $r")

    // skew audit: the wedge join's key multiplicity at a middle vertex b
    // is d_in(b)·d_out(b) over the ORIENTED edges. The hub outranks every
    // degree-1/2 leaf, so all its edges point in and it contributes ZERO
    // wedge pairs as a middle vertex; under id-order it would carry
    // ~200·203 pairs on one key.
    val o = GraphOps.orientByDegree(edges, "s", "d")
    val din = o.groupBy($"b".as("v")).agg(count(lit(1)).as("din"))
    val dout = o.groupBy($"a".as("v")).agg(count(lit(1)).as("dout"))
    val wedgeLoad = din
      .join(dout, Seq("v"))
      .select($"v", ($"din" * $"dout").as("load"))
      .collect()
      .map(x => x.getLong(0) -> x.getLong(1))
      .toMap
    assert(wedgeLoad.getOrElse(hub, 0L) == 0L,
      s"hub must not be a wedge middle under degree orientation: $wedgeLoad")
    assert(wedgeLoad.values.forall(_ <= 8L),
      s"no single wedge-join key may dominate: max=${wedgeLoad.values.max}")
  }

  test("labelPropagation: cliques elect their minimum id; bridge does not merge them") {
    // two 4-cliques {0..3} and {10..13} joined by one bridge edge 3–10:
    // connected components would chain everything to label 0; LPA's mode
    // rule keeps the dense sides apart (3 in-clique neighbor labels beat
    // the 1 bridge label) — the property that makes it the right
    // community assigner for loosely-bridged near-dup clusters
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(0L to 3L) ++ clique(10L to 13L) :+ ((3L, 10L))).toDF("s", "d")
    val out = GraphOps.labelPropagation(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(out(_) == 0L), s"clique A must elect 0: $out")
    assert((10L to 13L).forall(out(_) == 10L), s"clique B must elect 10: $out")
    // deterministic: same input, same labels
    val again = GraphOps.labelPropagation(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("kcorePeel: pendant chain peels away, the clique core survives with exact degrees") {
    // 4-clique {0..3} with a pendant chain 3–20–21: round 1 drops 21
    // (degree 1) and round 2 drops 20 (degree fell to 1 when 21 left) —
    // the cascade that makes single-pass degree filtering wrong and
    // iterative peeling necessary. The clique survives at degree 3.
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(0L to 3L) ++ Seq((3L, 20L), (20L, 21L))).toDF("s", "d")
    val out = GraphOps.kcorePeel(edges, "s", "d", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"2-core: $out")
  }

  test("kcorePeel: fixed rounds are a documented superset on a long chain; fixpoint is stable") {
    // path 0–1–…–9: the true 2-core is empty, but each round only peels
    // the two endpoints, so rounds=2 leaves the middle — the documented
    // R-round semantics. Enough rounds reach the (empty) fixpoint, and
    // once at fixpoint further rounds change nothing on a clique.
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("s", "d")
    val partial = GraphOps.kcorePeel(path, "s", "d", k = 2, rounds = 2).collect()
    assert(partial.nonEmpty, "2 rounds must not finish peeling a 10-chain")
    val full = GraphOps.kcorePeel(path, "s", "d", k = 2, rounds = 5).collect()
    assert(full.isEmpty, s"the chain's 2-core is empty: ${full.mkString(",")}")
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val k4 = clique(0L to 3L).toDF("s", "d")
    val once = GraphOps.kcorePeel(k4, "s", "d", k = 3, rounds = 1).collect().toSet
    val thrice = GraphOps.kcorePeel(k4, "s", "d", k = 3, rounds = 3).collect().toSet
    assert(once == thrice && once.size == 4, "fixpoint must be round-count invariant")
  }

  test("kcorePeel: cores are nested — the k=3 core is a subset of the k=2 core") {
    // core nesting is the defining property of the decomposition; a peel
    // bug (e.g. filtering on stale degrees) breaks it first
    val rng = new scala.util.Random(11)
    val edges = (1 to 120)
      .map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
      .toDF("s", "d")
    val core2 = GraphOps.kcorePeel(edges, "s", "d", k = 2, rounds = 8)
      .collect().map(_.getLong(0)).toSet
    val core3 = GraphOps.kcorePeel(edges, "s", "d", k = 3, rounds = 8)
      .collect().map(_.getLong(0)).toSet
    assert(core3.subsetOf(core2), s"nesting violated: ${core3 -- core2}")
  }

  test("kcoreFixpoint: certifies a converged peel and flags a truncated one") {
    // clique + pendant chain: rounds=3 reaches the true 2-core (the
    // pendant cascade needs 2 rounds), so the certificate must say so
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(0L to 3L) ++ Seq((3L, 20L), (20L, 21L))).toDF("s", "d")
    val ok = GraphOps.kcoreFixpoint(edges, "s", "d", k = 2, rounds = 3).collect().head
    assert(ok.getInt(0) == 3 && ok.getLong(1) == 4L && ok.getLong(3) == 0L && ok.getBoolean(4),
      s"converged peel not certified: $ok")

    // 10-path, rounds=2: only the endpoints have peeled twice, the middle
    // still stands though the true 2-core is empty — the certificate must
    // report the survivor set still moving (this is exactly the long-chain
    // caveat the fixed round count documents)
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("s", "d")
    val trunc = GraphOps.kcoreFixpoint(path, "s", "d", k = 2, rounds = 2).collect().head
    assert(!trunc.getBoolean(4) && trunc.getLong(3) > 0L,
      s"truncated peel certified as converged: $trunc")
    // and with enough rounds the same chain certifies (empty = empty)
    val done = GraphOps.kcoreFixpoint(path, "s", "d", k = 2, rounds = 5).collect().head
    assert(done.getBoolean(4) && done.getLong(1) == 0L && done.getLong(2) == 0L,
      s"fully peeled chain must certify at the empty core: $done")
  }

  test("labelPropFixpoint: stable cliques certify; the oscillating 2-cycle does not") {
    // two 3-cliques joined by one bridge stabilize in a round or two:
    // after 3 rounds one extra round must change nothing
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+ ((3L, 10L)))
      .toDF("s", "d")
    val ok = GraphOps.labelPropFixpoint(edges, "s", "d", iters = 3).collect().head
    assert(ok.getInt(0) == 3 && ok.getLong(1) == 6L && ok.getLong(2) == 0L && ok.getBoolean(3),
      s"stable labeling not certified: $ok")

    // the isolated edge oscillates under synchronous updates (each node's
    // only neighbor keeps the other label): every probe round flips both
    // labels, so NO iteration count certifies — the certificate is what
    // tells a caller this labeling never settles
    val pair = Seq((7L, 9L)).toDF("s", "d")
    val osc = GraphOps.labelPropFixpoint(pair, "s", "d", iters = 3).collect().head
    assert(!osc.getBoolean(3) && osc.getLong(2) == 2L,
      s"oscillating pair certified as converged: $osc")
  }

  test("labelPropagation: isolated edge pair converges to the lower id in one round") {
    val edges = Seq((7L, 9L)).toDF("s", "d")
    val out = GraphOps.labelPropagation(edges, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: 7 adopts 9's label (its only neighbor) and vice versa —
    // synchronous swap; round 2: both see the other's label again. With
    // self-labels excluded the 2-cycle oscillates, so after an EVEN round
    // count each node holds its own id... unless the tie rule stops it:
    // each node has ONE neighbor, mode = that neighbor's label. iters=2
    // returns each node's original label — the documented synchronous
    // semantics (fixed iters make oscillation deterministic, not wrong).
    assert(out == Map(7L -> 7L, 9L -> 9L), s"synchronous 2-cycle: $out")
  }

  test("bfsDistances: minimal hops, bounded rounds, isolated sources, frontier rediscovery") {
    // path 1-2-3-4-5 plus a shortcut 1-3 (node 3 must take dist 1, not 2),
    // and 99 as an edge-less source
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L)).toDF("a", "b")
    val sources = Seq(1L, 99L).toDF("id")
    val d2 = GraphOps.bfsDistances(edges, "a", "b", sources, "id", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d2 == Map(1L -> 0, 99L -> 0, 2L -> 1, 3L -> 1, 4L -> 2),
      s"2-round frontier: $d2") // 5 is 3 hops out — absent
    val d4 = GraphOps.bfsDistances(edges, "a", "b", sources, "id", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d4(5L) == 3 && d4.size == 6, s"full closure: $d4")
  }

  test("bfsFixpoint certifies closure exactly when nothing lies beyond R hops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L)).toDF("a", "b")
    val sources = Seq(1L).toDF("id")
    val open = GraphOps.bfsFixpoint(edges, "a", "b", sources, "id", rounds = 2)
      .collect()(0)
    assert(open.getLong(1) == 4L && open.getLong(2) == 1L && !open.getBoolean(3),
      s"round-2 probe must still find node 5: $open")
    val closed = GraphOps.bfsFixpoint(edges, "a", "b", sources, "id", rounds = 3)
      .collect()(0)
    assert(closed.getLong(1) == 5L && closed.getLong(2) == 0L && closed.getBoolean(3),
      s"round-3 closure certificate: $closed")
  }
}
