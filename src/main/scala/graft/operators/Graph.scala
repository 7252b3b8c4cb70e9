package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over candidate-pair edge lists.
  *
  * PageRank (Brin & Page, "The anatomy of a large-scale hypertextual web
  * search engine", WWW 1998) specialised to this engine's determinism
  * contract: every arithmetic step is LONG integer (quantized mass, floor
  * division), so ranks are bit-identical across engines and partitionings
  * — a second engine unrolling the same iterations hash-matches exactly
  * (the [[Search]] quantized-BM25 trick applied to an iterative op). The
  * damped share a node passes each neighbour is
  * `(rank·dampNum DIV dampDen) DIV degree`; the per-round teleport is
  * `(quantum·(dampDen−dampNum)) DIV (dampDen·N)`. Floor losses shave a
  * few units of mass per round — deterministic, identical in any engine,
  * and irrelevant to the ORDER the ranks induce.
  *
  * Curation role: the canonical-copy selector. Within a near-dup cluster
  * the highest-centrality member is the best-connected version of the
  * content — the hub its copies degrade from — a better keep rule than
  * min-id when copies differ in quality (see `dedup_canonical`). The
  * reference has no graph surface; this is a SURVEY §8 scale extension.
  *
  * Scale shape: one symmetrized edge checkpoint reused every round; per
  * round one edges⋈ranks join (both sides shuffled by node id — a
  * partitioning Catalyst reuses round to round) + one map-side-combinable
  * integer sum; the new rank frame is localCheckpoint()ed and the
  * previous round's blocks released — the [[Dedup.connectedComponents]]
  * loop discipline. Round count is FIXED (`iterations`), not
  * data-dependent, so the job graph is known at submit time. The node
  * set is the edge-incident subgraph only: at corpus scale the candidate
  * graph is a vanishing fraction of the corpus (the same observation
  * that keeps connectedComponents' rounds small), and isolated docs have
  * no meaningful centrality — callers left-join ranks back and default
  * the miss (`dedup_canonical` uses 0). */
object Graph {

  /** Symmetrized, deduplicated, hash-partitioned, checkpointed edge list
    * — the per-round join input every fixpoint op here probes (r16;
    * previously each op built this as `union` of two projections +
    * `distinct` + plain `localCheckpoint`, which (a) executed the
    * possibly-expensive upstream edge plan TWICE through the union and
    * (b) lost the partitioning at the checkpoint — under AQE
    * `localCheckpoint` reports UnknownPartitioning — so EVERY round
    * silently re-exchanged the full edge set, the Θ(E·rounds) term the
    * volume twins exposed on [[Dedup.connectedComponents]]).
    *
    * One explode pass symmetrizes (single execution of the edge plan);
    * the (src, dst) dedup pays its own exchange, then the `partKey`
    * repartition runs LAST so the physical layout the declared
    * checkpoint ([[org.apache.spark.sql.graftRdd.localCheckpointPartitioned]])
    * describes is exactly true — the declaring repartition must be the
    * final exchange (a dedup AFTER it would leave rows hash-placed by
    * (src, dst) under a declaration of `partKey`: a silent
    * wrong-co-partitioning hazard, caught in plan review before it
    * shipped). Callers pass the key their per-round join probes on
    * (src for pagerank/bfs/kcore, dst for LPA's vote join), and may
    * pass an explicit `numPartitions` when the edge count is known
    * (the [[graft.queries.DupEdges]] memo sizes it by
    * [[partitionsForRows]] — every per-round stage downstream runs at
    * the declared width, so a 264-edge dup graph iterates in 1-task
    * stages instead of 32; measured −30% per fixpoint query at
    * sf0.1). */
  private[graft] def symEdges(edges: DataFrame,
                              partKey: String = "src",
                              numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else edges.sparkSession.sessionState.conf.numShufflePartitions
    org.apache.spark.sql.graftRdd.localCheckpointPartitioned(
      edges.filter(col("id_a") =!= col("id_b"))
        .select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .dropDuplicates("src", "dst")
        .repartition(parts, col(partKey)),
      Seq(partKey))
  }

  /** Partition count for a declared edge checkpoint when the row count
    * is KNOWN (measured, never Catalyst-estimated — the j17 lesson):
    * one partition per ~250k narrow (long, long) rows ≈ 4–6 MB, capped
    * at `spark.sql.shuffle.partitions` — the suite's 100× sizing rule
    * ("partitions ≥ exchange bytes / per-task capacity") applied
    * DOWNWARD: a tiny graph's fixpoint rounds should not pay 32-task
    * stage scheduling to move 10 KB. At real scale the cap binds and
    * the conf (raised for the cluster) governs, exactly as before. */
  private[graft] def partitionsForRows(spark: org.apache.spark.sql.SparkSession,
                                       rows: Long): Int =
    math.min(spark.sessionState.conf.numShufflePartitions.toLong,
      math.max(1L, (rows + 249999L) / 250000L)).toInt

  /** Fixed-point mass scale: total graph mass starts at ~Quantum, so
    * with damping 85/100 a share times dampNum stays far under 2⁶³. */
  val Quantum: Long = 1000000000000L

  /** PageRank over an UNDIRECTED edge list `(id_a, id_b)` (long ids;
    * self-loops dropped, duplicate/reversed pairs collapse). Output one
    * row per edge-incident node: `(id, rank_score, degree)` — rank_score
    * is the quantized long mass (comparable, hashable; divide by
    * `quantum` for the conventional probability), degree the undirected
    * degree. Symmetrization means NO dangling nodes: every node has
    * outdeg ≥ 1, so no leaked-mass redistribution term is needed. */
  def pagerank(edges: DataFrame, iterations: Int = 5,
               dampNum: Long = 85, dampDen: Long = 100,
               quantum: Long = Quantum): DataFrame = {
    // one (src, dst) row per direction per distinct undirected edge —
    // the per-round join input, checkpointed once WITH its src
    // partitioning declared (every round's shares join probes it in
    // place). The compound result plan reads sym LAZILY, so this
    // convenience wrapper materializes the (V-sized) result before
    // releasing the sym blocks it hands out.
    val sym = symEdges(edges)
    try pagerankSym(sym, iterations, dampNum, dampDen, quantum)
      .localCheckpoint()
    finally Checkpoints.release(sym)
  }

  /** [[pagerank]] over a CALLER-OWNED symmetrized edge checkpoint — the
    * exact frame [[symEdges]] (partKey "src") returns, built once and
    * shared across the whole graph pack instead of rebuilt per query
    * (r17: the r16 eager declared checkpoints were scale-correct but
    * cost each consumer a fixed rebuild on tiny graphs — six queries ×
    * one symmetrize+exchange+materialize each; the
    * [[graft.queries.DupEdges]] sym memo now amortizes ONE build). The
    * caller keeps ownership: this op never releases `sym`. */
  def pagerankSym(sym: DataFrame, iterations: Int = 5,
                  dampNum: Long = 85, dampDen: Long = 100,
                  quantum: Long = Quantum): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen: $dampNum/$dampDen")
    locally {
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .select(col("src").as("id"), col("outdeg"))
      // N enters the plan as a broadcast 1-row aggregate, not a driver
      // collect — teleport and the uniform start divide by it in-plan
      val n = broadcast(deg.agg(count(lit(1)).as("n")))
      // (id, outdeg, n) — the per-round skeleton every rank frame joins
      // back to; checkpointed because the COMPOUND plan below references
      // it twice per round (shares + next) — without the cut the deg
      // groupBy subtree would double per round (the kcore branching
      // hazard); ranks reference linearly, so THEY need no cut
      val base = deg.crossJoin(n).localCheckpoint()
      // COMPOUND rounds (r17): `iterations` is FIXED AND SMALL (5), so
      // the per-round eager localCheckpoint of the r16 form bought
      // nothing — the checkpoint-per-round discipline exists for
      // DATA-DEPENDENT round counts (connectedComponents, bpeTrain),
      // where unbounded lineage must be cut; here it cost one eager
      // job + one driver barrier PER ROUND on frames of a few hundred
      // rows (~0.2 s each at sf0.1 — most of the r16 graph-family
      // steady regression). Each round references the previous ranks
      // frame exactly ONCE, so the compound plan grows LINEARLY
      // (3·iterations joins) and executes as one pipelined job whose
      // per-round exchanges AQE sizes; sym stays a declared-partitioned
      // checkpoint leaf probed in place every round.
      var ranks = base
        .select(col("id"), expr(s"$quantum DIV n").as("rank"))
      var iter = 0
      while (iter < iterations) {
        val shares = ranks.join(base, "id")
          .select(col("id").as("src"),
            expr(s"(rank * $dampNum DIV $dampDen) DIV outdeg").as("share"))
        val inbound = sym.join(shares, "src")
          .groupBy(col("dst")).agg(sum(col("share")).as("acc"))
          .select(col("dst").as("id"), col("acc"))
        ranks = base.join(inbound, Seq("id"), "left")
          .select(col("id"),
            (expr(s"($quantum * ${dampDen - dampNum}) DIV ($dampDen * n)") +
              coalesce(col("acc"), lit(0L))).as("rank"))
        iter += 1
      }
      ranks.join(base, "id")
        .select(col("id"), col("rank").as("rank_score"),
          col("outdeg").as("degree"))
    }
  }

  /** Deterministic label-propagation communities (Raghavan et al. 2007,
    * made RNG-free): each round every node adopts the most frequent
    * label among its neighbors PLUS ITSELF, ties broken by the smallest
    * label — the self-vote is what makes the synchronous sweep
    * deterministic AND convergent (pure neighbor voting oscillates on
    * any symmetric pair; random update orders are banned by the
    * determinism contract). Unlike connected components, a bridge edge
    * does NOT merge two dense groups: the bridge's one vote loses to
    * each side's internal majority (the barbell fixture in `GraphSpec`
    * pins exactly this — LPA splits what CC necessarily unions), which
    * is the community question near-dup curation actually asks when
    * boilerplate links otherwise-unrelated clusters.
    *
    * Per round: one join of the symmetric edge list against the label
    * frame, a (node, label) count, and the single-shuffle max(struct)
    * argmax by (cnt, −label) — never a per-node window over data rows;
    * labels checkpoint per round and release the previous round's
    * blocks ([[pagerank]]'s lifecycle). Fixed `rounds` keeps the oracle
    * expressible as unrolled CTEs. Output: (id, community) over
    * edge-incident nodes. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val votes = lpaVotes(edges)
    // the compound result plan reads votes LAZILY — materialize the
    // (V-sized) result before releasing the blocks
    try labelPropagationVotes(votes, rounds).localCheckpoint()
    finally Checkpoints.release(votes)
  }

  /** The per-round LPA join input: symmetrized edges ∪ one self-loop per
    * node (the deterministic self-vote), keyed and declared-checkpointed
    * by dst — the endpoint whose label each round looks up. ONE eager
    * build (r17; previously LPA built an intermediate dst-keyed
    * [[symEdges]] checkpoint AND this votes checkpoint — two eager
    * materializations per query). The edge plan executes twice inside
    * this single job (the sym branch and the node-distinct branch);
    * callers with an expensive un-checkpointed edge derivation should
    * checkpoint it first — the graded consumer reads the memoized
    * [[graft.queries.DupEdges]] edge list, where the double read is two
    * scans of local checkpoint blocks. */
  private[graft] def lpaVotes(edges: DataFrame,
                              numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else edges.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges.filter(col("id_a") =!= col("id_b"))
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .dropDuplicates("src", "dst")
    val nodes = sym.select(col("src").as("id")).distinct()
    org.apache.spark.sql.graftRdd.localCheckpointPartitioned(
      sym
        .unionByName(nodes.select(col("id").as("src"), col("id").as("dst")))
        .repartition(parts, col("dst")),
      Seq("dst"))
  }

  /** [[labelPropagation]] over a CALLER-OWNED votes checkpoint — the
    * exact frame [[lpaVotes]] returns, built once per (session, dir) by
    * the [[graft.queries.DupEdges]] memo for the graded consumer. The
    * node set reads back out of the votes frame as its self-loop rows
    * (every node carries exactly one, src = dst, by construction) — a
    * narrow filter over the checkpoint blocks, no exchange. Never
    * releases `votes`. */
  def labelPropagationVotes(votes: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val nodes = votes.filter(col("src") === col("dst"))
      .select(col("src").as("id"))
    // COMPOUND rounds ([[pagerankSym]]'s r17 rationale): `rounds` is
    // fixed and small (3 for the graded query), each round references
    // the previous label frame exactly once, so the plan grows linearly
    // and runs as ONE pipelined job probing the declared-dst votes
    // checkpoint in place — no per-round eager barrier.
    var labels = nodes.select(col("id"), col("id").as("lbl"))
    var k = 0
    while (k < rounds) {
      labels = votes
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("src").as("id"), (-col("m.nl")).as("lbl"))
      k += 1
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Multi-source BFS hop distances over an UNDIRECTED edge list — the
    * reachability read the centrality ops cannot answer: given a SEED set
    * (a quarantined source, a takedown list, a benchmark-contaminated
    * cohort), which nodes sit within `maxHops` near-dup hops, and how
    * close? Curation role: the blast radius of contamination — transitive
    * near-duplication carries leaked benchmark text outward hop by hop,
    * and "drop everything within 2 hops of the flagged set" is the
    * conservative decontamination rule (Lee et al. 2022 observe exact-dup
    * chains propagate memorized spans).
    *
    * Frontier iteration, not Floyd/closure: round k joins the CURRENT
    * frontier (nodes first reached at k−1) against the symmetric edge
    * list, anti-joins the visited set, and tags survivors with hop k —
    * each round is one equi-join + one distinct + one anti-join, all
    * shuffled by node id (a partitioning Catalyst reuses round to
    * round). The frontier frame — not the visited set — drives the join,
    * so per-round cost tracks the EXPANDING RIM, not the accumulated
    * interior. Fixed `maxHops` keeps the job graph static and the oracle
    * expressible as unrolled CTEs; an exhausted frontier short-circuits
    * (pure optimization — later rounds would add nothing). Frames
    * checkpoint per round with the [[pagerank]] release discipline.
    *
    * Output: `(id, hops)` — seeds at 0 (including seeds with no edges:
    * the quarantine itself is part of the radius), every node first
    * reached at hop k ≤ maxHops at k. Unreached nodes are absent. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val sym = symEdges(edges)
    try bfsHopsSym(sym, seeds, maxHops)
    finally Checkpoints.release(sym)
  }

  /** [[bfsHops]] over a CALLER-OWNED symmetrized edge checkpoint
    * ([[symEdges]] partKey "src", shared via the
    * [[graft.queries.DupEdges]] memo). Never releases `sym`. */
  def bfsHopsSym(sym: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    locally {
      var dist = seeds.select(col("id"), lit(0L).as("hops"))
        .distinct().localCheckpoint()
      // the frontier starts as the dist checkpoint itself (hop-0 rows);
      // from round 2 on it is the previous round's `fresh` checkpoint —
      // tracked separately from dist so each can be released exactly once
      var frontier = dist
      var k = 1
      var exhausted = false
      while (k <= maxHops && !exhausted) {
        val reached = sym
          .join(frontier.select(col("id").as("src")), "src")
          .select(col("dst").as("id")).distinct()
        val fresh = reached.join(dist, Seq("id"), "left_anti")
          .select(col("id"), lit(k.toLong).as("hops"))
          .localCheckpoint()
        if (fresh.isEmpty) {
          exhausted = true // fixpoint: every later frontier is empty too
          Checkpoints.release(fresh)
        } else {
          val next = dist.union(fresh).localCheckpoint()
          // next is materialized: the old visited set and the old
          // frontier (distinct frames from round 2 on) are both consumed
          if (!(frontier eq dist)) Checkpoints.release(frontier)
          Checkpoints.release(dist)
          dist = next
          frontier = fresh
        }
        k += 1
      }
      if (!(frontier eq dist)) Checkpoints.release(frontier)
      dist
    }
  }

  /** Bounded k-core peeling over an UNDIRECTED edge list (Seidman 1983;
    * distributed peeling round shape per Montresor et al. 2013): `rounds`
    * synchronous sweeps, each deleting every node whose degree in the
    * CURRENT surviving subgraph is < k. The k-core separates DENSE mutual
    * near-duplication (template farms, mirror rings — every member ≥ k
    * dup partners even after its weakest neighbours leave) from incidental
    * pairwise overlap, a strictly stronger signal than degree (a star hub
    * has high degree but peels the moment its leaves do) and than
    * triangles (a 4-cycle has zero triangles but survives 2-core).
    * Curation role: the surviving subgraph is where one-survivor-per-
    * cluster policies pay; the peeled fringe needs no aggressive rule.
    *
    * Round shape: restrict the symmetric edge list to surviving endpoints
    * (two semi-joins on node id), one map-side-combinable degree count,
    * one filter — no windows, no cartesians. The edge restriction
    * SHRINKS monotonically, so per-round cost tracks the surviving
    * subgraph. Fixed `rounds` (not run-to-fixpoint) keeps the job graph
    * static and the oracle expressible as unrolled CTEs — stated
    * semantics: the result is the round-`rounds` survivor set, which
    * equals the true k-core whenever peeling has converged by then (each
    * round removes at least one node until fixpoint, and real dup graphs
    * converge in a handful of rounds; a chain of length L needs ⌈L/2⌉).
    *
    * Output: `(id, core_deg)` — survivors with their degree as of the
    * final peel (their degree among round-(rounds−1) survivors). */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // src-keyed: the first (src) semi-join probes sym in place each
    // round; the dst semi then exchanges the already-src-FILTERED frame,
    // which shrinks monotonically with the surviving subgraph
    val sym = symEdges(edges)
    try kcoreSym(sym, k, rounds)
    finally Checkpoints.release(sym)
  }

  /** [[kcore]] over a CALLER-OWNED symmetrized edge checkpoint
    * ([[symEdges]] partKey "src", shared via the
    * [[graft.queries.DupEdges]] memo). Never releases `sym`. */
  def kcoreSym(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    locally {
      // each round's checkpoint doubles as the survivor set (its `id`
      // column) and the candidate output (its `core_deg` column); the
      // previous round's blocks release once the new one is materialized
      var surv = sym.select(col("src").as("id"), lit(0L).as("core_deg"))
        .distinct().localCheckpoint()
      var r = 0
      while (r < rounds) {
        val deg = sym
          .join(surv.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(surv.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
          .filter(col("core_deg") >= k)
          .select(col("src").as("id"), col("core_deg"))
          .localCheckpoint()
        Checkpoints.release(surv)
        surv = deg
        r += 1
      }
      surv
    }
  }

  /** Triangle count + local clustering coefficient over an UNDIRECTED edge
    * list, by degree orientation (Schank & Wagner, WEA 2005; distributed
    * formulation Suri & Vassilvitskii, "Counting triangles and the curse
    * of the last reducer", WWW 2011). Each edge is oriented from its
    * lower-(degree, id) endpoint to the higher; every triangle then
    * materializes EXACTLY once — as the wedge at its lowest-rank vertex,
    * closed by an oriented edge between the two higher-rank ones. After
    * orientation out-degree is O(√m) on ANY graph, so the wedge join is
    * bounded by Σ outdeg² ≤ O(m^1.5) — a boilerplate hub of degree 100k
    * cannot go quadratic (the LCC denominator still reports its true
    * degree). Two self-joins on a checkpointed oriented-edge table — no
    * iteration, no windows, all integer arithmetic.
    *
    * Output per edge-incident node: (id, degree, triangles, lcc_ppm) with
    * lcc_ppm = 2·T·10⁶ DIV (deg·(deg−1)) (floor ppm; 0 when deg < 2).
    * Curation role: LCC separates boilerplate hubs (star centers, LCC→0)
    * from mutually-near-duplicate cliques (LCC→10⁶) — the two need
    * different keep rules (`dedup_canonical` keeps hubs; a clique wants
    * one survivor). */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct()
      .localCheckpoint() // degree agg + orientation both read this
    try {
      val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val withDeg = e
        .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      val fwd = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv"))
        .localCheckpoint() // read twice: wedge generation + closure probe
      try {
        val rankLt = col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))
        val wedges = oriented.as("e1").join(oriented.as("e2"),
            col("e1.u") === col("e2.u") && rankLt)
          .select(col("e1.u").as("u"), col("e1.v").as("x"),
            col("e2.v").as("y"))
        val tri = wedges.as("w").join(oriented.as("e3"),
          col("e3.u") === col("w.x") && col("e3.v") === col("w.y"))
          .select(col("w.u").as("u"), col("w.x").as("x"), col("w.y").as("y"))
        val tcnt = tri
          .select(explode(array(col("u"), col("x"), col("y"))).as("id"))
          .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
        // materialize the small per-node result EAGERLY so the wide
        // intermediates (e, oriented) can be released in the finally
        // blocks below — same discipline as the pagerank loop; only the
        // per-node output's blocks outlive the call
        deg.join(tcnt, Seq("id"), "left")
          .select(col("id"), col("deg").as("degree"),
            coalesce(col("triangles"), lit(0L)).as("triangles"))
          .withColumn("lcc_ppm",
            when(col("degree") >= 2,
              expr("(triangles * 2 * 1000000) DIV (degree * (degree - 1))"))
              .otherwise(lit(0L)))
          .localCheckpoint()
      } finally {
        Checkpoints.release(oriented)
      }
    } finally {
      Checkpoints.release(e)
    }
  }

  /** Link prediction by COMMON-NEIGHBOR count (Liben-Nowell & Kleinberg,
    * "The Link Prediction Problem for Social Networks", CIKM 2003 — the
    * baseline score every fancier predictor is judged against): for every
    * NON-adjacent pair (a, b), the number of shared neighbors, global
    * top-`topK` by (count desc, a, b). On the dup-candidate graph this
    * reads as "dedup clusters about to merge" — two docs not yet linked
    * but sharing many near-dup neighbors are the next edge a
    * lower-threshold pass would add.
    *
    * Scale shape: the wedge join (sym ⋈ sym on the shared middle node)
    * costs Σ_v deg(v)² — the inherent price of enumerating length-2
    * paths, bounded by the max near-dup cluster size, not corpus size;
    * adjacency is removed with one anti-join against the undirected edge
    * set, and the global top-k is a TakeOrderedAndProject (never a
    * full-width window). Output: (a, b, common). */
  def commonNeighbors(edges: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    val e = edges.filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct()
      .localCheckpoint() // read three times: two wedge sides + anti-join
    try {
      val sym = e.select(col("a").as("s"), col("b").as("d"))
        .unionByName(e.select(col("b").as("s"), col("a").as("d")))
      val cand = sym.as("e1").join(sym.as("e2"),
          col("e1.d") === col("e2.s") && col("e1.s") < col("e2.d"))
        .select(col("e1.s").as("a"), col("e2.d").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
      cand.join(e, Seq("a", "b"), "left_anti")
        .orderBy(col("common").desc, col("a"), col("b"))
        .limit(topK)
        .localCheckpoint() // tiny result outlives e's release
    } finally {
      Checkpoints.release(e)
    }
  }

  /** Link prediction by RESOURCE ALLOCATION (Zhou, Lü & Zhang, "Predicting
    * missing links via local information", Eur. Phys. J. B 2009): the
    * degree-weighted refinement of [[commonNeighbors]] — each shared
    * neighbor z contributes 1/deg(z), so a hub shared with everyone is
    * discounted while a rare shared neighbor counts fully (the reason RA
    * beats raw counts on broad-degree graphs; Adamic–Adar's 1/log deg
    * needs libm and is banned by the oracle-parity rules — RA's
    * reciprocal is the deterministic sibling, quantized to
    * ⌊10⁶/deg(z)⌋ ppm by long floor division so both engines sum the
    * same integers in any order). Same wedge enumeration, same Σ deg(v)²
    * cost bound, same anti-join adjacency removal and bounded top-k as
    * the count form; the degree table joins once on the wedge CENTER.
    * Output: (a, b, ra_ppm, common), top-`topK` by (ra_ppm desc, a, b). */
  def resourceAllocation(edges: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    val e = edges.filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct()
      .localCheckpoint() // read three times: two wedge sides + anti-join
    try {
      val sym = e.select(col("a").as("s"), col("b").as("d"))
        .unionByName(e.select(col("b").as("s"), col("a").as("d")))
      val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("dz"))
        .withColumnRenamed("s", "z")
      val cand = sym.as("e1").join(sym.as("e2"),
          col("e1.d") === col("e2.s") && col("e1.s") < col("e2.d"))
        .select(col("e1.s").as("a"), col("e2.d").as("b"), col("e1.d").as("z"))
        .join(deg, "z")
        .groupBy(col("a"), col("b"))
        .agg(sum(expr("1000000 DIV dz")).as("ra_ppm"),
          count(lit(1)).as("common"))
      cand.join(e, Seq("a", "b"), "left_anti")
        .orderBy(col("ra_ppm").desc, col("a"), col("b"))
        .limit(topK)
        .localCheckpoint() // tiny result outlives e's release
    } finally {
      Checkpoints.release(e)
    }
  }
}
