package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for web-crawl curation. Domain/page authority
  * is a standing quality signal in pretraining pipelines (crawl
  * frontier prioritization, per-domain quality weighting next to
  * [[TextAnalysis.capPerDomain]] and the robots/URL filters), and the
  * reference's catalog graph (dataset→item dependencies) asks the same
  * "who is pointed at by whom" question at small scale.
  *
  * PageRank here is the classic damped power iteration, Spark-shaped:
  * a FIXED number of iterations, each one distributed join + keyed
  * aggregation (shuffle keyed by destination — the same partitioning
  * every round, so AQE reuses the layout), with lineage truncated per
  * round via `localCheckpoint` so the plan never grows with the
  * iteration count — the same discipline as
  * [[Dedup.connectedComponents]]. Ranks and edges never visit the
  * driver; the only driver-side scalars are the node count and the
  * per-round dangling mass (one number each).
  */
object LinkGraph {

  /** Damped PageRank after exactly `iterations` rounds.
    *
    * Input `edges` is a directed edge list; duplicates are collapsed
    * (a page linking twice votes once — the convention crawl graphs
    * use). The node set is the union of sources, destinations, and
    * the optional `nodes` frame (isolated pages rank, they just
    * receive only the teleport share). Dangling nodes (no out-links)
    * spread their mass uniformly, so total rank stays 1 every round.
    *
    * rank_{t+1}(v) = (1−d)/N + d·( Σ_{(u,v)∈E} rank_t(u)/outdeg(u)
    *                               + dangling_t/N )
    *
    * Returns one row per node: (`idCol`, rank). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      nodes: DataFrame = null, idCol: String = "id"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst")).distinct()
    var all = e.select(col("_src").as("_id"))
      .unionByName(e.select(col("_dst").as("_id")))
    if (nodes != null)
      all = all.unionByName(nodes.select(col(nodes.columns.head)
        .cast("long").as("_id")))
    val nodeIds = all.distinct().localCheckpoint(true)
    val n = nodeIds.count()
    if (n == 0) return nodeIds.select(col("_id").as(idCol),
      lit(0.0).as("rank"))
    // out-degrees once; nodes absent here are dangling
    val deg = e.groupBy("_src").agg(count(lit(1)).as("_deg"))
      .localCheckpoint(true)
    // whether dangling nodes exist at all is decided ONCE — when the
    // graph has none (the common case after crawl preprocessing), no
    // per-round pass computes a mass that is identically zero
    val hasDangling = nodeIds.join(deg,
      nodeIds("_id") === deg("_src"), "left_anti").limit(1).count() > 0
    var ranks = nodeIds.withColumn("_rank", lit(1.0 / n))
    var it = 0
    while (it < iterations) {
      val withDeg = ranks.join(deg,
        ranks("_id") === deg("_src"), "left")
        .select(col("_id"), col("_rank"), col("_deg"))
      // dangling mass: one scalar to the driver per round
      val dangling =
        if (!hasDangling) 0.0
        else withDeg.filter(col("_deg").isNull)
          .agg(coalesce(sum(col("_rank")), lit(0.0))).head().getDouble(0)
      val contribs = e
        .join(withDeg.filter(col("_deg").isNotNull),
          e("_src") === withDeg("_id"))
        .select(col("_dst").as("_id"),
          (col("_rank") / col("_deg")).as("_c"))
        .groupBy("_id").agg(sum(col("_c")).as("_c"))
      ranks = nodeIds.join(contribs, Seq("_id"), "left")
        .select(col("_id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("_c"), lit(0.0)) + lit(dangling / n)))
            .as("_rank"))
        .localCheckpoint(true) // truncate lineage: flat plan per round
      it += 1
    }
    ranks.select(col("_id").as(idCol), col("_rank").as("rank"))
  }

  /** Synchronous LABEL PROPAGATION after exactly `iterations` rounds —
    * community detection over the UNDIRECTED form of the edge list
    * (mirror-dup steps 1-2): every node starts labeled with its own
    * id and each round adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label, keeping its current label
    * only when it has no neighbors. The node universe is the edge
    * endpoints plus the optional `nodes` frame (PageRank's
    * convention) — pass `nodes` to keep isolated documents in the
    * output with their own id as label. Fully deterministic (synchronous
    * update + min-tie-break — no randomized vertex order), so an
    * independent SQL engine replays the identical rounds; the known
    * trade is that bipartite structures can OSCILLATE under
    * synchronous updates (run an even/odd iteration pair when that
    * matters) — the price of reproducibility vs the classic
    * randomized-asynchronous formulation.
    *
    * Scale shape per round: one join keyed on the edge endpoint + one
    * (dst, label) count aggregate + one max_by — the PageRank
    * discipline (same keyed shuffles every round, `localCheckpoint`
    * truncating lineage so the plan never grows). Labels and edges
    * never visit the driver. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, idCol: String = "id",
      nodes: DataFrame = null): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val (und, nodeIds) = lpPrep(edges, srcCol, dstCol, nodes)
    val labels = lpRounds(und, nodeIds.withColumn("_lbl", col("_id")),
      iterations)
    labels.select(col("_id").as(idCol), col("_lbl").as("label"))
  }

  /** [[labelPropagation]] hardened against the synchronous-update
    * oscillation: bipartite structures (even cycles, two-tier
    * link graphs) can flip between two label states forever under
    * synchronous rounds, so a fixed iteration count reads whichever
    * phase it happened to stop in. This variant runs ONE extra round
    * and compares: `stable` = the two consecutive states agree, and
    * `label` = the smaller of the pair — a phase-independent, fully
    * deterministic resolution (both phases of a 2-cycle yield the same
    * min, so an oscillating even cycle resolves to one community
    * instead of a coin-flip on the iteration parity). Costs exactly
    * one additional round over [[labelPropagation]]; same per-round
    * scale shape. */
  def labelPropagationStable(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int = 3, idCol: String = "id",
      nodes: DataFrame = null): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val (und, nodeIds) = lpPrep(edges, srcCol, dstCol, nodes)
    val even = lpRounds(und, nodeIds.withColumn("_lbl", col("_id")),
      iterations)
    val odd = lpRounds(und, even, 1)
    even.join(odd.select(col("_id"), col("_lbl").as("_lbl2")), Seq("_id"))
      .select(col("_id").as(idCol),
        least(col("_lbl"), col("_lbl2")).as("label"),
        (col("_lbl") === col("_lbl2")).as("stable"))
  }

  /** Undirected mirrored edge set (self-loops dropped) + the node
    * universe — shared preamble of the LP variants. */
  private def lpPrep(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame): (DataFrame, DataFrame) = {
    val dir = edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst"))
    val und = dir.unionByName(dir.select(col("_dst").as("_src"),
      col("_src").as("_dst"))).distinct()
      .filter(col("_src") =!= col("_dst")).localCheckpoint(true)
    // the node universe: edge endpoints plus the optional `nodes`
    // frame (the PageRank convention) — an isolated node (no non-self
    // edges) keeps its own id as its label, it is not dropped
    var allNodes = und.select(col("_src").as("_id"))
    if (nodes != null)
      allNodes = allNodes.unionByName(nodes
        .select(col(nodes.columns.head).cast("long").as("_id")))
    (und, allNodes.distinct().localCheckpoint(true))
  }

  /** `rounds` synchronous vote rounds from `labels0` (columns `_id`,
    * `_lbl`); each round checkpoints to keep the plan flat. */
  private def lpRounds(und: DataFrame, labels0: DataFrame,
      rounds: Int): DataFrame = {
    var labels = labels0
    var it = 0
    while (it < rounds) {
      // neighbor labels: one equi-join on the edge source
      val votes = und.join(labels, und("_src") === labels("_id"))
        .groupBy(col("_dst").as("_id"), col("_lbl"))
        .agg(count(lit(1)).as("_n"))
      // most frequent label, ties to the smallest label value
      val winner = votes.groupBy("_id")
        .agg(min_by(col("_lbl"),
          struct((-col("_n")).as("a"), col("_lbl").as("b"))).as("_new"))
      labels = labels.join(winner, Seq("_id"), "left")
        .select(col("_id"), coalesce(col("_new"), col("_lbl")).as("_lbl"))
        .localCheckpoint(true)
      it += 1
    }
    labels
  }
}
