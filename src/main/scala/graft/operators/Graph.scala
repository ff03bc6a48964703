package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over edge DataFrames — the Pregel-lite shape:
  * each round is one hash join (ranks onto edges) plus one aggregation
  * (contributions by destination), both shuffling on the node id, so a
  * round costs two exchanges regardless of graph size and the whole
  * algorithm is `iters` chained rounds. Like
  * [[graft.functions.Dedup.connectedComponents]], every round ends in an
  * EAGER `localCheckpoint` — without it round k's logical plan embeds
  * round k-1's and the driver spends minutes analyzing an exponential
  * plan long before any task runs (the hard-won CC lesson).
  *
  * PageRank here is exact integer arithmetic in parts-per-million: ranks
  * are micro-units (1e6 = mass 1.0), contributions are `rank div deg`,
  * damping is `(850000 * s) div 1000000`. Long sums are order-invariant,
  * so the result is bit-identical across partitionings, retries, AND
  * engines — a DuckDB oracle can replay the same recurrence (gate entry
  * d19), which a floating-point PageRank can never guarantee (double
  * addition is not associative under Spark's nondeterministic merge
  * order). Numeric range: a node's incoming sum is bounded by its
  * neighborhood's rank mass, so 850000·s fits a long comfortably below
  * ~1e12 micro-units of neighborhood mass (≈1e6 nodes feeding one node);
  * shrink the unit for denser graphs.
  */
object Graph {

  /** Undirected PageRank on a pair list (damping 0.85, `iters` fixed
    * rounds, micro-unit longs). Output: (node, rank) for every node with
    * at least one edge. Self-pairs and duplicate pairs are tolerated
    * (deduped); isolated nodes don't appear (no edges → no mass flow). */
  def pageRank(pairs: DataFrame, idACol: String = "id_a",
               idBCol: String = "id_b", iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // pin the (often expensive) pair mining ONCE — the symmetric union
    // reads it twice, and deg/edges would otherwise re-run it again each
    val p = pairs.select(col(idACol).as("u"), col(idBCol).as("v"))
      .localCheckpoint(true)
    val edges = p.union(p.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
    // degree rides along with every edge once — joined here, checkpointed,
    // and reused by all rounds (the loop-invariant side of the iteration)
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, "u").localCheckpoint(true)
    var ranks = deg.select(col("u").as("node"), lit(1000000L).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      ranks = edgesDeg
        .join(ranks.withColumnRenamed("node", "u"), "u")
        .select(col("v"), expr("rank div deg").as("c"))
        .groupBy("v")
        .agg((lit(150000L) +
          expr("850000 * sum(c) div 1000000")).as("rank"))
        .select(col("v").as("node"), col("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Per-node TRIANGLE COUNTS on a pair list — the local-clustering /
    * community-density statistic over a near-dup graph (dense triangle
    * neighborhoods ≈ template families; a doc's triangle count is a
    * cheap "how boilerplate is this cluster" signal).
    *
    * Degree-ordered orientation (the classic MapReduce/GraphX bound):
    * every edge points from its (degree, id)-smaller endpoint to the
    * larger, so wedges are enumerated only at each edge pair's smallest
    * endpoint — Σ outdeg² with outdeg ≤ √(2m), never the Σ deg² a naive
    * wedge join pays on skewed graphs (a celebrity node of degree d
    * contributes d² wedges un-oriented, ~m oriented). One wedge
    * self-join + one closure semi-join, all equi-joins on node ids;
    * exact integer counts, engine/partitioning-invariant (oracle d30
    * replays the triple join in DuckDB). Self-pairs and duplicates are
    * tolerated (deduped); only nodes in ≥1 triangle appear. */
  def triangleCount(pairs: DataFrame, idACol: String = "id_a",
                    idBCol: String = "id_b"): DataFrame = {
    // pin the pair mining once (read by deg and the orientation);
    // canonicalize (min, max) BEFORE distinct — a reversed duplicate
    // would otherwise survive the dedup and double every wedge
    val e0 = pairs
      .select(least(col(idACol), col(idBCol)).cast("long").as("u"),
        greatest(col(idACol), col(idBCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    val deg = e0.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val wd = e0
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // oriented edge + the DESTINATION's order key (struct compare =
    // lexicographic (degree, id) — the same total order everywhere)
    val oriented = wd.select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, struct(col("dv").as("d"), col("v").as("n")))
          .otherwise(struct(col("du").as("d"), col("u").as("n"))).as("dk"))
      .localCheckpoint(true) // read thrice: both wedge sides + closure
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dk") < col("e2.dk"))
      .select(col("e1.src").as("apex"), col("e1.dst").as("x"),
        col("e2.dst").as("y"))
    // a wedge (x, y) closes iff the oriented edge x→y exists (x's key <
    // y's key by construction, so orientation matches)
    val tris = wedges.join(oriented.select(col("src").as("x"),
        col("dst").as("y")), Seq("x", "y"), "left_semi")
    tris.select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
