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
}
