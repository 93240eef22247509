package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as join/agg rounds over an edge DataFrame —
  * the Pregel shape expressed declaratively (each superstep = one
  * shuffle-join of ranks onto edges + one aggregation of messages by
  * destination), in the family of the pointer-jumping connected
  * components in [[Dedup.clusters]] and the distributed SSSP in
  * [[graft.routing.RoadNetwork]].
  *
  * Determinism design: ranks are FIXED-POINT LONGS (scale 1e9), every
  * per-edge contribution is an integer division, and the damping step is
  * `(mass * 85) div 100` — all integer ops, so message sums are
  * order-independent and the result is bit-identical across partition
  * counts, retries, AND engines (the oracle replays the rounds in SQL).
  * Floating-point PageRank cannot hash-verify: double sums depend on
  * aggregation order.
  */
object GraphOps {

  /** One unit of rank in fixed-point (1e9 = rank 1.0). */
  val Scale = 1000000000L

  /** Damped PageRank over directed edges (`src`, `dst`), `iters`
    * synchronous rounds from a uniform start of 1.0 per node. Damping is
    * the classic 0.85 (teleport base 0.15); dangling-node mass is
    * dropped (the standard "ignore dangling" variant — documented
    * semantics, consistent in the SQL replay). Parallel edges collapse;
    * self-loops participate normally.
    *
    * Scale shape: per round, ONE shuffle joining ranks to edges on src
    * (edges can be pre-partitioned by src once and reused — the join key
    * never changes) and one groupBy dst with map-side partial sums of
    * long messages. Lineage grows linearly in rounds; for production
    * round counts persist+checkpoint every few rounds (the round-count
    * here is small and bounded, same envelope as
    * [[Dedup.clusters]]' O(log diameter) pointer-jumping).
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"bad iteration count $iters")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select($"src", $"dst").distinct()
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "src")
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
    val base = (15L * Scale) / 100L // 0.15 in fixed-point
    var ranks = nodes.select($"node", lit(Scale).as("rank"))
    for (_ <- 1 to iters) {
      val mass = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select($"dst", expr("rank div outdeg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("inmass"))
      ranks = nodes.join(mass, nodes("node") === mass("dst"), "left")
        .select($"node",
          (lit(base) + expr("(coalesce(inmass, 0L) * 85) div 100")).as("rank"))
    }
    ranks
  }
}
