package graft.routing

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The travel-time matrix operator — the computational heart of the
  * reference (SURVEY §2.9), re-expressed for Spark's execution model.
  *
  * Reference behavior being reproduced:
  *  - R4 tiling: origins × destinations cut into ≤ maxSplit blocks
  *    (/root/reference/data/src/utils/times.py:588-642);
  *  - R1 block routing: one backend `table` call per block, flattened to
  *    (origin_id, destination_id, duration) rows (times.py:389-483);
  *  - R2 degenerate 1×1 identical-pair short-circuit → duration 0
  *    (times.py:414-432);
  *  - R3 quadtree failure isolation: a failing block splits into 4
  *    quadrants recursively; at 1×1 or max depth the block's pairs are
  *    emitted with NULL duration (times.py:485-586) and become
  *    `missing_pairs` downstream.
  *
  * Spark design: instead of a thread pool on one node, the chunk grid is a
  * DataFrame of block descriptors (J8) that Spark schedules across
  * executors. Each block row carries its origin/destination point arrays
  * (bounded by maxSplit, so ≤ ~5000 points each — the reference's own
  * memory bound, data/params.yaml:43-47); routing + quadtree recursion run
  * task-locally inside flatMap with no shuffle. The Cartesian expansion
  * happens inside the operator, so no crossJoin of the full point sets
  * ever materializes.
  *
  * Scale notes (100 TB / 1000-executor thinking):
  *  - chunk indices come from a distributed zipWithIndex on the id-sorted
  *    points (O1 ordering, times.py:344) — no single-partition window;
  *  - block count = ceil(n/oSplit) × ceil(m/dSplit); repartitioned to the
  *    cluster's parallelism before routing so every core gets blocks;
  *  - per-task memory is O(oSplit + dSplit + oSplit×dSplit) — the same
  *    envelope the reference enforces per request.
  */
final case class IndexedPoint(cid: Long, idx: Long, pt: RoutePoint)
final case class PointChunk(cid: Long, pts: Seq[RoutePoint])

object TravelTimeMatrix {

  /** Deterministically index `points` by sorted id and group into chunks
    * of `size`, returning chunkId → points-in-id-order. zipWithIndex is
    * the distributed deterministic index (no single-partition window).
    */
  private def chunk(points: Dataset[RoutePoint], size: Int)(
      implicit spark: SparkSession): Dataset[PointChunk] = {
    import spark.implicits._
    val indexed = points
      .orderBy("id")
      .rdd
      .zipWithIndex()
      .map { case (p, i) => IndexedPoint(i / size, i, p) }
      .toDS()
    indexed
      .groupBy($"cid")
      .agg(sort_array(collect_list(struct($"idx".as("_1"), $"pt".as("_2")))).as("ipts"))
      .select($"cid", expr("transform(ipts, x -> x._2)").as("pts"))
      .as[PointChunk]
  }

  def run(
      spark: SparkSession,
      origins: Dataset[RoutePoint],
      dests: Dataset[RoutePoint],
      router: Router,
      oSplit: Int = 5000,
      dSplit: Int = 5000,
      maxDepth: Int = 5): Dataset[TimeRecord] = {
    import spark.implicits._
    implicit val s: SparkSession = spark

    val oChunks = chunk(origins, oSplit).select($"pts".as("opts"))
    val dChunks = chunk(dests, dSplit).select($"pts".as("dpts"))

    val parallelism = spark.sparkContext.defaultParallelism
    val blocks = oChunks
      .crossJoin(dChunks) // J8 chunk-grid product (utils/utils.py:96-101)
      .select($"opts".as("_1"), $"dpts".as("_2"))
      .as[(Seq[RoutePoint], Seq[RoutePoint])]
      .repartition(parallelism)

    blocks.flatMap { case (os, ds) =>
      routeBlock(router, os.toIndexedSeq, ds.toIndexedSeq, 0, maxDepth)
    }
  }

  /** R1/R2/R3: route one block, quadtree-splitting on failure.
    * Mirrors the reference's `_binary_search`
    * (/root/reference/data/src/utils/times.py:485-586): quadrants are the
    * half-splits of each axis; a 1×1 block that still fails — or any block
    * at max depth — yields NULL-duration rows for its full cross product.
    */
  private[graft] def routeBlock(
      router: Router,
      os: IndexedSeq[RoutePoint],
      ds: IndexedSeq[RoutePoint],
      depth: Int,
      maxDepth: Int): Iterator[TimeRecord] = {
    if (os.isEmpty || ds.isEmpty) Iterator.empty
    else if (os.length == 1 && ds.length == 1 && os.head.id == ds.head.id) {
      // R2: identical single origin/destination → zero duration
      // (times.py:414-432)
      Iterator.single(TimeRecord(os.head.id, ds.head.id, Some(0.0)))
    } else {
      try {
        val m = router.table(os, ds)
        // NaN cells = per-pair unroutable within an otherwise-successful
        // block (OSRM returns null durations — times.py:474-478); they
        // become missing_pairs without any quadtree recursion.
        for {
          i <- os.indices.iterator
          j <- ds.indices.iterator
        } yield TimeRecord(os(i).id, ds(j).id,
          if (java.lang.Double.isNaN(m(i)(j))) None else Some(m(i)(j)))
      } catch {
        case _: RoutingFailure =>
          if (depth >= maxDepth || (os.length == 1 && ds.length == 1)) {
            // emit the block's full cross product as missing
            // (create_empty_df semantics, times.py:551-560)
            for {
              o <- os.iterator
              d <- ds.iterator
            } yield TimeRecord(o.id, d.id, None)
          } else {
            val (o1, o2) = os.splitAt(os.length / 2)
            val (d1, d2) = ds.splitAt(ds.length / 2)
            routeBlock(router, o1, d1, depth + 1, maxDepth) ++
              routeBlock(router, o1, d2, depth + 1, maxDepth) ++
              routeBlock(router, o2, d1, depth + 1, maxDepth) ++
              routeBlock(router, o2, d2, depth + 1, maxDepth)
          }
      }
    }
  }
}
