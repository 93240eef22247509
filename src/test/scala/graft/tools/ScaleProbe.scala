package graft.tools

import graft.GraftSession
import graft.routing._

/** Scale-headroom probe: 100M OD pairs through the matrix operator
  * (~7x the sf0.1 bench) — measures throughput holding, not correctness.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scale-probe")
    import spark.implicits._
    val nO = args.headOption.map(_.toInt).getOrElse(50000)
    val nD = args.lift(1).map(_.toInt).getOrElse(2000)
    val os = spark.range(nO).map(i =>
      RoutePoint(f"$i%09d", 120.0 + (i % 97) * 0.25, 28.0 + (i % 89) * 0.25))
    val ds = spark.range(nD).map(i =>
      RoutePoint(f"${i + 500000}%09d", 120.5 + (i % 83) * 0.25, 28.5 + (i % 79) * 0.25))
    val router = new SyntheticRouter(30.0,
      originIsland = p => p.id.toLong % 37 == 0,
      destIsland = p => (p.id.toLong - 500000) % 41 == 0)
    val t0 = System.nanoTime()
    val out = TravelTimeMatrix.run(spark, os, ds, router,
      oSplit = 2048, dSplit = 512, maxDepth = 14)
    out.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[scale-probe] ${nO.toLong * nD} pairs in $dt%.1f s = ${nO.toLong * nD / dt / 1e6}%.1f M pairs/s")
    spark.stop()
  }
}
