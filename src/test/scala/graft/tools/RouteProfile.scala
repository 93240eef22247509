package graft.tools

import graft._
import graft.routing._
import org.apache.spark.sql.SparkSession

/** Diagnostic: where does q30's time go at sf0.1? */
object RouteProfile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("route-profile")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val q30 = SparkEntry.queries("q30_route_matrix")
    time("warmup full q30 noop")(q30(spark, dir).write.format("noop").mode("overwrite").save())
    time("q30 noop")(q30(spark, dir).write.format("noop").mode("overwrite").save())
    time("q30 count only")(println(q30(spark, dir).count()))
    // pure routing compute without Spark: single-threaded reference
    val os = (0 until 15000).map(i => RoutePoint(f"$i%09d", 120.0 + (i % 97) * 0.25, 28.0 + (i % 89) * 0.25)).toIndexedSeq
    val ds = (0 until 1000).map(i => RoutePoint(f"${i + 500000}%09d", 120.5 + (i % 83) * 0.25, 28.5 + (i % 79) * 0.25)).toIndexedSeq
    val router = new SyntheticRouter(30.0, p => p.id.toLong % 37 == 0, p => (p.id.toLong - 500000) % 41 == 0)
    time("single-thread routeBlock (all blocks)") {
      var n = 0L
      os.grouped(512).foreach { ob =>
        ds.grouped(64).foreach { db =>
          n += TravelTimeMatrix.routeBlock(router, ob.toIndexedSeq, db.toIndexedSeq, 0, 12).size
        }
      }
      println(s"rows: $n")
    }
    spark.stop()
  }
}
