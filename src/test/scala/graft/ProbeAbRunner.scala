package graft

/** Local iteration harness: run ONLY the feature A/B (and optionally the
  * scale probe) against already-synthesized probe fixtures, without the
  * 20-query headline bench. Test scope — the driver runs `graft.Bench`.
  *
  * Usage: `sbt "Test/runMain graft.ProbeAbRunner [replicas] [passes]"`
  * (fixtures are re-synthesized if missing).
  */
object ProbeAbRunner {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-probe-ab")
    // optional 3rd arg: comma-separated section subset (local iteration;
    // dependent sections are NOT auto-included). runAb builds-or-reuses
    // its own fixture (marker-checked), no manual synthesize needed.
    val only = args.lift(2).map(_.split(",").toSet).getOrElse(Set.empty[String])
    println("AB_RESULT=" + BenchProbe.runAb(spark, replicas, passes,
      only = only, sfDir = sfDir))
    spark.stop()
  }
}

/** Deep one-off scale probe: selected families at an arbitrary replica
  * factor (e.g. 100×), one pass. Usage:
  * `sbt "Test/runMain graft.ProbeDeep 100 minhash_dedup,duplicated_spans,prefix_jaccard"`
  */
object ProbeDeep {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(100)
    val only = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("minhash_dedup", "duplicated_spans", "prefix_jaccard"))
    val passes = args.lift(2).map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-probe-deep")
    println("DEEP_RESULT=" + BenchProbe.run(spark, sfDir, replicas,
      passes = passes, only = only))
    spark.stop()
  }
}

/** Time ONE SparkEntry query on a dir: pass 0 is warmup, all passes
  * printed. Local iteration only — the driver runs `graft.Bench`.
  * Usage: `sbt "Test/runMain graft.TimeOne q36_publish_roundtrip [dir] [passes]"`
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-time-one")
    val build = SparkEntry.queries(q)
    (0 to passes).foreach { i =>
      val t0 = System.nanoTime()
      build(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME $q pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
