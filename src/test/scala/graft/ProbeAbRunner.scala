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
    val dir = s"${GraftSession.scratchBase}/graft_probe${replicas}x"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")))
      BenchProbe.synthesize(spark, sfDir, replicas, s"probe${replicas}x",
        includeLineitem = true)
    println("AB_RESULT=" + BenchProbe.runAb(spark, replicas, passes))
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-probe-deep")
    println("DEEP_RESULT=" + BenchProbe.run(spark, sfDir, replicas,
      passes = 1, only = only))
    spark.stop()
  }
}
