package graft.jobs

/** CLI entry for the national pipeline — the `dvc repro` command line:
  *
  *   sbt "runMain graft.jobs.PipelineMain <fixtureDir> <root> [mode] [force...]"
  *
  * Runs every stage with content-addressed skip and prints RUN/SKIP per
  * stage; exits nonzero if any stage (or its invariants) fails. `mode`
  * is car (default), bicycle, or foot; extra args force-run the named
  * stages.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PipelineMain <fixtureDir> <root> [mode] [forceStage...]")
    val fixtureDir = args(0)
    val root = args(1)
    val mode = if (args.length >= 3) args(2) else "car"
    val force = args.drop(3).toSet
    val spark = graft.GraftSession.local(s"graft-pipeline-$mode")
    try {
      val stages = Pipeline.national(spark,
        Pipeline.NationalConfig(fixtureDir = fixtureDir, root = root, mode = mode))
      val results = Pipeline.repro(spark, s"$root/_stages", stages,
        force = force, log = println)
      println(results.map(r => s"${r.name}=${if (r.ran) "RUN" else "SKIP"}")
        .mkString("[pipeline] ", " ", ""))
    } finally spark.stop()
  }
}
