package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan evidence dumper: `runMain graft.PlanDump <outDir> <suffix> [q...]`
  * writes `<outDir>/<query>_<suffix>.txt` with the `.explain("formatted")`
  * output of each named headline query (default: every headline query).
  *
  * NOT always execution-free: builders with eager pins (bm25TopK's dl,
  * exactQuantiles' stats/targets, prefixSum's parts, the incremental-
  * dedup pins) run their pin jobs at BUILD time, and q36-family
  * builders execute their publish write as a build side effect — so a
  * plan dump can run real corpus-scale Spark jobs and contend a
  * measurement window. Run it outside bench windows.
  *
  * Write-side evidence: `-Dgraft.write.plan.dir=<dir>` (or env
  * `GRAFT_WRITE_PLAN_DIR`, which survives sbt's forked run) additionally
  * makes every [[graft.sources.TableIO.writePartitioned]] reached during
  * a build dump its write-stage plan (the rebalance exchange the
  * read-back plan cannot show) into that directory.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = GraftSession.local("graft-plandump")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.headline.map(_.name)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
