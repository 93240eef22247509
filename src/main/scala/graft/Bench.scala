package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized via a noop-format
  * write so Catalyst cannot prune work the way a bare count() would.
  *
  * Each query runs once untimed (warmup) and then `Passes` timed passes;
  * the reported per-query number is the MEDIAN, so a single transiently
  * noisy pass (CPU contention, page-cache cold start) cannot masquerade
  * as a regression. Min/max per query ride along in "dispersion" for
  * run-to-run variance inspection.
  */
object Bench {
  private val Passes = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val targets = SparkEntry.headline
    // full warmup pass: every headline query runs once untimed, so the
    // timed passes measure steady-state operator throughput (what scales
    // to a long-lived cluster job), not one-time JVM/codegen/plan costs
    targets.foreach(q => run(q.build))
    val reran = scala.collection.mutable.ListBuffer.empty[String]
    val results = targets.map { q =>
      var times = Seq.fill(Passes)(run(q.build))
      // dispersion gate (round-5 ask #6): >3x max/min spread on a query
      // means a pass was machine-contended, and a contaminated median
      // reads as a phantom regression round-over-round. Take more
      // passes; median+min over the larger sample absorb the outliers.
      if (times.forall(_ >= 0) && times.max / times.min.max(0.001) > 3.0) {
        reran += q.name
        times = times ++ Seq.fill(Passes)(run(q.build))
      }
      if (times.exists(_ < 0)) q.name -> (-1.0, -1.0, -1.0)
      else {
        val s = times.sorted
        q.name -> (s(s.length / 2), s.head, s.last)
      }
    }

    val qs = results
      .map { case (k, (med, _, _)) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val disp = results
      .map { case (k, (_, mn, mx)) =>
        "\"" + k + "\":" + f"""{"min":$mn%.3f,"max":$mx%.3f}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // min_total: sum of per-query minima — the contention-robust number
    // for ROUND-OVER-ROUND comparison (this sandbox shows up to 17x
    // write-path dispersion even when idle; the min of 3 passes is the
    // best available estimate of uncontended cost)
    val minTotal = results.map(_._2._2).filter(_ >= 0).sum
    val reranJson = reran.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Scale probe + feature A/B (round-6 verdict asks #1/#8): ~10x
    // fixtures for the five heaviest families, ratio per family, plus
    // the measured MV-rewrite / manifest-skip wins. Opt out with
    // SPARK_GRAFT_PROBE=0 (the probe adds minutes of wall-clock by
    // design — it runs the heavy families at 10x the bench scale).
    val probeOn = sys.env.getOrElse("SPARK_GRAFT_PROBE", "1") != "0"
    val probeJson =
      if (!probeOn) ""
      else {
        val replicas = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPLICAS", "10").toInt
        val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
        val probe = try BenchProbe.run(spark, sfDir, replicas, passes)
          catch { case e: Throwable =>
            System.err.println(s"[bench] scale probe failed: ${e.getMessage}")
            "null"
          }
        val ab = try BenchProbe.runAb(spark, replicas, passes)
          catch { case e: Throwable =>
            System.err.println(s"[bench] ab probe failed: ${e.getMessage}")
            "null"
          }
        s""","scale_probe":$probe,"ab":$ab"""
      }

    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","min_total":$minTotal%.3f,"queries":$qs,"dispersion":$disp,"passes":$Passes,"reran_on_dispersion":$reranJson$probeJson,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for log-scraping harnesses: the same line as a file
    // (sbt/log4j prefixes have broken JSON extraction from captured logs).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line + "\n")
    spark.stop()
  }
}
