package graft

/** Ad-hoc plan/timing probe: `runMain graft.PlanProbe <query> [sfDir]`
  * times one query to a noop sink and dumps its final AQE plan —
  * the .explain feedback loop for plan iteration at bench scale.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-probe")
    val build = SparkEntry.queries(name)
    build(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    // time build + action together, exactly like Bench.run — eager
    // pins inside a builder are part of the query's cost
    val t0 = System.nanoTime()
    val df = build(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
