package graft.tools

import graft._

/** Diagnostic: print executed plans for named queries (args, or a
  * default set) at sf0.001 — the `.explain` review loop.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = SparkTestSession.sf0001
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q71_shipping_priority", "q80_disjunctive_rev",
        "q82_waiting_supplier", "q86_band_join")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
