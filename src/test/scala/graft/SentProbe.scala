package graft

/** "Is it me or the host": print the sentinel's warm base and three
  * probes. Compare against the recorded idle base (~0.57-0.59 s on
  * this box) before trusting any wall-clock measurement — sustained
  * external load shows up here before anywhere else.
  * Usage: `sbt "Test/runMain graft.SentProbe"`.
  */
object SentProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("sent-probe")
    val s = new Sentinel(spark)
    println(f"SENT_BASE ${s.base}%.3f")
    (0 until 3).foreach(_ => println(f"SENT ${s.probe()}%.3f"))
    spark.stop()
  }
}
