package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scaling probe for the dedup operators: times span-dedup and
  * MinHash+verify over m× replicas of the documents fixture
  * (`runMain graft.tools.DedupProfile [sfDir] [multipliers...]`).
  * Replica texts get a distinct trailing token, so cross-replica
  * near-dup pairs do not form and the organic workload scales linearly —
  * flat docs/s across m is the horizontal-scaling evidence.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ms = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local("graft-dedup-profile")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nDocs = docs.count()

    def corpus(m: Int) = (0 until m)
      .map(i => docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" rep$i")).as("text")))
      .reduce(_ unionByName _)

    def time(label: String, df: org.apache.spark.sql.DataFrame, m: Int): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[dedup-profile] $label m=$m docs=${nDocs * m} time=$sec%.2f s rate=${nDocs * m / sec}%.0f docs/s")
    }

    ms.foreach { m =>
      val c = corpus(m)
      time("spans_k8", Dedup.duplicatedSpans(c, 8), m)
      time("minhash", Dedup.minhashPairs(c), m)
    }
    spark.stop()
  }
}
