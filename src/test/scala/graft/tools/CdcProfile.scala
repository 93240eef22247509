package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** Scaling probe for the CDC family: a FIXED-size change batch applied
  * to m× replicas of the documents fixture
  * (`runMain graft.tools.CdcProfile [sfDir] [multipliers...]`).
  *
  * The scale claim under test: merge cost is change-batch-bound, not
  * base-bound — the base side is touched by one broadcast anti-join
  * ([[Cdc.applyChanges]]) or touched-key point-lookups
  * ([[Cdc.incrementalAgg]]), so wall time should stay near-flat while
  * the base grows m×. A base-rescan implementation would scale
  * linearly in m instead.
  */
object CdcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ms = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local("graft-cdc-profile")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    def base(m: Int) = (0 until m)
      .map(i => docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
      .reduce(_ unionByName _)

    // fixed-size change batch regardless of m: touches replica 0 only
    def changes = docs.filter(col("doc_id") % 10 === 1)
      .select(col("doc_id"), upper(col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"),
        lit("U").as("op"), lit(1).as("seq"))

    def time(label: String, df: org.apache.spark.sql.DataFrame, m: Int): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cdc-profile] $label m=$m base=${nDocs * m} time=$sec%.2f s")
    }

    ms.foreach { m =>
      val b = base(m)
      time("applyChanges", Cdc.applyChanges(b, changes, "doc_id"), m)
      val view = b.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total"))
      time("incrementalAgg",
        Cdc.incrementalAgg(view, b, changes, "doc_id", "source", "n_chars"), m)
    }
    spark.stop()
  }
}
