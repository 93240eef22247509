package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** r12 verdict ask #4: separate "pair output grows super-linearly by
  * construction" from "a hot band-bucket explodes" in the minhash 10×
  * scale probe (minhash_dedup t10/t1 measured 13.98 in the r12 driver
  * window, 3.76 in the r13 baseline).
  *
  * For each replica factor m: the band-bucket size distribution of
  * [[Dedup.minhashSignatures]] (the LSH self-join's join-key histogram —
  * a bucket of k docs contributes k·(k−1)/2 candidate rows), the implied
  * candidate volume, the verified pair count, and the pinLarge gate's
  * inputs (does the 10× corpus cross the broadcast threshold and FLIP
  * the join regime between the probe's two arms?).
  *
  * `runMain graft.tools.BandSkewProbe [sfDir] [multipliers...]`
  */
object BandSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ms = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 10)
    val spark = GraftSession.local("graft-band-skew")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // the BenchProbe replica construction, verbatim: disjoint
    // vocabularies per replica (every token suffixed), remapped ids
    def corpus(m: Int) = (0 until m).map { i =>
      val t =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1~$i")
      docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        t.as("text"))
    }.reduce(_ unionByName _)

    ms.foreach { m =>
      val c = corpus(m)
      val chars = c.agg(coalesce(sum(length(col("text"))), lit(0L))).head().getLong(0)
      val estShingleBytes = chars * (3 + 6L) // minhashPairs' mpG estimate, n=3
      val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
      println(f"[band-skew] m=$m chars=$chars shingleEst=$estShingleBytes " +
        f"bcastThr=$thr mergePinned=${estShingleBytes > thr / 4}")
      val sizes = Dedup.minhashSignatures(c)
        .groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("k"))
      val stats = sizes.agg(
        count(lit(1)).as("n_buckets"),
        max(col("k")).as("k_max"),
        expr("percentile_approx(k, 0.99)").as("k_p99"),
        expr("percentile_approx(k, 0.5)").as("k_med"),
        sum(expr("k * (k - 1) / 2")).as("cand_rows")).head()
      println(s"[band-skew] m=$m buckets=${stats.getLong(0)} " +
        s"k_max=${stats.getLong(1)} k_p99=${stats.get(2)} k_med=${stats.get(3)} " +
        s"candidate_rows=${stats.get(4)}")
      val topBuckets = sizes.orderBy(col("k").desc).limit(5).collect()
        .map(r => s"${r.getLong(2)}").mkString(",")
      println(s"[band-skew] m=$m top5_bucket_sizes=$topBuckets")
      val pairs = Dedup.minhashPairs(c).count()
      println(s"[band-skew] m=$m verified_pairs=$pairs")
    }
    spark.stop()
  }
}
