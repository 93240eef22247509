package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join without a nested loop — the bucketized range
  * join (the classic genomic/temporal-interval trick, same family as
  * Spark's own range-join hints and [[graft.plans.BandJoinRule]]'s
  * fixed-band rewrite, which this generalizes to per-row variable-length
  * intervals such as SCD2 validity ranges or event spans).
  *
  * Each interval explodes into the fixed-width buckets it touches
  * (`⌊start/w⌋ .. ⌊end/w⌋`), candidates come from an equi-join on the
  * bucket id, duplicates from multi-bucket overlaps collapse via
  * distinct on the id pair, and the exact overlap predicate
  * (`a.start ≤ b.end ∧ b.start ≤ a.end`, closed intervals) runs on
  * candidates only — output is exactly the brute-force pair set.
  *
  * Scale shape: shuffle carries (bucket, id, start, end) — fan-out is
  * `len/w + 1` per row, so pick `w` near the typical interval length
  * (fan-out ~2). A pathological interval spanning many buckets inflates
  * only its own fan-out (linear, bounded by range/w), never an
  * all-pairs product; a dominant hot bucket is ordinary join skew that
  * AQE's skew split already handles.
  */
object IntervalJoin {

  /** Overlap join of `a` and `b`, both shaped (id, start, end) with
    * inclusive long endpoints. Returns one row per overlapping pair:
    * ids, the intersection range, and its (closed-interval) length.
    */
  def overlap(a: DataFrame, b: DataFrame, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bad bucket width $bucketWidth")
    def bucketed(df: DataFrame, p: String) = df.select(
      col("id").as(s"${p}_id"), col("start").as(s"${p}_start"),
      col("end").as(s"${p}_end"),
      explode(sequence(
        floor(col("start") / bucketWidth).cast("long"),
        floor(col("end") / bucketWidth).cast("long"))).as("bk"))
    bucketed(a, "a").join(bucketed(b, "b"), Seq("bk"))
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_id"), col("b_id"), col("a_start"), col("a_end"),
        col("b_start"), col("b_end"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        greatest(col("a_start"), col("b_start")).as("ov_start"),
        least(col("a_end"), col("b_end")).as("ov_end"))
      .withColumn("ov_len", col("ov_end") - col("ov_start") + 1)
  }
}
