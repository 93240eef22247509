package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution — the classic Fellegi–Sunter
  * pipeline as composable Spark stages:
  *
  *   1. BLOCKING: records are compared only within a coarse key (the
  *      all-pairs kill switch — at 100 TB the candidate set is
  *      sum-of-squared-block-sizes, not n², so the block key must bound
  *      block cardinality; callers pick something stable under the
  *      expected noise, e.g. (region, suffix of the normalized name));
  *   2. PAIRWISE MATCH: an arbitrary predicate over the two candidate
  *      records (edit distance, numeric tolerance, rule scores);
  *   3. TRANSITIVE CLOSURE: matched pairs are edges; an entity is a
  *      connected component ([[Dedup.connectedComponents]] — the
  *      pointer-jumping label propagation, O(log diameter) rounds);
  *   4. SURVIVORSHIP: one golden record per entity (min-id canonical
  *      attributes + aggregated measures), built with `min_by`-style
  *      aggregates so it is deterministic.
  *
  * The reference has no linkage operator; this is the standard
  * training-data / master-data building block (same shape as Splink or
  * Dedupe.io, rebuilt on DataFrame ops).
  */
object EntityResolution {

  /** Candidate pairs after blocking: both sides aliased (`a`, `b`),
    * every record column available as `a.<col>` / `b.<col>`, ordered
    * `a.<recId> < b.<recId>` so each unordered pair appears once. The
    * self-join shuffles on the block key only — the quadratic step is
    * confined inside each block by construction.
    */
  def candidatePairs(records: DataFrame, recId: String,
      blockKey: Column): DataFrame = {
    val keyed = records.withColumn("_bk", blockKey)
    keyed.as("a").join(keyed.as("b"),
      col("a._bk") === col("b._bk") &&
        col(s"a.$recId") < col(s"b.$recId"))
  }

  /** Entity labels for every record: matched pairs collapse into
    * connected components (entity id = min record id of the component);
    * unmatched records are their own entity. Adds `entity_id`.
    */
  def entities(records: DataFrame, recId: String,
      matchedPairs: DataFrame): DataFrame = {
    val labels = Dedup
      .connectedComponents(matchedPairs, "id_a", "id_b")
      .withColumnRenamed("id", recId)
    records.join(labels, Seq(recId), "left")
      .withColumn("entity_id", coalesce(col("cluster"), col(recId)))
      .drop("cluster")
  }
}
