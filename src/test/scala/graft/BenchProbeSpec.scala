package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale probe's ratios are only meaningful if the synthesized N×
  * fixture scales the WORK by N — these pin the fixture invariants the
  * ratios rest on: row counts scale, keys stay unique, and document
  * replicas carry disjoint vocabularies (naive copies would square the
  * near-dup candidate count and the probe would measure the data's
  * pathology, not the engine's scaling).
  */
class BenchProbeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val dir = BenchProbe.synthesize(spark, sf001, 3, "probe_spec3x")

  test("replicated tables scale rows and keep keys unique") {
    val base = spark.read.parquet(s"$sf001/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.count() == 3 * base.count())
    assert(docs.select($"doc_id").distinct().count() == docs.count())
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    assert(cust.count() ==
      3 * spark.read.parquet(s"$sf001/customer.parquet").count())
    assert(cust.select($"c_custkey").distinct().count() == cust.count())
    // destinations stay fixed: pair count scales by replicas, not replicas²
    assert(spark.read.parquet(s"$dir/supplier.parquet").count() ==
      spark.read.parquet(s"$sf001/supplier.parquet").count())
  }

  test("document replicas have disjoint vocabularies; shard 0 is the base corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("shard", (col("doc_id") / 10000000L).cast("long"))
    val toks = docs
      .select($"shard", explode(split($"text", "\\s+")).as("w"))
      .filter(length($"w") > 0)
    // a token appearing in two shards would let near-dup candidates
    // cross shards and superlinearize the probe by construction
    val crossShard = toks.groupBy($"w")
      .agg(countDistinct($"shard").as("ns"))
      .filter($"ns" > 1)
      .count()
    assert(crossShard == 0, s"$crossShard tokens shared across shards")
    // shard 0 is byte-identical to the base: the 1x and Nx runs share
    // their first shard's exact duplicate structure
    val base = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    val shard0 = docs.filter($"shard" === 0).select($"doc_id", $"text")
    assert(shard0.exceptAll(base).count() == 0)
    assert(base.exceptAll(shard0).count() == 0)
    // per-shard token-count distribution matches the base (statistics
    // preserved): same number of tokens in every shard
    val perShard = toks.groupBy($"shard").count().select($"count")
      .as[Long].collect().toSet
    assert(perShard.size == 1, s"shards differ in token mass: $perShard")
  }
}
