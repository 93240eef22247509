package graft.tools

import graft.operators.Dedup
import graft.{SparkTestSession, Tables}

/** Diagnostic: hamming distribution of planted near-dup pairs. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val docs = Tables.documents(spark, SparkTestSession.sf0001).cache()
    val planted = Dedup.ngramPairs(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val hams = planted.map { case (a, b) =>
      java.lang.Long.bitCount(Dedup.simhash64(texts(a)) ^ Dedup.simhash64(texts(b)))
    }.sorted
    println("planted pair hammings: " + hams.mkString(","))
    // band recall at various maxHamming via the actual operator
    Seq(3, 6, 10, 16).foreach { mh =>
      val found = Dedup.simhashPairs(docs, mh).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      val rec = planted.count(found.contains).toDouble / planted.length
      println(s"maxHamming=$mh pairs=${found.size} recall=$rec")
    }
    spark.stop()
  }
}
