package graft

import graft.operators.TextAnalysis
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("argmax tie-break follows marker order") {
    val s = spark
    import s.implicits._
    val df = Seq("the data the data").toDF("text") // en score == es score
    val scores = TextAnalysis.langScores(col("text"))
    val pred = df.select(TextAnalysis.argmax(scores)).head.getString(0)
    assert(pred == "en") // first in fixed order wins ties
  }

  test("quality features are exact on a known doc") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df).head
    assert(r.getAs[Long]("n_chars") == 20)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_stopwords") == 2) // 'the', 'a'
    assert(r.getAs[Double]("avg_token_len") == 15.0 / 6)
    assert(r.getAs[String]("quality_bin") == "short")
  }

  test("token counts: whitespace and BPE-ish subtokens") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abcd abcde a")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head
    assert(r.getAs[Long]("n_ws_tokens") == 3)
    assert(r.getAs[Long]("n_subtokens") == 1 + 2 + 1) // ceil(4/4)+ceil(5/4)+ceil(1/4)
  }

  test("streaming complete-mode hourly counts equal the batch aggregation") {
    val batch = Tables.events(spark, sf0001)
      .groupBy((expr("ts div 3600000000000") * 3600).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val stream = StreamingOps.hourlyCounts(spark, sf0001, "spec_stream_hourly")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(stream == batch)
  }

  test("watermarked append-mode output is a subset of complete-mode output") {
    val complete = StreamingOps.hourlyCounts(spark, sf0001, "spec_stream_c")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val append = StreamingOps.hourlyCountsWatermarked(spark, sf0001, "spec_stream_wm")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(append.forall { case (k, v) => complete.get(k).contains(v) },
      s"append rows not in complete: ${append.keySet.diff(complete.keySet).take(5)}")
  }
}
