package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class TxLogSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txlog_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String)].collect().sortBy(_._1).toSeq

  test("commit/read roundtrip; overwrite replaces; append accumulates") {
    val t = fresh("rt")
    assert(TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s")) == 1L)
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a")))
    assert(TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s")) == 2L)
    assert(rows(TxLog.read(spark, t)) == Seq((2L, "b"))) // overwrite semantics
    assert(TxLog.commit(spark, t, Seq((3L, "c")).toDF("id", "s"), append = true) == 3L)
    assert(rows(TxLog.read(spark, t)) == Seq((2L, "b"), (3L, "c")))
  }

  test("time travel: every historical snapshot stays readable and exact") {
    val t = fresh("tt")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((4L, "d")).toDF("id", "s"), append = true)
    assert(rows(TxLog.read(spark, t, Some(1L))) == Seq((1L, "a")))
    assert(rows(TxLog.read(spark, t, Some(2L))) == Seq((2L, "b")))
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((2L, "b"), (4L, "d")))
  }

  test("a lost commit race retries onto the winner's log (serialized versions)") {
    val t = fresh("race")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // simulate a racing winner: v2 appears between the loser's version
    // read and its create-exclusive
    fs.create(new Path(s"$t/_log/v2"), false).close()
    val v = TxLog.commit(spark, t, Seq((9L, "z")).toDF("id", "s"))
    assert(v == 3L, s"loser must land at v3, got v$v")
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((9L, "z")))
  }

  test("vacuum drops only directories no retained manifest references") {
    val t = fresh("vac")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((3L, "c")).toDF("id", "s"), append = true)
    val dataDirsBefore = fs.listStatus(new Path(s"$t/data")).length
    assert(dataDirsBefore == 3)
    TxLog.vacuum(spark, t, retainFrom = 2L)
    // v1's directory is referenced by no retained manifest -> gone;
    // v2/v3's two directories survive
    assert(fs.listStatus(new Path(s"$t/data")).length == 2)
    assert(rows(TxLog.read(spark, t, Some(2L))) == Seq((2L, "b")))
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((2L, "b"), (3L, "c")))
    intercept[Exception](TxLog.read(spark, t, Some(1L)).collect())
  }
}
