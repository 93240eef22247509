package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Table-level persistent CHECK constraints: stored once, enforced by
  * every row-adding write path, zero-trace rejection.
  */
class TxConstraintSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txcons_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  test("stored constraint gates commit, partitioned commit, and streaming sink") {
    val t = fresh("gate")
    TxLog.commit(spark, t, Seq((1L, "en", 5L)).toDF("id", "lang", "n"))
    TxLog.addConstraint(spark, t, "n_pos", "n > 0")
    // plain commit: violating batch rejected with zero trace
    val v0 = TxLog.latestVersion(spark, t)
    val dirs0 = fs.listStatus(new Path(s"$t/data")).length
    val e = intercept[IllegalArgumentException] {
      TxLog.commit(spark, t, Seq((2L, "en", -1L)).toDF("id", "lang", "n"),
        append = true)
    }
    assert(e.getMessage.contains("n_pos"))
    assert(TxLog.latestVersion(spark, t) == v0)
    assert(fs.listStatus(new Path(s"$t/data")).length == dirs0)
    // partitioned commit enforces too
    intercept[IllegalArgumentException] {
      TxLog.commitPartitioned(spark, t,
        Seq((3L, "de", 0L)).toDF("id", "lang", "n"), "lang", append = true)
    }
    // streaming sink enforces too
    intercept[IllegalArgumentException] {
      TxLog.commitStreaming(spark, t,
        Seq((4L, "fr", -9L)).toDF("id", "lang", "n"), "q1", 0L)
    }
    // conforming rows pass every path; NULL passes (SQL CHECK)
    TxLog.commit(spark, t,
      Seq((5L, "en", Some(2L)), (6L, "en", None)).toDF("id", "lang", "n"),
      append = true)
    assert(TxLog.read(spark, t).count() == 3L)
  }

  test("adding a constraint the current data violates is rejected") {
    val t = fresh("preval")
    TxLog.commit(spark, t, Seq((1L, -5L)).toDF("id", "n"))
    val e = intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, t, "n_pos", "n > 0")
    }
    assert(e.getMessage.contains("existing rows"))
    assert(TxLog.constraints(spark, t).isEmpty)
  }

  test("drop restores writability; duplicate add rejected; constraints listed") {
    val t = fresh("drop")
    TxLog.commit(spark, t, Seq((1L, 5L)).toDF("id", "n"))
    TxLog.addConstraint(spark, t, "n_pos", "n > 0")
    assert(TxLog.constraints(spark, t) == Map("n_pos" -> "n > 0"))
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, t, "n_pos", "n > 1")
    }
    TxLog.dropConstraint(spark, t, "n_pos")
    TxLog.commit(spark, t, Seq((2L, -1L)).toDF("id", "n"), append = true)
    assert(TxLog.read(spark, t).count() == 2L)
  }

  test("constraints work on an empty (pre-first-commit) table") {
    val t = fresh("empty")
    TxLog.addConstraint(spark, t, "id_pos", "id >= 0")
    intercept[IllegalArgumentException] {
      TxLog.commit(spark, t, Seq((-1L, "x")).toDF("id", "s"))
    }
    TxLog.commit(spark, t, Seq((1L, "x")).toDF("id", "s"))
    assert(TxLog.read(spark, t).count() == 1L)
  }
}
