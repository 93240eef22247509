package graft

import graft.operators.Cdc
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def base = Seq(
    (1L, "one", 10), (2L, "two", 20), (3L, "three", 30), (4L, "four", 40))
    .toDF("id", "text", "v")

  test("applyChanges: insert, update, delete, passthrough") {
    val ch = Seq(
      (2L, "TWO", 21, "U", 1),   // update 2
      (3L, "x", 0, "D", 1),      // delete 3
      (9L, "nine", 90, "I", 1))  // insert 9
      .toDF("id", "text", "v", "op", "seq")
    val got = Cdc.applyChanges(base, ch, "id")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "one", 10), (2L, "TWO", 21), (4L, "four", 40), (9L, "nine", 90)))
  }

  test("applyChanges: last-writer-wins on conflicting changes per key") {
    val ch = Seq(
      (2L, "TWO-a", 21, "U", 1),
      (2L, "TWO-b", 22, "U", 3),  // highest seq wins
      (2L, "TWO-c", 23, "U", 2),
      (4L, "gone", 0, "D", 5),
      (4L, "back", 44, "U", 4))   // the later delete wins over this
      .toDF("id", "text", "v", "op", "seq")
    val got = Cdc.applyChanges(base, ch, "id")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "one", 10), (2L, "TWO-b", 22), (3L, "three", 30)))
  }

  test("applyChanges: idempotent under re-application of the same batch") {
    val ch = Seq(
      (2L, "TWO", 21, "U", 1), (3L, "x", 0, "D", 1), (9L, "nine", 90, "I", 1))
      .toDF("id", "text", "v", "op", "seq")
    val once = Cdc.applyChanges(base, ch, "id")
    val twice = Cdc.applyChanges(once, ch, "id")
    assert(once.as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      twice.as[(Long, String, Int)].collect().sortBy(_._1).toSeq)
  }

  test("applyChanges: base side plans a broadcast anti-join (no base shuffle)") {
    val ch = Seq((2L, "TWO", 21, "U", 1)).toDF("id", "text", "v", "op", "seq")
    val plan = Cdc.applyChanges(base, ch, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join on the base side:\n$plan")
  }
}
