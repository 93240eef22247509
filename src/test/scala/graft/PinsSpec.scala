package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared pin primitive (r12 verdict ask #5: every eager
  * multi-consumer checkpoint routes through one helper, with a
  * cluster-safe reliable mode behind a session gate).
  */
class PinsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Pins

  test("local mode: lineage truncated to a checkpoint scan, rows intact") {
    val spark2 = spark
    import spark2.implicits._
    val df = Pins.pin(Seq(1, 2, 3).toDF("x"), "pins_spec_local")
    assert(df.queryExecution.sparkPlan.toString.contains("Scan ExistingRDD"),
      df.queryExecution.sparkPlan.toString.take(500))
    assert(df.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("session gate: reliable parquet round-trip with collision-free names") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pins-spec").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      // two pins under the SAME logical name: both must stay readable
      // (a fixed name would let the second write clobber a frame the
      // first result's plan still reads lazily — the madOutliers shape)
      val a = Pins.pin(Seq(1, 2).toDF("x"), "same")
      val b = Pins.pin(Seq(3, 4).toDF("x"), "same")
      assert(a.as[Int].collect().sorted.toSeq == Seq(1, 2))
      assert(b.as[Int].collect().sorted.toSeq == Seq(3, 4))
      // the pin is disk-backed under the gate dir (recomputable after
      // executor loss), not an executor-storage block
      assert(a.inputFiles.nonEmpty && a.inputFiles.head.contains("pins-spec"),
        a.inputFiles.mkString(","))
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("pinAt: verbatim name overwrites — the bounded rolling-store mode") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pins-at").toString
    Pins.pinAt(Seq(1).toDF("x"), dir, "store")
    val again = Pins.pinAt(Seq(2).toDF("x"), dir, "store")
    assert(again.as[Int].collect().toSeq == Seq(2))
    // exactly one store dir: repeated batches overwrite, never accrete
    assert(new java.io.File(dir).listFiles().count(_.getName == "store") == 1)
  }
}
