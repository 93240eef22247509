package graft.tools

import graft._
import java.nio.file.{Files, Paths}

/** Diagnostic: dump named queries' results (parquet) + their oracle SQL
  * (json) at a chosen SF dir so the DuckDB comparison can be run locally
  * before the driver's round gate. Usage:
  *   testOnly-free: Test/runMain graft.tools.OracleCheck out=/tmp/x sf=... q1 q2 ...
  */
object OracleCheck {
  def main(args: Array[String]): Unit = {
    val kv = args.filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val names = args.filterNot(_.contains("="))
    val out = kv.getOrElse("out", "/tmp/graft_oracle_check")
    val sf = kv.getOrElse("sf", SparkTestSession.sf0001)
    val spark = SparkTestSession.spark
    new java.io.File(out).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$n")
      println(f"[check] $n dumped in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
