package graft

import graft.sources.{PointerCatalog, TableIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pointer catalog round-trips and attached views answer SQL with pruning") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_catalog_spec/times"
    val df = Seq(
      ("000000001", "000500001", 12.5, "01"),
      ("000000002", "000500002", 9.0, "07"))
      .toDF("origin_id", "destination_id", "duration_sec", "state")
      .withColumn("version", lit("0.0.1")).withColumn("mode", lit("car"))
      .withColumn("year", lit("2024")).withColumn("geography", lit("county"))
      .withColumn("centroid_type", lit("weighted"))
    TableIO.writePartitioned(df, dir, Seq("origin_id", "destination_id"))

    val catFile = "/tmp/graft_catalog_spec/pointer.catalog"
    PointerCatalog.save(catFile, Map("cat_times" -> dir))
    val attached = PointerCatalog.attach(s, catFile)
    assert(attached == Map("cat_times" -> dir))

    val q = s.sql("SELECT origin_id, duration_sec FROM cat_times WHERE state = '07'")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("000000002"))
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value == 1) // pruning survives the view
  }

  // Round-5 ask #5: the reference ships an ATTACHable DuckDB pointer DB;
  // prove OUR artifact serves an external DuckDB consumer (no Spark) the
  // same rows Spark serves — executed here through the sandbox's real
  // duckdb, building an actual .duckdb database from the script.
  test("DuckDB view artifact: an external DuckDB consumer matches Spark") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_catalog_spec/times" // written by the first test
    Seq((1, "x")).toDF("a", "b").count() // ensure session + fixture ordering
    val sqlFile = "/tmp/graft_catalog_spec/catalog_views.sql"
    PointerCatalog.saveDuckDbViews(sqlFile, Map("cat_times" -> dir))

    val sparkRows = s.sql(
        "SELECT origin_id, duration_sec, state FROM cat_times WHERE state = '07'")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSeq

    val py =
      """import duckdb, sys
        |con = duckdb.connect('/tmp/graft_catalog_spec/pointer.duckdb')
        |con.execute(open('/tmp/graft_catalog_spec/catalog_views.sql').read())
        |con.close()
        |# cold re-attach: a brand-new connection to the built artifact
        |c2 = duckdb.connect('/tmp/graft_catalog_spec/pointer.duckdb')
        |for r in c2.execute(
        |    "SELECT origin_id, duration_sec, state FROM cat_times "
        |    "WHERE state = '07' ORDER BY origin_id").fetchall():
        |  print(f"{r[0]}|{r[1]}|{r[2]}")
        |# partition-key type contract: hive_types_autocast=false must pin
        |# state to VARCHAR ('01' keeps its zero; default autocast reads it
        |# back as BIGINT 1)
        |ty = dict(
        |  (r[0], r[1]) for r in c2.execute("DESCRIBE cat_times").fetchall())
        |print("TYPE:state=" + ty["state"])
        |""".stripMargin
    new java.io.File("/tmp/graft_catalog_spec/pointer.duckdb").delete()
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py)) !
      scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), System.err.println)
    assert(code == 0, s"duckdb consumer failed:\n$out")
    val (typeLines, rowLines) = out.toString.split('\n').filter(_.nonEmpty)
      .toSeq.partition(_.startsWith("TYPE:"))
    val duckRows = rowLines
      .map { l => val Array(o, d, st) = l.split('|'); (o, d.toDouble, st) }
    assert(duckRows == sparkRows.sortBy(_._1),
      s"cross-engine mismatch: duck=$duckRows spark=$sparkRows")
    assert(typeLines == Seq("TYPE:state=VARCHAR"),
      s"partition key must stay VARCHAR through the artifact: $typeLines")
  }

  test("TxLog DuckDB artifact: engine-free consumer matches TxLog.read, plain + vectored (r9 #6)") {
    val s = spark
    import s.implicits._
    import graft.sources.TxLog
    val base = "/tmp/graft_catalog_spec/txduck"
    val hfs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(base), true)
    val t = s"$base/tbl"
    def mk(lo: Long, hi: Long) = s.range(lo, hi)
      .select($"id", ($"id" % 7L).as("g"), ($"id" * 2L).as("v"))
    TxLog.commit(s, t, mk(0L, 200L)) // v1 — replaced below: its dir goes DEAD
    TxLog.commit(s, t, mk(0L, 400L)) // v2 overwrite
    val deadDirs = TxLog.manifest(s, t, Some(1L)).map(_._1).toSet --
      TxLog.manifest(s, t, Some(2L)).map(_._1).toSet
    assert(deadDirs.nonEmpty, "fixture must leave a dead batch in the tree")
    TxLog.commit(s, t, mk(400L, 500L), append = true) // v3
    TxLog.deleteVectored(s, t, "id", Some(50L), Some(130L)) // v4: vectored
    val sqlFile = s"$base/tx_views.sql"
    PointerCatalog.saveDuckDbTxViews(s, sqlFile,
      Map("tbl_live" -> t, "tbl_v3" -> t), asOf = Map("tbl_v3" -> 3L))
    val artifact = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sqlFile)), "UTF-8")
    // a consumer must read the SNAPSHOT's dirs, never the tree: the
    // overwritten batch may not appear; the vectored view carries the
    // tombstone anti-join, the pinned plain view does not
    deadDirs.foreach(d => assert(!artifact.contains(d),
      s"dead batch $d leaked into the consumer artifact"))
    val Array(liveStmt, v3Stmt) =
      artifact.split('\n').filter(_.nonEmpty).sorted // tbl_live, tbl_v3
    assert(liveStmt.contains("NOT EXISTS") && liveStmt.contains("file_row_number"))
    assert(!v3Stmt.contains("NOT EXISTS"))
    // external consumer: real duckdb, no Spark, cold attach
    val py =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute(open('$sqlFile').read())
         |for r in con.execute('SELECT id, g, v FROM tbl_live ORDER BY id').fetchall():
         |  print('L|%d|%d|%d' % r)
         |print('V3N|%d' % con.execute('SELECT count(*) FROM tbl_v3').fetchone()[0])
         |print('V3S|%d' % con.execute('SELECT CAST(sum(v) AS BIGINT) FROM tbl_v3').fetchone()[0])
         |""".stripMargin
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py)) !
      scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), System.err.println)
    assert(code == 0, s"duckdb consumer failed:\n$out")
    val lines = out.toString.split('\n').filter(_.nonEmpty).toSeq
    val duckLive = lines.filter(_.startsWith("L|"))
      .map { l => val Array(_, i, g, v) = l.split('|'); (i.toLong, g.toLong, v.toLong) }
    val sparkLive = TxLog.read(s, t).as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(duckLive == sparkLive,
      s"vectored view mismatch: duck=${duckLive.size} spark=${sparkLive.size} rows")
    val v3 = TxLog.read(s, t, asOf = Some(3L))
    assert(lines.contains(s"V3N|${v3.count()}"))
    assert(lines.contains(s"V3S|${v3.agg(sum($"v")).head().getLong(0)}"))
  }

  test("tree stats: per-directory rollups match the flat listing (S11)") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_catalog_spec/times" // written by the first test
    Seq((1, "x")).toDF("a", "b").count() // ensure session
    val stats = TableIO.treeStats(s, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats.contains("")) // root rollup
    val (rootSize, rootFiles) = stats("")
    // independent ground truth: a plain filesystem walk
    import scala.jdk.CollectionConverters._
    val walked = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith(".")) // hadoop-hidden .crc files
      .toSeq
    assert(rootFiles == walked.size, s"root n_files $rootFiles != ${walked.size}")
    assert(rootSize == walked.map(java.nio.file.Files.size(_)).sum)
    // state partition dirs appear with their own rollups
    assert(stats.keys.exists(_.contains("state=07")))
    val state07 = stats.filter { case (k, _) => k.endsWith("state=07/centroid_type=weighted") }
    assert(state07.nonEmpty && state07.values.head._2 >= 1)
  }

  test("consumer index JSON: per-partition file and row counts match the written tree") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_catalog_spec/times" // written by the first test
    val idx = "/tmp/graft_catalog_spec/index.json"
    TableIO.writeConsumerIndex(s, dir, idx)
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(idx)), "UTF-8")

    // totals match a direct read of the tree
    val total = TableIO.readPartitioned(s, dir).count()
    assert(json.contains(s""""rows":$total"""), json.take(400))

    // every partition directory appears with its own rollup, and the
    // per-partition rows sum back to the total (parse minimally — the
    // format is flat key:value)
    val partRows = """\{"partition":"([^"]*)","n_files":(\d+),"rows":(\d+)""".r
      .findAllMatchIn(json).map(m => (m.group(1), m.group(2).toInt, m.group(3).toLong)).toSeq
    assert(partRows.nonEmpty)
    assert(partRows.map(_._3).sum == total)
    assert(partRows.forall(_._2 >= 1))
    assert(partRows.exists(_._1.contains("state=07")))
    // per-file row counts agree with a filtered read of one partition
    val one = partRows.find(_._1.contains("state=07")).get
    val directRows = s.read.parquet(dir + "/" + one._1).count()
    assert(one._3 == directRows, s"${one._1}: index ${one._3} != direct $directRows")
  }

  test("input-file md5 matches an independent digest (F7)") {
    val f = "/tmp/graft_md5_spec.bin"
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      "graft determinism test".getBytes("UTF-8"))
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
      .map("%02x".format(_)).mkString
    assert(TableIO.fileMd5(spark, f) == want)
    // stable for a real fixture file too
    val m1 = TableIO.fileMd5(spark, sf0001 + "/region.parquet")
    val m2 = TableIO.fileMd5(spark, sf0001 + "/region.parquet")
    assert(m1 == m2 && m1.length == 32)
  }

  test("DDL catalog artifact: a fresh session attaches cold, pruning intact") {
    val s = spark
    val dir = "/tmp/graft_catalog_spec/times" // written by the first test
    val ddl = "/tmp/graft_catalog_spec/catalog.ddl"
    s.sql("DROP TABLE IF EXISTS pub_times")
    PointerCatalog.saveDdl(ddl, Map("pub_times" -> dir))

    // the artifact is self-contained SQL text — no session state inside
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ddl)), "UTF-8")
    assert(text.contains("CREATE TABLE IF NOT EXISTS pub_times USING parquet"))
    assert(text.contains("RECOVER PARTITIONS"))

    // attach in a NEW session (fresh session state: temp views from other
    // tests are invisible, so resolution must come from the catalog entry)
    val s2 = s.newSession()
    PointerCatalog.attachDdl(s2, ddl)
    val cat = s2.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("pub_times"))
    assert(cat.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)
    assert(cat.partitionColumnNames.take(2) == Seq("version", "mode"))
    // partitions registered in the catalog (not rediscovered per query)
    assert(s2.sql("SHOW PARTITIONS pub_times").count() >= 2)
    // partition keys stay strings (leading zeros survive)
    assert(cat.partitionSchema.fields.forall(_.dataType.typeName == "string"))

    val q = s2.sql(
      "SELECT origin_id, duration_sec FROM pub_times WHERE state = '07'")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("000000002"))
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value == 1, "catalog pruning lost")

    // idempotent re-attach
    PointerCatalog.attachDdl(s2, ddl)
    assert(s2.sql("SELECT count(*) FROM pub_times").head.getLong(0) == 2)
  }

  test("catalog-table statistics feed the optimizer (CBO surface)") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS stats_orders")
    val p = java.nio.file.Paths.get("/tmp/graft_warehouse/stats_orders")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    Tables.orders(s, sf0001).write.saveAsTable("stats_orders")
    s.sql("ANALYZE TABLE stats_orders COMPUTE STATISTICS")
    val prev = s.conf.get("spark.sql.cbo.enabled")
    try {
      s.conf.set("spark.sql.cbo.enabled", "true") // row counts reach plan stats only under CBO
      val stats = s.table("stats_orders").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1500)), s"rowCount=${stats.rowCount}")
      assert(stats.sizeInBytes > 0)
    } finally s.conf.set("spark.sql.cbo.enabled", prev)
  }
}
