package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the round-2 plan/graph algorithms: the band-join
  * optimizer rewrite and connected components must equal their naive
  * formulations on arbitrary inputs, not just the spec fixtures.
  */
object OperatorProps extends Properties("Operators") {

  private lazy val spark = SparkTestSession.spark

  private val genBand = for {
    nA <- Gen.choose(1, 60)
    nB <- Gen.choose(1, 60)
    // dyadic steps + threshold keep the predicate arithmetic exact
    stepA <- Gen.oneOf(0.25, 0.5, 1.0)
    stepB <- Gen.oneOf(0.25, 0.5, 0.75)
    off <- Gen.choose(-4, 4)
    c <- Gen.oneOf(0.5, 1.0, 2.0)
  } yield (nA, nB, stepA, stepB, off.toDouble, c)

  property("BandJoinRule rewrite equals the naive cross join + filter") =
    Prop.forAll(genBand) { case (nA, nB, stepA, stepB, off, c) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      val a = (0 until nA).map(i => (i.toLong, i * stepA)).toDF("ida", "xa")
      val b = (0 until nB).map(j => (j.toLong, off + j * stepB)).toDF("idb", "xb")
      val got = a.crossJoin(b).filter(abs($"xa" - $"xb") <= c)
        .select($"ida", $"idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        i <- 0 until nA
        j <- 0 until nB
        if math.abs(i * stepA - (off + j * stepB)) <= c
      } yield (i.toLong, j.toLong)).toSet
      got == want
    }

  private val genBandFull = for {
    nA <- Gen.choose(1, 50)
    nB <- Gen.choose(1, 50)
    stepA <- Gen.oneOf(0.25, 0.5, 1.0)
    stepB <- Gen.oneOf(0.25, 0.5, 0.75)
    off <- Gen.choose(-6, 6)
    c <- Gen.oneOf(0.5, 1.0, 2.0, 3.0)
    swap <- Gen.oneOf(true, false) // abs(r − l) vs abs(l − r)
    nullEvery <- Gen.oneOf(0, 3, 5) // 0 = dense; else every k-th value null
  } yield (nA, nB, stepA, stepB, off.toDouble, c, swap, nullEvery)

  /** The round-3 ask: arbitrary subtract order, null rates, and proof the
    * rule FIRED (a silent non-rewrite would pass a result-only check by
    * falling back to the cross product).
    */
  property("BandJoinRule: swapped sides + nulls preserved, and the rewrite fires") =
    Prop.forAll(genBandFull) { case (nA, nB, stepA, stepB, off, c, swap, nullEvery) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      def nul(i: Int): Boolean = nullEvery > 0 && i % nullEvery == 0
      val a = (0 until nA).map(i => (i.toLong, if (nul(i)) None else Some(i * stepA)))
        .toDF("ida", "xa")
      val b = (0 until nB).map(j => (j.toLong, if (nul(j)) None else Some(off + j * stepB)))
        .toDF("idb", "xb")
      val cond = if (swap) abs($"xb" - $"xa") <= c else abs($"xa" - $"xb") <= c
      val joined = a.crossJoin(b).filter(cond).select($"ida", $"idb")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // a null on either side is UNKNOWN → dropped, exactly like SQL
      val want = (for {
        i <- 0 until nA if !nul(i)
        j <- 0 until nB if !nul(j)
        if math.abs(i * stepA - (off + j * stepB)) <= c
      } yield (i.toLong, j.toLong)).toSet
      val fired = joined.queryExecution.executedPlan.toString.contains("_graft_bkt")
      // when one side is entirely null, inferred IsNotNull filters +
      // empty-relation propagation legitimately DELETE the join — only
      // demand the rewrite when a join survives to be rewritten
      val joinSurvives =
        (0 until nA).exists(!nul(_)) && (0 until nB).exists(!nul(_))
      Prop.propBoolean(got == want) :| s"rows ${got.size} vs ${want.size}" &&
        Prop.propBoolean(fired || !joinSurvives) :| "rule did not fire"
    }

  private val genGraph = for {
    n <- Gen.choose(2, 60)
    m <- Gen.choose(1, 120)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
      if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield edges.distinct

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("connectedComponents equals driver-side union-find") =
    Prop.forAll(genGraph) { edges =>
      edges.isEmpty || {
        val s = spark
        import s.implicits._
        val pairs = edges.toDF("id_a", "id_b")
        val got = graft.operators.Dedup.connectedComponents(pairs).collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
        got == unionFind(edges)
      }
    }

  property("triangles equals driver-side enumeration on random graphs") =
    Prop.forAll(genGraph) { edges =>
      edges.isEmpty || {
        val s = spark
        import s.implicits._
        val df = edges.toDF("src", "dst")
        val got = graft.operators.GraphOps.triangles(df).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val adj = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .filter(p => p._1 != p._2).toSet
        val nodes = adj.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
        val want = (for {
          i <- nodes.indices.iterator
          j <- (i + 1) until nodes.length
          if adj((nodes(i), nodes(j)))
          k <- (j + 1) until nodes.length
          if adj((nodes(j), nodes(k))) && adj((nodes(i), nodes(k)))
        } yield (nodes(i), nodes(j), nodes(k))).toSet
        got == want
      }
    }

  private val genCdc = for {
    nBase <- Gen.choose(0, 30)
    nCh <- Gen.choose(0, 25)
    baseKeys <- Gen.listOfN(nBase, Gen.choose(0L, 20L))
    chRows <- Gen.listOfN(nCh, for {
      key <- Gen.choose(0L, 25L)
      op <- Gen.oneOf("I", "U", "D")
      seq <- Gen.choose(1, 5)
      v <- Gen.choose(0L, 99L)
    } yield (key, op, seq, v))
    // (key, op, seq) must be unique: with an exact tie on BOTH sort keys
    // the winning row is arbitrary in either engine
  } yield (baseKeys.distinct,
    chRows.groupBy(r => (r._1, r._2, r._3)).values.map(_.head).toList)

  property("Cdc.applyChanges equals driver-side last-writer-wins merge") =
    Prop.forAll(genCdc) { case (baseKeys, chRows) =>
      (baseKeys.isEmpty && chRows.isEmpty) || {
        val s = spark
        import s.implicits._
        val base = baseKeys.map(k => (k, s"t$k", k * 10)).toDF("id", "text", "v")
        val ch = chRows.map { case (k, op, seq, v) => (k, s"c$k-$seq", v, op, seq) }
        val chDf = ch.toDF("id", "text", "v", "op", "seq")
        val got = graft.operators.Cdc.applyChanges(base, chDf, "id")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        // driver-side replay: winner per key by (seq desc, op desc)
        val winners = chRows.groupBy(_._1).view.mapValues(
          _.maxBy { case (_, op, seq, _) => (seq, op) }).toMap
        val kept = baseKeys.filterNot(winners.contains)
          .map(k => (k, s"t$k", k * 10))
        val upserts = winners.values.collect {
          case (k, op, seq, v) if op != "D" => (k, s"c$k-$seq", v)
        }
        got == (kept ++ upserts).toSet
      }
    }

  private val genZ = for {
    k <- Gen.choose(2, 3)
    bits <- Gen.oneOf(8, 16)
    rows <- Gen.nonEmptyListOf(
      Gen.listOfN(k, Gen.choose(0L, (1L << 16) - 1)))
  } yield (k, bits, rows)

  property("ZOrder.zValue equals the bit-interleave reference on arbitrary ints") =
    Prop.forAll(genZ) { case (k, bits, rows) =>
      val s = spark
      import org.apache.spark.sql.functions.col
      import s.implicits._
      def ref(vals: Seq[Long]): Long = {
        var z = 0L
        for (i <- 0 until bits; j <- 0 until k)
          z |= ((vals(j) >> i) & 1L) << (i * k + j)
        z
      }
      val df = rows.map {
        case Seq(a, b) => (a, b, 0L)
        case Seq(a, b, c) => (a, b, c)
        case _ => (0L, 0L, 0L)
      }.toDF("a", "b", "c")
      val cols = Seq(col("a"), col("b"), col("c")).take(k)
      val got = df.select(graft.operators.ZOrder.zValue(cols, bits).as("z"))
        .as[Long].collect().toSeq
      got == rows.map(r => ref(r.take(k)))
    }
}
