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
}
