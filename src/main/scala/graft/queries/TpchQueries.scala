package graft.queries

import graft.{QueryDef, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q2/Q3/Q7/Q8/Q9/Q11/Q13/Q14/Q15/Q18/
  * Q19/Q20/Q21/Q22 — Q1/Q4/Q5/Q6/Q10/Q12/Q16/Q17 live in
  * RelationalQueries as q01/q63/q64/q68/q66/q69/q65/q23), adapted to the
  * fixture star schema (no partsupp table, no commit/receipt dates, no
  * phone/container/shipmode columns — each adaptation keeps the query's
  * relational *shape*: correlated aggregates, nested INs, EXISTS chains,
  * disjunctive predicate pushdown, ratio-of-sums).
  *
  * Consumer-surface rationale: the reference's published tables are
  * queried by consumers' own SQL engines (SURVEY §3.3), so the engine
  * must answer the standard analytic query corpus — TPC-H is that corpus.
  *
  * Determinism discipline (see RelationalQueries header): money sums are
  * quantized to integer ten-thousandths per row BEFORE summing (exact in
  * both engines), ratios are emitted as single exact-rounded divisions of
  * those integer sums, dates are emitted as ISO strings, and LIMIT
  * queries carry a total sort order.
  */
object TpchQueries extends QueryPack {

  private def fixpt(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    round(c * math.pow(10, scale), 0).cast("long")

  private def fixptSum(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    sum(fixpt(c, scale)).cast("double") / math.pow(10, scale)

  /** DuckDB mirror of fixptSum (sum(BIGINT) is HUGEINT there → re-cast). */
  private def sqlFixptSum(expr: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"CAST(sum(CAST(round(($expr) * $p, 0) AS BIGINT)) AS DOUBLE) / $p.0"
  }

  override def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q70 (TPC-H Q2 shape): correlated scalar aggregate subquery — the
    // supplier(s) achieving the per-nation maximum account balance
    // (stands in for min supplycost over the absent partsupp). Spark
    // decorrelates to a grouped max + equi-join on the group key +
    // equality on the aggregate; the dim join broadcasts.
    QueryDef(
      "q70_min_cost_supplier",
      (s, dir) => {
        import s.implicits._
        val sup = T.supplier(s, dir)
        val best = sup.groupBy($"s_nationkey".as("bn"))
          .agg(max($"s_acctbal").as("best_bal"))
        sup.join(best, $"s_nationkey" === $"bn" && $"s_acctbal" === $"best_bal")
          .join(broadcast(T.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
          .select($"n_name", $"s_name", $"s_acctbal")
      },
      Some("""SELECT n_name, s_name, s_acctbal
             |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
             |WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
             |                   WHERE s2.s_nationkey = s.s_nationkey)""".stripMargin)),

    // ------------------------------------------------------------------
    // q71 (TPC-H Q3): shipping priority — segment filter on the customer
    // dim, date range split across orders and lineitem, grouped revenue,
    // total-ordered top 10.
    QueryDef(
      "q71_shipping_priority",
      (s, dir) => {
        import s.implicits._
        T.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
          .join(T.orders(s, dir), $"c_custkey" === $"o_custkey")
          .filter($"o_orderdate" < lit("1996-07-01").cast("timestamp"))
          .join(T.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
          .filter($"l_shipdate" > lit("1996-07-01").cast("timestamp"))
          .groupBy($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
          .agg(fixptSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
          .orderBy($"revenue".desc, $"orderdate", $"l_orderkey")
          .limit(10)
          .select($"l_orderkey", $"orderdate", $"revenue")
      },
      Some(s"""SELECT l_orderkey,
              |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
              |  ${sqlFixptSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1996-07-01'
              |  AND l_shipdate > TIMESTAMP '1996-07-01'
              |GROUP BY 1, 2
              |ORDER BY revenue DESC, orderdate, l_orderkey
              |LIMIT 10""".stripMargin)),

    // ------------------------------------------------------------------
    // q72 (TPC-H Q7): volume shipping between two nations, both
    // directions, by ship year — two independent nation-dim joins
    // (supplier side and customer side) with a pair predicate.
    QueryDef(
      "q72_volume_shipping",
      (s, dir) => {
        import s.implicits._
        val n1 = T.nation(s, dir).select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
        val n2 = T.nation(s, dir).select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation"))
        T.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
          .join(T.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n1), $"s_nationkey" === $"snk")
          .join(broadcast(n2), $"c_nationkey" === $"cnk")
          .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
            ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
          .groupBy($"supp_nation", $"cust_nation",
            date_format($"l_shipdate", "yyyy").as("l_year"))
          .agg(fixptSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  strftime(l_shipdate, '%Y') AS l_year,
              |  ${sqlFixptSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate < TIMESTAMP '1998-01-01'
              |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
              |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |GROUP BY 1, 2, 3""".stripMargin)),

    // ------------------------------------------------------------------
    // q73 (TPC-H Q8): market share — ratio of two grouped sums. Both
    // numerator and denominator are exact integer ten-thousandths, so the
    // single final division is exact-rounded and cross-engine identical
    // (never round a computed ratio — see RelationalQueries header).
    QueryDef(
      "q73_market_share",
      (s, dir) => {
        import s.implicits._
        val vol4 = fixpt($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
        T.lineitem(s, dir)
          .join(T.part(s, dir).filter($"p_type" === "STANDARD"), $"l_partkey" === $"p_partkey")
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
          .join(T.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(T.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
          .groupBy(date_format($"o_orderdate", "yyyy").as("o_year"))
          .agg(
            sum(when($"n_name" === "NATION_5", vol4).otherwise(0L)).as("num4"),
            sum(vol4).as("den4"))
          .select($"o_year",
            ($"num4".cast("double") / $"den4".cast("double")).as("mkt_share"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y') AS o_year,
             |  CAST(CAST(sum(CASE WHEN n_name = 'NATION_5'
             |        THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
             |        ELSE 0 END) AS BIGINT) AS DOUBLE) /
             |  CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             |    AS mkt_share
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE p_type = 'STANDARD'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q74 (TPC-H Q9): product-type profit by nation and year. Profit =
    // revenue − cost, with p_retailprice × quantity standing in for the
    // absent ps_supplycost; both terms quantized before the subtraction
    // so the grouped sum is exact integer arithmetic.
    QueryDef(
      "q74_product_profit",
      (s, dir) => {
        import s.implicits._
        val amount4 = fixpt($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4) -
          fixpt($"p_retailprice" * $"l_quantity", 4)
        T.lineitem(s, dir)
          .join(T.part(s, dir).filter($"p_name".like("red%")), $"l_partkey" === $"p_partkey")
          .join(T.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(T.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name".as("nation"), date_format($"o_orderdate", "yyyy").as("o_year"))
          .agg((sum(amount4).cast("double") / 10000.0).as("sum_profit"))
      },
      Some("""SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
             |  CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT) -
             |                CAST(round(p_retailprice * l_quantity * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             |    / 10000.0 AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE p_name LIKE 'red%'
             |GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q75 (TPC-H Q11): grouped value vs a fraction of the global total —
    // the HAVING-against-scalar-subquery shape. The global total rides a
    // broadcast cross join (one row), and both sides of the comparison
    // are exact integers widened to double.
    QueryDef(
      "q75_important_value",
      (s, dir) => {
        import s.implicits._
        val vals = T.lineitem(s, dir)
          .groupBy($"l_partkey")
          .agg(sum(fixpt($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)).as("value4"))
        val total = vals.agg(sum($"value4").as("total4"))
        vals.crossJoin(broadcast(total))
          .filter($"value4".cast("double") > $"total4".cast("double") * 0.0007)
          .select($"l_partkey", ($"value4".cast("double") / 10000.0).as("value"))
      },
      Some("""WITH vals AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS value4
             |  FROM lineitem GROUP BY 1)
             |SELECT l_partkey, CAST(value4 AS DOUBLE) / 10000.0 AS value
             |FROM vals
             |WHERE CAST(value4 AS DOUBLE) >
             |  (SELECT CAST(CAST(sum(value4) AS BIGINT) AS DOUBLE) FROM vals) * 0.0007""".stripMargin)),

    // ------------------------------------------------------------------
    // q76 (TPC-H Q13): customer order-count distribution — left outer
    // join with a join-side predicate (kept on the orders side, so
    // customers with zero qualifying orders still appear), two-level
    // aggregation.
    QueryDef(
      "q76_order_distribution",
      (s, dir) => {
        import s.implicits._
        val ord = T.orders(s, dir).filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
        T.customer(s, dir)
          .join(ord, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
             |  GROUP BY c_custkey) t
             |GROUP BY c_count""".stripMargin)),

    // ------------------------------------------------------------------
    // q77 (TPC-H Q14): promo revenue share — conditional sum over total,
    // one month, emitted as (100 × num) / den on exact integer operands.
    QueryDef(
      "q77_promo_share",
      (s, dir) => {
        import s.implicits._
        val rev4 = fixpt($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
        T.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1997-03-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
          .join(T.part(s, dir), $"l_partkey" === $"p_partkey")
          .agg(
            sum(when($"p_type" === "PROMO", rev4).otherwise(0L)).as("num4"),
            sum(rev4).as("den4"))
          .select((lit(100.0) * $"num4".cast("double") / $"den4".cast("double"))
            .as("promo_revenue_pct"))
      },
      Some("""SELECT 100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
             |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
             |    ELSE 0 END) AS BIGINT) AS DOUBLE) /
             |  CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             |    AS promo_revenue_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)),

    // ------------------------------------------------------------------
    // q78 (TPC-H Q15): top supplier — a derived revenue view consumed
    // twice (per-supplier revenue, and its global max), joined on
    // aggregate equality. Exact integer revenue makes the equality safe.
    QueryDef(
      "q78_top_supplier",
      (s, dir) => {
        import s.implicits._
        val rev = T.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
          .groupBy($"l_suppkey")
          .agg(sum(fixpt($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)).as("rev4"))
        val top = rev.agg(max($"rev4").as("max4"))
        rev.crossJoin(broadcast(top))
          .filter($"rev4" === $"max4")
          .join(T.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", ($"rev4".cast("double") / 10000.0).as("total_revenue"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev4
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(rev4 AS DOUBLE) / 10000.0 AS total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE rev4 = (SELECT max(rev4) FROM rev)""".stripMargin)),

    // ------------------------------------------------------------------
    // q79 (TPC-H Q18): large-volume orders — grouped HAVING on a quantity
    // sum (integral doubles, exact), joined back to both dims.
    QueryDef(
      "q79_large_orders",
      (s, dir) => {
        import s.implicits._
        val big = T.lineitem(s, dir)
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity").as("sum_qty"))
          .filter($"sum_qty" > 300.0)
        big.join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
            $"o_totalprice", $"sum_qty")
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             |  o_totalprice, sum_qty
             |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300.0) t
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q80 (TPC-H Q19): disjunctive multi-attribute predicates across the
    // join — three (brand, size, quantity-window) arms OR'd together.
    // Catalyst pushes the common partkey equi-join and per-side
    // conjuncts; the disjunction evaluates post-join in one codegen stage.
    QueryDef(
      "q80_disjunctive_rev",
      (s, dir) => {
        import s.implicits._
        val arm1 = $"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1.0, 11.0)
        val arm2 = $"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
          $"l_quantity".between(10.0, 20.0)
        val arm3 = $"p_brand" === "Brand#24" && $"p_size".between(1, 35) &&
          $"l_quantity".between(20.0, 30.0)
        T.lineitem(s, dir)
          .join(T.part(s, dir), $"l_partkey" === $"p_partkey")
          .filter(arm1 || arm2 || arm3)
          .agg(fixptSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT ${sqlFixptSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
              |  count(*) AS n_items
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1.0 AND 11.0)
              |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10.0 AND 20.0)
              |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin)),

    // ------------------------------------------------------------------
    // q81 (TPC-H Q20): nested IN over a grouped HAVING — suppliers who
    // moved more than 60 units of any single '%bolt' part (the
    // excess-stock shape without partsupp). Spark form: semi join against
    // the grouped candidate set.
    QueryDef(
      "q81_excess_parts",
      (s, dir) => {
        import s.implicits._
        val heavy = T.lineitem(s, dir)
          .join(T.part(s, dir).filter($"p_name".like("%bolt")), $"l_partkey" === $"p_partkey")
          .groupBy($"l_suppkey", $"l_partkey")
          .agg(sum($"l_quantity").as("qty"))
          .filter($"qty" > 60.0)
          .select($"l_suppkey").distinct()
        T.supplier(s, dir)
          .join(heavy, $"s_suppkey" === $"l_suppkey", "left_semi")
          .select($"s_suppkey", $"s_name")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_name LIKE '%bolt'
             |  GROUP BY l_suppkey, l_partkey
             |  HAVING sum(l_quantity) > 60.0)""".stripMargin)),

    // ------------------------------------------------------------------
    // q82 (TPC-H Q21): suppliers who shipped last on multi-supplier
    // finished orders — an EXISTS (another supplier on the order) plus a
    // NOT EXISTS (no other supplier shipped later), i.e. a semi join and
    // an anti join with mixed equi/non-equi conditions, then a
    // total-ordered top 20. l_shipdate stands in for the absent
    // receipt/commit dates.
    QueryDef(
      "q82_waiting_supplier",
      (s, dir) => {
        import s.implicits._
        val l1 = T.lineitem(s, dir)
          .join(T.orders(s, dir).filter($"o_orderstatus" === "F"),
            $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"), $"l_shipdate".as("sd"))
        val others = T.lineitem(s, dir)
          .select($"l_orderkey".as("ok2"), $"l_suppkey".as("sk2"), $"l_shipdate".as("sd2"))
        l1
          .join(others, $"ok" === $"ok2" && $"sk" =!= $"sk2", "left_semi")
          .join(others,
            $"ok" === $"ok2" && $"sk" =!= $"sk2" && $"sd2" > $"sd", "left_anti")
          .join(T.supplier(s, dir), $"sk" === $"s_suppkey")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name")
          .limit(20)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > l1.l_shipdate)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name
             |LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q83 (TPC-H Q22): global sales opportunity — customers above the
    // (positive-balance) average with no *urgent* orders (every fixture
    // customer has some order): scalar average subquery + NOT EXISTS
    // anti join. The average comparison runs on
    // integer cents vs an exact-rounded division, identical both sides;
    // the "country code" is the last digit of the customer name.
    QueryDef(
      "q83_global_opportunity",
      (s, dir) => {
        import s.implicits._
        val cust = T.customer(s, dir)
          .withColumn("code", substring($"c_name", 18, 1))
          .withColumn("bal100", fixpt($"c_acctbal", 2))
        val avgPos = cust.filter($"c_acctbal" > 0.0)
          .agg(sum($"bal100").as("sum100"), count(lit(1)).as("cnt"))
        cust
          .filter($"code".isin("1", "3", "5", "7", "9"))
          .crossJoin(broadcast(avgPos))
          .filter($"bal100".cast("double") > $"sum100".cast("double") / $"cnt")
          .join(T.orders(s, dir).filter($"o_orderpriority" === "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"code")
          .agg(count(lit(1)).as("numcust"),
            (sum($"bal100").cast("double") / 100.0).as("totacctbal"))
      },
      Some("""WITH cust AS (
             |  SELECT c_custkey, substr(c_name, 18, 1) AS code,
             |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal100, c_acctbal
             |  FROM customer),
             |avgpos AS (
             |  SELECT CAST(sum(bal100) AS BIGINT) AS sum100, count(*) AS cnt
             |  FROM cust WHERE c_acctbal > 0.0)
             |SELECT code, count(*) AS numcust,
             |  CAST(CAST(sum(bal100) AS BIGINT) AS DOUBLE) / 100.0 AS totacctbal
             |FROM cust, avgpos
             |WHERE code IN ('1', '3', '5', '7', '9')
             |  AND CAST(bal100 AS DOUBLE) > CAST(sum100 AS DOUBLE) / cnt
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY code""".stripMargin))
  )
}
