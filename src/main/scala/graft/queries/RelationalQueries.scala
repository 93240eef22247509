package graft.queries

import graft.{QueryDef, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator pack — the projection/filter/join/aggregate/sort/
  * set-op/scalar-function surface of SURVEY §2 (families P, J, A, O, U, F),
  * expressed over the fixture tables.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates are rounded on both sides (accumulation order
  *    differs between engines);
  *  - row_number outputs are cast to long (DuckDB row_number is BIGINT);
  *  - integer sums in DuckDB are wrapped CAST(.. AS BIGINT) (DuckDB
  *    promotes to HUGEINT);
  *  - no raw timestamp output columns (ns-vs-us parquet mismatch) — dates
  *    or epoch seconds instead.
  */
object RelationalQueries extends QueryPack {

  /** Cross-engine FP determinism: per-row scalar math is bit-identical
    * between Spark and DuckDB (same IEEE ops on the same inputs), but
    * multi-row accumulation order is not. So fixed-point columns (prices:
    * 2 decimals, discounts: 2, price*(1-disc): 4) are quantized to exact
    * integers per row before summing; integer sums are order-independent.
    * The oracle SQL applies the same quantization.
    */
  private def fixpt(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    round(c * math.pow(10, scale), 0).cast("long")

  private def fixptSum(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    sum(fixpt(c, scale)).cast("double") / math.pow(10, scale)

  override def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q01: scan → filter (pushed) → hash aggregate. TPC-H Q1 shape; the
    // grouped-sum family of SURVEY §2.4 (A2) with predicate pushdown (P9
    // analogue on a non-partitioned file). Headline bench query.
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(fixptSum($"l_extendedprice", 2), 2).as("sum_base_price"),
            round(fixptSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4), 2).as("sum_disc_price"),
            // ratios of exact operands are bit-identical across engines and
            // must NOT be rounded: Spark round (BigDecimal HALF_UP on the
            // binary value) and DuckDB round (x*10^k then round) disagree
            // exactly when the true ratio sits on a decimal boundary.
            (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
            (fixptSum($"l_discount", 2) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
             |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
             |  sum(l_quantity) / count(*) AS avg_qty,
             |  CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ------------------------------------------------------------------
    // q02: projection + rename + conjunctive filter + prefix predicate
    // (P1, P2, P3, P8). All three predicates and both projected columns
    // must reach the parquet scan (PushedFilters / ReadSchema).
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        import s.implicits._
        T.part(s, dir)
          .filter($"p_type" === "ECONOMY" && $"p_size" < 25 && $"p_name".startsWith("b"))
          .select($"p_partkey".as("part_id"), upper($"p_name").as("name_uc"), $"p_retailprice")
      },
      Some("""SELECT p_partkey AS part_id, upper(p_name) AS name_uc, p_retailprice
             |FROM part
             |WHERE p_type = 'ECONOMY' AND p_size < 25 AND p_name LIKE 'b%'""".stripMargin)),

    // ------------------------------------------------------------------
    // q03: star-schema join chain (J3) — both dimension sides are small and
    // must broadcast (no shuffle of the fact side on dim keys).
    QueryDef(
      "q03_join_dims",
      (s, dir) => {
        import s.implicits._
        T.customer(s, dir)
          .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(T.region(s, dir)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            count(lit(1)).as("n_customers"),
            round(fixptSum($"c_acctbal", 2), 2).as("total_acctbal"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
             |  round(CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q04: left outer join + null-tolerant aggregate (J2 family).
    QueryDef(
      "q04_left_join",
      (s, dir) => {
        import s.implicits._
        T.nation(s, dir)
          .join(T.supplier(s, dir), $"n_nationkey" === $"s_nationkey", "left")
          .groupBy($"n_name")
          .agg(
            count($"s_suppkey").as("n_suppliers"),
            round(coalesce(fixptSum($"s_acctbal", 2), lit(0.0)), 2).as("total_bal"))
      },
      Some("""SELECT n_name, count(s_suppkey) AS n_suppliers,
             |  round(coalesce(CAST(sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 0), 2) AS total_bal
             |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
             |GROUP BY n_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q05: left-semi join (P5 membership as a semi-join — EXISTS).
    QueryDef(
      "q05_semi_join",
      (s, dir) => {
        import s.implicits._
        val big = T.orders(s, dir).filter($"o_totalprice" > 400000.0)
        T.customer(s, dir)
          .join(big, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin)),

    // ------------------------------------------------------------------
    // q06: left-anti join (NOT EXISTS).
    QueryDef(
      "q06_anti_join",
      (s, dir) => {
        import s.implicits._
        T.part(s, dir)
          .join(T.lineitem(s, dir), $"p_partkey" === $"l_partkey", "left_anti")
          .select($"p_partkey", $"p_name")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin)),

    // ------------------------------------------------------------------
    // q07: cross join (J1) — small × small, broadcast-nested-loop.
    QueryDef(
      "q07_cross_join",
      (s, dir) => {
        import s.implicits._
        T.region(s, dir)
          .crossJoin(T.orders(s, dir).select($"o_orderpriority").distinct())
          .select($"r_regionkey", $"r_name", $"o_orderpriority")
      },
      Some("""SELECT r_regionkey, r_name, o_orderpriority
             |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p""".stripMargin)),

    // ------------------------------------------------------------------
    // q08: union-all of two filtered projections (U1); one scan each, both
    // filters pushed.
    QueryDef(
      "q08_union_all",
      (s, dir) => {
        import s.implicits._
        val o = T.orders(s, dir)
        o.filter($"o_orderstatus" === "F")
          .select($"o_orderkey", lit("finished").as("bucket"))
          .unionByName(
            o.filter($"o_totalprice" > 450000.0)
              .select($"o_orderkey", lit("big").as("bucket")))
      },
      Some("""SELECT o_orderkey, 'finished' AS bucket FROM orders WHERE o_orderstatus = 'F'
             |UNION ALL
             |SELECT o_orderkey, 'big' AS bucket FROM orders WHERE o_totalprice > 450000.0""".stripMargin)),

    // ------------------------------------------------------------------
    // q09: distinct over a projection (A3) — partial-aggregate dedup before
    // the shuffle.
    QueryDef(
      "q09_distinct",
      (s, dir) => {
        import s.implicits._
        T.customer(s, dir).select($"c_mktsegment", $"c_nationkey").distinct()
      },
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")),

    // ------------------------------------------------------------------
    // q10: window ranking, deterministic tiebreak (SURVEY §2.5 extension;
    // no counterpart in the reference but required engine surface).
    QueryDef(
      "q10_window_topk_per_key",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        T.orders(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3""".stripMargin)),

    // ------------------------------------------------------------------
    // q11: global top-k (O2 sort + limit) with deterministic tiebreak —
    // executes as TakeOrderedAndProject, no full sort.
    QueryDef(
      "q11_topk_global",
      (s, dir) => {
        import s.implicits._
        T.orders(s, dir)
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .select($"o_orderkey", $"o_totalprice")
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    // q12: rollup (A5 — the reference computes its hierarchy rollup
    // procedurally, utils/cloudflare.py:96-114; here it is one ROLLUP).
    QueryDef(
      "q12_rollup",
      (s, dir) => {
        import s.implicits._
        T.customer(s, dir)
          .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .rollup($"n_name", $"c_mktsegment")
          .agg(count(lit(1)).as("n_cust"), round(fixptSum($"c_acctbal", 2), 2).as("bal"))
      },
      Some("""SELECT n_name, c_mktsegment, count(*) AS n_cust,
             |  round(CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin)),

    // ------------------------------------------------------------------
    // q13: threshold binning via CASE chain — the duration color-class
    // binning of the reference's consumer (site/assets/js/map.js:192-202).
    QueryDef(
      "q13_case_bins",
      (s, dir) => {
        import s.implicits._
        T.orders(s, dir)
          .select(
            $"o_orderkey",
            when($"o_totalprice" < 100000.0, "small")
              .when($"o_totalprice" < 300000.0, "medium")
              .otherwise("large").as("price_bin"))
          .groupBy($"price_bin")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
             |            WHEN o_totalprice < 300000.0 THEN 'medium'
             |            ELSE 'large' END AS price_bin,
             |  count(*) AS n
             |FROM orders GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q14: string function bundle — zero-pad (F4), GEOID-style substring
    // split (F3 — utils/census.py:110-156), regex extract (F1).
    QueryDef(
      "q14_string_fns",
      (s, dir) => {
        import s.implicits._
        T.customer(s, dir)
          .select(
            $"c_custkey",
            lpad($"c_custkey".cast("string"), 15, "0").as("geoid"),
            regexp_extract($"c_name", "Customer#(\\d+)", 1).as("name_num"))
          .select(
            $"c_custkey",
            $"geoid",
            substring($"geoid", 1, 2).as("state"),
            substring($"geoid", 3, 3).as("county"),
            substring($"geoid", 6, 6).as("tract"),
            substring($"geoid", 12, 1).as("block_group"),
            substring($"geoid", 12, 4).as("block"),
            $"name_num")
      },
      Some("""SELECT c_custkey, geoid,
             |  substr(geoid, 1, 2) AS state,
             |  substr(geoid, 3, 3) AS county,
             |  substr(geoid, 6, 6) AS tract,
             |  substr(geoid, 12, 1) AS block_group,
             |  substr(geoid, 12, 4) AS block,
             |  name_num
             |FROM (SELECT c_custkey,
             |        lpad(CAST(c_custkey AS VARCHAR), 15, '0') AS geoid,
             |        regexp_extract(c_name, 'Customer#(\d+)', 1) AS name_num
             |      FROM customer) t""".stripMargin)),

    // ------------------------------------------------------------------
    // q15: date bucketing + grouped aggregate (monthly revenue).
    QueryDef(
      "q15_monthly_orders",
      (s, dir) => {
        import s.implicits._
        T.orders(s, dir)
          .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_orders"), round(fixptSum($"o_totalprice", 2), 2).as("total"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |  count(*) AS n_orders,
             |  round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total
             |FROM orders GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q16: row-range chunk slice (P10 — utils/times.py:289-301): global
    // order + row_number window + range filter. At scale the chunk id is
    // precomputed and this becomes a partition filter (see routing ops).
    QueryDef(
      "q16_chunk_slice",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"o_orderkey")
        T.orders(s, dir)
          .select($"o_orderkey", $"o_totalprice")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" > 1000 && $"rn" <= 2000)
      },
      Some("""SELECT o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_orderkey, o_totalprice,
             |    row_number() OVER (ORDER BY o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn > 1000 AND rn <= 2000""".stripMargin)),

    // ------------------------------------------------------------------
    // q17: grouped weighted mean with zero-weight fallback (A1 —
    // utils/census.py:9-47): pure built-ins, no UDAF, single aggregate pass.
    QueryDef(
      "q17_weighted_mean",
      (s, dir) => {
        import s.implicits._
        // prices and discounts quantized to exact ints per row so the
        // ratio-of-sums is computed from identical operands in both engines
        // (the zero-weight fallback is `avg` — census.py:32-35 semantics).
        T.lineitem(s, dir)
          .select(
            $"l_orderkey",
            fixpt($"l_extendedprice", 2).as("pc"),
            fixpt($"l_discount", 2).as("dc"))
          .groupBy($"l_orderkey")
          .agg(
            // raw ratio of exact integer sums — bit-identical across
            // engines; rounding would reintroduce boundary mismatches.
            when(sum($"dc") === 0L, sum($"pc").cast("double") / count(lit(1)) / 100.0)
              .otherwise(sum($"pc" * $"dc").cast("double") / sum($"dc").cast("double") / 100.0)
              .as("wavg_price"))
      },
      Some("""SELECT l_orderkey,
             |  CASE WHEN sum(dc) = 0 THEN CAST(sum(pc) AS DOUBLE) / count(*) / 100.0
             |       ELSE CAST(sum(pc * dc) AS DOUBLE) / CAST(sum(dc) AS DOUBLE) / 100.0
             |  END AS wavg_price
             |FROM (SELECT l_orderkey,
             |        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
             |        CAST(round(l_discount * 100, 0) AS BIGINT) AS dc
             |      FROM lineitem) t
             |GROUP BY l_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q18: JSON field extraction over the events property bag + grouped
    // aggregate (engine surface for semi-structured columns).
    QueryDef(
      "q18_json_events",
      (s, dir) => {
        import s.implicits._
        T.events(s, dir)
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            round(fixptSum($"value", 2), 2).as("total_value"),
            sum(get_json_object($"props", "$.k").cast("long")).as("sum_k"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total_value,
             |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
             |FROM events GROUP BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q19: time-bucketed aggregate over the event stream table (batch
    // equivalent of the streaming tumbling window). `ts` is read as raw
    // nanos (see Tables.load), so the hour bucket is exact integer
    // arithmetic: `ts div 3.6e12 * 3600` = epoch seconds of the hour.
    QueryDef(
      "q19_events_hourly",
      (s, dir) => {
        import s.implicits._
        T.events(s, dir)
          .groupBy(
            (expr("ts div 3600000000000") * 3600).as("hour_epoch"),
            $"event_type")
          .agg(
            count(lit(1)).as("n"),
            (fixptSum($"value", 2) / count(lit(1))).as("avg_value"))
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q20: multi-join fact query (J2/J3/J6 shape): lineitem ⋈ orders ⋈
    // customer ⋈ nation with selective dim filter; dims broadcast, fact
    // joins shuffle on the same key. Headline bench query.
    QueryDef(
      "q20_fact_join",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
          .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .filter($"c_mktsegment" === "BUILDING")
          .groupBy($"n_name")
          .agg(
            round(fixptSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
      },
      Some("""SELECT n_name,
             |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
             |  count(*) AS n_lineitems
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY n_name""".stripMargin),
      headline = true),

    // ------------------------------------------------------------------
    // q21: CUBE grouping sets (extension beyond the reference's single
    // procedural rollup).
    QueryDef(
      "q21_cube",
      (s, dir) => {
        import s.implicits._
        T.orders(s, dir)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(fixptSum($"o_totalprice", 2), 2).as("total"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ------------------------------------------------------------------
    // q22: gap-based sessionization (lag → flag → running-sum session id
    // → session aggregate). Timestamps at µs resolution on both engines
    // (DuckDB truncates the parquet nanos to µs on read).
    QueryDef(
      "q22_sessionize",
      (s, dir) => graft.operators.Sessionize.batch(T.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CAST(round(value * 100, 0) AS BIGINT) AS vc
             |  FROM events),
             |m AS (
             |  SELECT user_id, us, vc,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_s,
             |    event_id
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |s AS (
             |  SELECT user_id, us, vc,
             |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM m)
             |SELECT user_id, session_id,
             |  min(us) // 1000000 AS session_start,
             |  count(*) AS n_events,
             |  CAST(sum(vc) AS DOUBLE) / 100.0 AS total_value
             |FROM s GROUP BY user_id, session_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q23: correlated-scalar-subquery shape (TPC-H Q17): lineitems below
    // half their part's average quantity. Catalyst decorrelates to a
    // grouped self-join; avg of integer-valued quantities is exact.
    QueryDef(
      "q23_below_avg",
      (s, dir) => {
        import s.implicits._
        val li = T.lineitem(s, dir)
        val avgq = li.groupBy($"l_partkey").agg(avg($"l_quantity").as("aq"))
        li.join(avgq, "l_partkey")
          .filter($"l_quantity" < $"aq" * 0.5)
          .agg(
            count(lit(1)).as("n_items"),
            round(fixptSum($"l_extendedprice", 2), 2).as("total_price"))
      },
      Some("""SELECT count(*) AS n_items,
             |  round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total_price
             |FROM lineitem l
             |WHERE l_quantity < 0.5 * (SELECT avg(l_quantity) FROM lineitem l2
             |                          WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // ------------------------------------------------------------------
    // q24: exact distinct counting per group (the approx HLL variant is
    // asserted within error bounds in AggSpec — sketches don't
    // hash-match across engines).
    QueryDef(
      "q24_count_distinct",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_supps"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ------------------------------------------------------------------
    // q25: backward as-of join (purchase → most recent signup ≤ 1h by the
    // same user) via the single-shuffle union-and-sweep plan — funnel
    // attribution without a range join.
    QueryDef(
      "q25_asof_funnel",
      (s, dir) => {
        import s.implicits._
        val e = T.events(s, dir).select(
          $"user_id", $"event_id", $"event_type", expr("ts div 1000").as("us"))
        graft.operators.AsOfJoin.backward(
          e.filter($"event_type" === "purchase").select($"user_id", $"event_id", $"us"),
          e.filter($"event_type" === "signup").select($"user_id", $"us"),
          key = "user_id", ts = "us", tolerance = 3600L * 1000000L)
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
             |SELECT p.user_id, p.event_id, p.us,
             |  (SELECT max(s.us) FROM e s
             |   WHERE s.event_type = 'signup' AND s.user_id = p.user_id
             |     AND s.us <= p.us AND p.us - s.us <= 3600000000) AS asof_ts
             |FROM e p WHERE p.event_type = 'purchase'""".stripMargin)),

    // ------------------------------------------------------------------
    // q147: NATIVE as-of join — the whole-operator Catalyst extension
    // (AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec via
    // GraftExtensions): q25's funnel but attaching the ENTIRE matched
    // signup row (user, time, event id), which the union-sweep can't do
    // without a window per payload column. Equal-time signups resolve by
    // event id (tie-break ordering), so the full payload hash-verifies.
    QueryDef(
      "q147_asof_native",
      (s, dir) => {
        import s.implicits._
        val e = T.events(s, dir).select(
          $"user_id", $"event_id", $"event_type", expr("ts div 1000").as("us"))
        val p = e.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"us")
        val sgn = e.filter($"event_type" === "signup").select(
          $"user_id".as("s_user"), $"event_id".as("s_event"), $"us".as("s_us"))
        graft.operators.AsOfJoin.nativeBackward(p, sgn,
          "user_id", "us", "s_user", "s_us",
          tolerance = 3600L * 1000000L, tieBreak = Seq("s_event"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
             |p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase'),
             |s AS (SELECT user_id AS s_user, event_id AS s_event, us AS s_us
             |      FROM e WHERE event_type = 'signup'),
             |m AS (
             |  SELECT p.event_id AS pe, s.s_user, s.s_event, s.s_us,
             |    row_number() OVER (PARTITION BY p.event_id
             |                       ORDER BY s.s_us DESC, s.s_event DESC) AS rn
             |  FROM p JOIN s ON s.s_user = p.user_id
             |    AND s.s_us <= p.us AND p.us - s.s_us <= 3600000000)
             |SELECT p.user_id, p.event_id, p.us, m.s_user, m.s_event, m.s_us
             |FROM p LEFT JOIN m ON m.pe = p.event_id AND m.rn = 1""".stripMargin),
      headline = true),

    // ------------------------------------------------------------------
    // q148: lead/lag event gaps — per-user previous/next event time and
    // a >30-minute inactivity-gap flag (the sessionization primitive
    // exposed directly). Integer micros end to end; (us, event_id)
    // ordering makes equal-time neighbors deterministic in both engines.
    QueryDef(
      "q148_event_gaps",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        T.events(s, dir)
          .select($"user_id", $"event_id", $"event_type", expr("ts div 1000").as("us"))
          .withColumn("prev_us", lag($"us", 1).over(w))
          .withColumn("next_us", lead($"us", 1).over(w))
          .withColumn("gap_us", $"us" - $"prev_us")
          .withColumn("new_session",
            ($"prev_us".isNull || $"us" - $"prev_us" > 1800L * 1000000L).cast("int"))
      },
      Some("""SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             |  lag(epoch_us(ts)) OVER w AS prev_us,
             |  lead(epoch_us(ts)) OVER w AS next_us,
             |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
             |  CAST(CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |       THEN 1 ELSE 0 END AS INT) AS new_session
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin)),

    // ------------------------------------------------------------------
    // q150: NATIVE session windows — Spark's `session_window(ts, gap)`
    // merge-on-overlap aggregation (the built-in counterpart of the
    // custom flatMapGroupsWithState sessionizer, q22/Sessionize). The
    // oracle replays the exact merge rule as island detection: a new
    // session starts when ts − prev ≥ gap (windows [t, t+gap) that do
    // NOT overlap stay separate), session end = last event + gap.
    // unix_micros keeps full precision, so boundaries hash-verify.
    QueryDef(
      "q150_session_window",
      (s, dir) => {
        import s.implicits._
        T.events(s, dir)
          .withColumn("t", timestamp_micros(expr("ts div 1000")))
          .groupBy($"user_id", session_window($"t", "30 minutes"))
          .agg(count(lit(1)).as("n"), min($"event_id").as("first_event"))
          .select($"user_id",
            unix_micros($"session_window.start").as("sess_start"),
            unix_micros($"session_window.end").as("sess_end"),
            $"n", $"first_event")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |f AS (
             |  SELECT user_id, event_id, us,
             |    CASE WHEN lag(us) OVER w IS NULL
             |         OR us - lag(us) OVER w >= 1800000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id, min(us) AS sess_start,
             |  max(us) + 1800000000 AS sess_end,
             |  count(*) AS n, min(event_id) AS first_event
             |FROM g GROUP BY user_id, sid""".stripMargin)),

    // ------------------------------------------------------------------
    // q151: VARIANT JSON querying (Spark 4 VariantType) — parse_json
    // into the binary variant encoding, typed variant_get extraction,
    // filter + aggregate on the extracted path. The semi-structured
    // counterpart of q18's get_json_object / q28's from_json.
    QueryDef(
      "q151_variant_json",
      (s, dir) => {
        import s.implicits._
        T.events(s, dir)
          .withColumn("v", parse_json($"props"))
          .withColumn("k", expr("variant_get(v, '$.k', 'long')"))
          .filter($"k" >= 50)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
            max($"k").as("max_k"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
             |FROM events
             |WHERE CAST(props->>'$.k' AS BIGINT) >= 50
             |GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q26: pivot (wide conditional aggregation); empty cells coalesced to
    // 0 so the shape is engine-independent.
    QueryDef(
      "q26_pivot",
      (s, dir) => {
        import s.implicits._
        T.orders(s, dir)
          .groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(
            $"o_orderpriority",
            coalesce($"F", lit(0L)).as("f_cnt"),
            coalesce($"O", lit(0L)).as("o_cnt"),
            coalesce($"P", lit(0L)).as("p_cnt"))
      },
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
             |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
             |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // q27: one-pass table profile (ANALYZE-style stats: counts, distincts,
    // ranges, null/zero shares) — the metadata-collection surface.
    QueryDef(
      "q27_profile",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir).agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          count(when($"l_discount" === 0.0, 1)).as("n_zero_disc"),
          // dates as ISO strings: date32 vs timestamp objects differ
          // across engines even when values agree
          date_format(min($"l_shipdate"), "yyyy-MM-dd").as("min_ship"),
          date_format(max($"l_shipdate"), "yyyy-MM-dd").as("max_ship"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  min(l_quantity) AS min_qty,
             |  max(l_quantity) AS max_qty,
             |  count(CASE WHEN l_discount = 0.0 THEN 1 END) AS n_zero_disc,
             |  strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
             |  strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
             |FROM lineitem""".stripMargin)),

    // ------------------------------------------------------------------
    // q28: schema-on-read JSON parsing (from_json to a typed struct — the
    // semi-structured ingestion path, vs q18's path extraction).
    QueryDef(
      "q28_from_json",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(StructField("k", LongType)))
        T.events(s, dir)
          .withColumn("parsed", from_json($"props", schema))
          .groupBy(($"parsed.k" % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod, count(*) AS n
             |FROM events GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q60: running total (window frame rows-unbounded-preceding) in exact
    // cents — cumulative revenue per customer over order dates.
    QueryDef(
      "q60_running_total",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.orders(s, dir)
          .select($"o_custkey", $"o_orderkey", $"o_orderdate",
            fixpt($"o_totalprice", 2).as("pc"))
          .withColumn("running_total",
            (sum($"pc").over(w).cast("double") / 100.0))
          .select($"o_custkey", $"o_orderkey", $"running_total")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_total
             |FROM orders""".stripMargin)),

    // ------------------------------------------------------------------
    // q61: set operators proper (INTERSECT/EXCEPT — absent from the
    // reference, §2.7; required engine surface).
    QueryDef(
      "q61_setops",
      (s, dir) => {
        import s.implicits._
        val li = T.lineitem(s, dir)
        val returned = li.filter($"l_returnflag" === "R").select($"l_partkey")
        val open = li.filter($"l_linestatus" === "O").select($"l_partkey")
        returned.intersect(open).select($"l_partkey", lit("both").as("bucket"))
          .unionByName(
            returned.except(open).select($"l_partkey", lit("returned_only").as("bucket")))
      },
      Some("""SELECT l_partkey, 'both' AS bucket FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  INTERSECT
             |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O') t
             |UNION ALL
             |SELECT l_partkey, 'returned_only' AS bucket FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  EXCEPT
             |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O') t""".stripMargin)),

    // ------------------------------------------------------------------
    // q91: bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) — the
    // multiplicity-preserving complement of q61: each part key appears
    // min(na, nb) / max(na − nb, 0) times.
    QueryDef(
      "q91_setops_all",
      (s, dir) => {
        import s.implicits._
        val li = T.lineitem(s, dir)
        val returned = li.filter($"l_returnflag" === "R").select($"l_partkey")
        val open = li.filter($"l_linestatus" === "O").select($"l_partkey")
        returned.intersectAll(open).select($"l_partkey", lit("both").as("bucket"))
          .unionByName(
            returned.exceptAll(open).select($"l_partkey", lit("returned_only").as("bucket")))
      },
      Some("""SELECT l_partkey, 'both' AS bucket FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  INTERSECT ALL
             |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O') t
             |UNION ALL
             |SELECT l_partkey, 'returned_only' AS bucket FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  EXCEPT ALL
             |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O') t""".stripMargin)),

    // ------------------------------------------------------------------
    // q62: generator/UDTF surface — explode word tokens, global top-20 by
    // (count desc, word) with deterministic tiebreak.
    QueryDef(
      "q62_word_counts",
      (s, dir) => {
        import s.implicits._
        T.documents(s, dir)
          .select(explode(split($"text", " ")).as("word"))
          .groupBy($"word")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"word")
          .limit(20)
      },
      Some("""SELECT word, count(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
             |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q63 (TPC-H Q4 shape): priority counts over orders having at least
    // one qualifying lineitem (EXISTS → left-semi).
    QueryDef(
      "q63_priority_exists",
      (s, dir) => {
        import s.implicits._
        val big = T.lineitem(s, dir).filter($"l_quantity" >= 49.0).select($"l_orderkey")
        T.orders(s, dir)
          .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
             |GROUP BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // q64 (TPC-H Q5 shape): local-supplier revenue per nation — the
    // customer and supplier must share a nation; dims broadcast, fact
    // chain shuffles on one key each.
    QueryDef(
      "q64_local_revenue",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
          .join(T.supplier(s, dir), $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
          .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(T.region(s, dir)), $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "ASIA")
          .groupBy($"n_name")
          .agg(round(fixptSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4), 2).as("revenue"))
      },
      Some("""SELECT n_name,
             |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q65 (TPC-H Q16 shape): supplier variety per (brand, type) with an
    // exclusion predicate and distinct counting.
    QueryDef(
      "q65_supplier_variety",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .join(T.part(s, dir), $"l_partkey" === $"p_partkey")
          .filter($"p_brand" =!= "Brand#1" && !$"p_type".startsWith("PROMO"))
          .groupBy($"p_brand", $"p_type", $"p_size")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
             |GROUP BY p_brand, p_type, p_size""".stripMargin)),

    // ------------------------------------------------------------------
    // q66 (TPC-H Q10 shape): returned-item revenue, top-20 customers,
    // deterministic tiebreak on the exact cents total.
    QueryDef(
      "q66_returned_revenue",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .filter($"l_returnflag" === "R")
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
          .groupBy($"c_custkey", $"c_name")
          .agg(sum(fixpt($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)).as("rev4"))
          .orderBy($"rev4".desc, $"c_custkey")
          .limit(20)
          .select($"c_custkey", $"c_name",
            ($"rev4".cast("double") / 10000.0).as("revenue"))
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(rev4 AS DOUBLE) / 10000.0 AS revenue
             |FROM (
             |  SELECT c_custkey, c_name,
             |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS rev4
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  WHERE l_returnflag = 'R'
             |  GROUP BY c_custkey, c_name) t
             |ORDER BY rev4 DESC, c_custkey LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q67: salted two-phase aggregation on a hot-key distribution —
    // byte-identical to the plain groupBy (integer sums are salt-order
    // independent), so the skew technique itself sits on the oracle gate.
    QueryDef(
      "q67_salted_agg",
      (s, dir) => {
        import s.implicits._
        val skewed = T.lineitem(s, dir).select(
          // l_orderkey % 7 == 0 rows all land on one hot key
          when($"l_orderkey" % 7 === 0, lit(0L)).otherwise($"l_partkey" % 50 + 1).as("k"),
          fixpt($"l_extendedprice", 2).as("pc"))
        graft.operators.Skew.saltedAgg(skewed, "k", salts = 8, sums = Seq("pc"))
          .select($"k", $"n_rows", ($"sum_pc".cast("double") / 100.0).as("total"))
      },
      Some("""SELECT k, count(*) AS n_rows,
             |  CAST(sum(pc) AS DOUBLE) / 100.0 AS total
             |FROM (SELECT CASE WHEN l_orderkey % 7 = 0 THEN 0
             |             ELSE l_partkey % 50 + 1 END AS k,
             |        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
             |      FROM lineitem) t
             |GROUP BY k""".stripMargin)),

    // ------------------------------------------------------------------
    // q68 (TPC-H Q6 shape): single-scan forecast-revenue filter+sum —
    // every predicate pushed to the parquet scan.
    QueryDef(
      "q68_forecast_revenue",
      (s, dir) => {
        import s.implicits._
        T.lineitem(s, dir)
          .filter(
            $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24.0)
          .agg(round(fixptSum($"l_extendedprice" * $"l_discount", 4), 2).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT
             |  round(CAST(sum(CAST(round(l_extendedprice * l_discount * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24.0""".stripMargin)),

    // ------------------------------------------------------------------
    // q69 (TPC-H Q12 shape): conditional counts per line status by order
    // priority class.
    QueryDef(
      "q69_priority_class",
      (s, dir) => {
        import s.implicits._
        val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        T.lineitem(s, dir)
          .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .filter($"l_quantity" >= 30.0)
          .groupBy($"l_linestatus")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_quantity >= 30.0
             |GROUP BY l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q84: exact interpolated percentiles (quantile_cont semantics) per
    // group. Both engines use rank = p·(n−1) with linear interpolation;
    // run on integer cents with dyadic fractions (.25/.5/.75) every
    // arithmetic step is exact, so the one-pass sort-based percentile is
    // hash-stable cross-engine.
    QueryDef(
      "q84_percentiles",
      (s, dir) => {
        import s.implicits._
        val cents = expr("CAST(round(o_totalprice * 100, 0) AS LONG)")
        T.orders(s, dir)
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            (percentile(cents, lit(0.25)) / 100.0).as("p25"),
            (percentile(cents, lit(0.5)) / 100.0).as("p50"),
            (percentile(cents, lit(0.75)) / 100.0).as("p75"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.25) / 100.0 AS p25,
             |  quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.5) / 100.0 AS p50,
             |  quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.75) / 100.0 AS p75
             |FROM orders GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q85: arbitrary GROUPING SETS (beyond q12's rollup / q21's cube)
    // with grouping() indicator columns — the general grouping-sets
    // contract, via the SQL surface.
    QueryDef(
      "q85_grouping_sets",
      (s, dir) => {
        T.orders(s, dir).createOrReplaceTempView("orders_q85")
        s.sql("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
                |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
                |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
                |FROM orders_q85
                |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                |  (o_orderpriority, o_orderstatus), ())""".stripMargin)
      },
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
             |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
             |  (o_orderpriority, o_orderstatus), ())""".stripMargin)),

    // ------------------------------------------------------------------
    // q59: F8/F9 utility scalar functions (utils.py:31-43,
    // create_blockloc.py:35) lifted to engine columns. sz_small spans
    // B/KB, sz_large the mid units, sz_huge forces the TB and
    // past-the-unit-list null branches. Cross-engine float parity: /1024
    // steps are exact power-of-two divisions, and the 2-decimal format
    // is integer-cents divmod in BOTH engines (Java %.2f and C printf
    // disagree when the shortest decimal repr lands on a .xx5 tie).
    QueryDef(
      "q59_utility_fns",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UtilityFns._
        T.orders(s, dir).select(
          $"o_orderkey",
          humanSize($"o_totalprice").as("sz_small"),
          humanSize($"o_totalprice" * $"o_orderkey").as("sz_large"),
          humanSize($"o_totalprice" * lit(1e13)).as("sz_huge"),
          humanTime($"o_orderkey" % 100000L).as("elapsed"),
          decadeFloor(year($"o_orderdate")).as("pop_year"))
      },
      Some {
        def f2(v: String, unit: String) =
          s"CAST(CAST(floor(($v)*100 + 0.5) AS BIGINT) // 100 AS VARCHAR) || '.' || " +
            s"lpad(CAST(CAST(floor(($v)*100 + 0.5) AS BIGINT) % 100 AS VARCHAR), 2, '0') || ' $unit'"
        def sz(v: String) =
          s"""CASE WHEN $v < 1024 THEN ${f2(s"CAST($v AS DOUBLE)", "B")}
             |  WHEN $v/1024.0 < 1024 THEN ${f2(s"$v/1024.0", "KB")}
             |  WHEN $v/1048576.0 < 1024 THEN ${f2(s"$v/1048576.0", "MB")}
             |  WHEN $v/1073741824.0 < 1024 THEN ${f2(s"$v/1073741824.0", "GB")}
             |  WHEN $v/1099511627776.0 < 1024 THEN ${f2(s"$v/1099511627776.0", "TB")}
             |  END""".stripMargin
        s"""SELECT o_orderkey,
           |  ${sz("o_totalprice")} AS sz_small,
           |  ${sz("(o_totalprice * o_orderkey)")} AS sz_large,
           |  ${sz("(o_totalprice * 1e13)")} AS sz_huge,
           |  CAST((o_orderkey % 100000) // 3600 AS VARCHAR) || 'H ' ||
           |    CAST((o_orderkey % 100000) % 3600 // 60 AS VARCHAR) || 'M ' ||
           |    CAST((o_orderkey % 100000) % 60 AS VARCHAR) || 's' AS elapsed,
           |  CAST((year(o_orderdate) // 10) * 10 AS INT) AS pop_year
           |FROM orders""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q131: KMV distinct-count sketch (custom TypedImperativeAggregate,
    // plans/KmvSketch.scala) — per-group state bounded at k longs with
    // map-side partial merge, vs count(distinct)'s shuffle of every
    // distinct value. The md5-u32 hash makes the SKETCH itself
    // engine-portable: the oracle rebuilds the k-minimum set in SQL and
    // reproduces the (k−1)/u estimate bit-for-bit — an approximate
    // operator that hash-verifies. est_cust exercises the estimator path
    // (>128 distinct custkeys per status), est_prio the exact path
    // (5 priorities < k=8); the exact distinct counts ride along.
    QueryDef(
      "q131_kmv_distinct",
      (s, dir) => {
        import s.implicits._
        import graft.plans.KmvSketchAgg.kmvEstimate
        T.orders(s, dir)
          .groupBy($"o_orderstatus")
          .agg(
            kmvEstimate($"o_custkey", 128).as("est_cust"),
            kmvEstimate($"o_orderpriority", 8).as("est_prio"),
            countDistinct($"o_custkey").as("n_cust"),
            countDistinct($"o_orderpriority").as("n_prio"))
      },
      Some {
        def u32(e: String) =
          (0 until 8).map { i =>
            val mul = 1L << (4 * (7 - i))
            s"(strpos('0123456789abcdef', substr(md5($e), ${i + 1}, 1)) - 1) * $mul"
          }.mkString("(", " + ", ")")
        def est(hashExpr: String, k: Int, as: String) =
          s"""(SELECT o_orderstatus,
             |  CASE WHEN max(n) < $k THEN CAST(max(n) AS DOUBLE)
             |       ELSE (${k - 1} * 4294967296.0) /
             |            CAST(max(CASE WHEN rn = $k THEN h END) AS DOUBLE) END AS $as
             |FROM (
             |  SELECT o_orderstatus, h,
             |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) AS rn,
             |    count(*) OVER (PARTITION BY o_orderstatus) AS n
             |  FROM (SELECT DISTINCT o_orderstatus, $hashExpr AS h FROM orders) d) r
             |GROUP BY 1)""".stripMargin
        s"""WITH ec AS ${est(u32("CAST(o_custkey AS VARCHAR)"), 128, "est_cust")},
           |ep AS ${est(u32("o_orderpriority"), 8, "est_prio")},
           |x AS (
           |  SELECT o_orderstatus,
           |    count(DISTINCT o_custkey) AS n_cust,
           |    count(DISTINCT o_orderpriority) AS n_prio
           |  FROM orders GROUP BY 1)
           |SELECT x.o_orderstatus, ec.est_cust, ep.est_prio, x.n_cust, x.n_prio
           |FROM x
           |JOIN ec ON x.o_orderstatus = ec.o_orderstatus
           |JOIN ep ON x.o_orderstatus = ep.o_orderstatus""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q134: interval-overlap join (operators/IntervalJoin.scala) —
    // variable-length ranges bucketized into fixed-width cells so
    // candidates come from a bucket equi-join, never a nested loop
    // (PlanSpec asserts no CartesianProduct/BNLJ). Generalizes
    // BandJoinRule's fixed band to per-row intervals (SCD2 validity,
    // event spans). The oracle is the brute-force overlap predicate —
    // the exact pair set the bucketed plan must reproduce.
    QueryDef(
      "q134_interval_join",
      (s, dir) => {
        import s.implicits._
        val a = T.lineitem(s, dir)
          .filter($"l_orderkey" % 50 === 0)
          .select(
            ($"l_orderkey" * 10 + $"l_linenumber").cast("long").as("id"),
            (($"l_partkey" % 997) * 7).cast("long").as("start"),
            (($"l_partkey" % 997) * 7 + $"l_quantity".cast("long")).cast("long").as("end"))
        val b = T.part(s, dir).select(
          $"p_partkey".cast("long").as("id"),
          (($"p_partkey" % 900) * 8).cast("long").as("start"),
          (($"p_partkey" % 900) * 8 + $"p_size" * 2).cast("long").as("end"))
        graft.operators.IntervalJoin.overlap(a, b, bucketWidth = 64)
      },
      Some("""WITH a AS (
             |  SELECT l_orderkey * 10 + l_linenumber AS a_id,
             |    (l_partkey % 997) * 7 AS a_start,
             |    (l_partkey % 997) * 7 + CAST(l_quantity AS BIGINT) AS a_end
             |  FROM lineitem WHERE l_orderkey % 50 = 0),
             |b AS (
             |  SELECT p_partkey AS b_id,
             |    (p_partkey % 900) * 8 AS b_start,
             |    (p_partkey % 900) * 8 + p_size * 2 AS b_end
             |  FROM part)
             |SELECT a_id, b_id,
             |  GREATEST(a_start, b_start) AS ov_start,
             |  LEAST(a_end, b_end) AS ov_end,
             |  LEAST(a_end, b_end) - GREATEST(a_start, b_start) + 1 AS ov_len
             |FROM a JOIN b ON a_start <= b_end AND b_start <= a_end""".stripMargin)),

    // ------------------------------------------------------------------
    // q141: HOPPING (sliding) window aggregation via Spark's native
    // `window(ts, "1 hour", "15 minutes")` — each event lands in exactly
    // windowDuration/slide = 4 windows, epoch-aligned. The oracle
    // enumerates the same 4 window starts arithmetically (an event at
    // micros t belongs to starts (t div 900e6 − k)·900, k = 0..3), so
    // Spark's window-assignment semantics are themselves what is
    // hash-verified. Counts and distinct counts only — integers, no
    // cross-engine float risk.
    QueryDef(
      "q141_hopping_window",
      (s, dir) => {
        import s.implicits._
        T.events(s, dir)
          .withColumn("t", timestamp_micros(expr("ts div 1000")))
          .groupBy(window($"t", "1 hour", "15 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("users"))
          .select(unix_timestamp($"window.start").as("win_start"),
            $"event_type", $"n", $"users")
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) AS tus, event_type, user_id FROM events),
             |w AS (
             |  SELECT (tus // 900000000 - k) * 900 AS win_start,
             |         event_type, user_id
             |  FROM ev, (SELECT unnest([0, 1, 2, 3]) AS k) ks)
             |SELECT win_start, event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS users
             |FROM w GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q152: EXACT per-group quantiles with no global sort
    // (operators/Stats.exactQuantiles) — histogram selection: count/min/
    // max pass, G×B bin histogram locates the ceil(q·n) rank's bin, and
    // only that bin's ~n/B rows get a row_number. percentile_disc
    // semantics mean the answer is an actual data element, so the double
    // column hash-verifies; the oracle computes the same ranks by brute
    // row_number over the full sort DuckDB can afford at sf0.01.
    QueryDef(
      "q152_exact_quantiles",
      (s, dir) => graft.operators.Stats.exactQuantiles(
        T.lineitem(s, dir), "l_extendedprice", "l_returnflag",
        Seq(0.25, 0.5, 0.75, 0.95)),
      headline = true,
      oracle = Some("""WITH r AS (
             |  SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS v,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
             |    count(*) OVER (PARTITION BY l_returnflag) AS n
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
             |SELECT grp, q, v AS value
             |FROM r JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q) qs
             |  ON rk = CAST(ceil(q * n) AS BIGINT)""".stripMargin)),

    // ------------------------------------------------------------------
    // q153: robust outlier detection (Stats.madOutliers) — rows whose
    // |value − median| > 3·MAD per event_type. Both medians ride the
    // q152 histogram-selection operator (two selections, never a
    // per-group sort); deviations/thresholds are identical double
    // formulas on both engines, and the emitted value is a raw column,
    // so the row set hash-verifies exactly.
    QueryDef(
      "q153_outlier_mad",
      (s, dir) => graft.operators.Stats.madOutliers(
        T.events(s, dir), "event_id", "value", "event_type", k = 3.0),
      Some("""WITH e AS (
             |  SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
             |  FROM events WHERE value IS NOT NULL),
             |m AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n FROM e),
             |med AS (SELECT event_type, v AS med FROM m
             |        WHERE rk = CAST(ceil(0.5 * n) AS BIGINT)),
             |d AS (
             |  SELECT e.event_id, e.event_type, e.v, abs(e.v - med.med) AS dev
             |  FROM e JOIN med USING (event_type)),
             |m2 AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n FROM d),
             |mad AS (SELECT event_type, dev AS mad FROM m2
             |        WHERE rk = CAST(ceil(0.5 * n) AS BIGINT))
             |SELECT d.event_id, d.event_type, d.v AS value
             |FROM d JOIN mad USING (event_type)
             |WHERE d.dev > 3.0 * mad.mad""".stripMargin)),

    // ------------------------------------------------------------------
    // q154: within-session event-type bigrams (Sessionize.bigrams) — the
    // order-1 transition table over q22's session semantics. The session
    // window and the lead() ride ONE user_id exchange (the session
    // partition is a finer key), then a type×type aggregate. Pure counts.
    QueryDef(
      "q154_session_bigrams",
      (s, dir) => graft.operators.Sessionize.bigrams(T.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
             |m AS (
             |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
             |      OR us - lag(us) OVER w > 1800000000
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |s AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM m),
             |p AS (
             |  SELECT event_type AS a, lead(event_type) OVER (
             |      PARTITION BY user_id, session_id ORDER BY us, event_id) AS b
             |  FROM s)
             |SELECT a, b, count(*) AS n FROM p WHERE b IS NOT NULL
             |GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q156: bloom-pruned semi join (plans/BloomPrune) — the explicit form
    // of Spark's runtime row-level filtering: the urgent-orders keys
    // become a broadcast bloom filter probed INSIDE the fact scan's
    // codegen (BloomMightContainLong), so ~99% of non-matching lineitems
    // never reach the semi-join exchange; the join then removes the
    // bloom's false positives. Output = the plain semi join, aggregated
    // with the fixed-point sum convention.
    QueryDef(
      "q156_bloom_semi_join",
      (s, dir) => {
        import s.implicits._
        val urgent = T.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT")
        graft.plans.BloomPrune.semiJoin(
            T.lineitem(s, dir), urgent, "l_orderkey", "o_orderkey")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(fixptSum($"l_extendedprice", 2), 2).as("revenue"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
             |FROM lineitem
             |WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
             |GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q157: time-series resampling with linear interpolation
    // (operators/Resample) — each user's irregular stream onto an hourly
    // grid, gap-filled from the surrounding observations. Join-free: the
    // grid unions with the events and ONE user-partitioned window pass
    // finds prev/next via IGNORE NULLS; the interpolation formula is
    // written with identical association + casts in the oracle, so the
    // doubles are IEEE-bit-equal.
    QueryDef(
      "q157_resample_interpolate",
      (s, dir) => graft.operators.Resample.hourlyInterpolate(T.events(s, dir)),
      headline = true,
      oracle = Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CAST(value AS DOUBLE) AS v FROM events),
             |b AS (SELECT user_id, min(us) AS lo, max(us) AS hi FROM e GROUP BY 1),
             |g AS (
             |  SELECT user_id,
             |    unnest(generate_series((lo + 3599999999) // 3600000000,
             |                           hi // 3600000000)) * 3600000000 AS us
             |  FROM b
             |  WHERE (lo + 3599999999) // 3600000000 <= hi // 3600000000),
             |u AS (
             |  SELECT user_id, us, 0 AS pos, event_id AS ord, v FROM e
             |  UNION ALL
             |  SELECT user_id, us, 1, 0, NULL FROM g),
             |w AS (
             |  SELECT user_id, us, pos,
             |    last_value(v IGNORE NULLS) OVER win_b AS pv,
             |    last_value(CASE WHEN pos = 0 THEN us END IGNORE NULLS) OVER win_b AS pts,
             |    first_value(v IGNORE NULLS) OVER win_f AS nv,
             |    first_value(CASE WHEN pos = 0 THEN us END IGNORE NULLS) OVER win_f AS nts
             |  FROM u
             |  WINDOW win_b AS (PARTITION BY user_id ORDER BY us, pos, ord
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         win_f AS (PARTITION BY user_id ORDER BY us, pos, ord
             |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, us AS grid_us,
             |  CASE WHEN nts IS NULL THEN pv
             |       ELSE pv + (nv - pv) * (CAST(us - pts AS DOUBLE) /
             |                              CAST(nts - pts AS DOUBLE)) END AS value
             |FROM w WHERE pos = 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q164: per-label embedding centroids (Stats.labelCentroids) —
    // element-wise vector aggregation where the shuffle carries G×dim
    // fixed-point longs (map-side partial sums), never vectors. The 1e-5
    // per-element quantization makes the sums order-independent, so the
    // centroid arrays hash-verify exactly; DuckDB replays via list
    // subscripting + an ordered string_agg repack. Both engines emit
    // the centroid as a comma-joined STRING (not a list column): the
    // harness canonicalizer sorts result cells and cannot hash array
    // cells, so the declared shape is scalar-only.
    QueryDef(
      "q164_label_centroids",
      (s, dir) => graft.operators.Stats
        .labelCentroids(T.embeddings(s, dir), "embedding", "label")
        .withColumn("centroid_fix",
          expr("array_join(transform(centroid_fix, x -> CAST(x AS STRING)), ',')")),
      Some("""WITH e AS (
             |  SELECT label, i - 1 AS pos,
             |    CAST(round(CAST(embedding[i] AS DOUBLE) * 100000, 0) AS BIGINT) AS fx
             |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s),
             |a AS (
             |  SELECT label, pos, CAST(sum(fx) AS BIGINT) AS s, count(*) AS c
             |  FROM e GROUP BY 1, 2)
             |SELECT label, max(c) AS n,
             |  string_agg(CAST(s AS VARCHAR), ',' ORDER BY pos) AS centroid_fix
             |FROM a GROUP BY label""".stripMargin)),

    // ------------------------------------------------------------------
    // q165: equi-depth quantile banding (Stats.quantileBins over q152's
    // histogram-selection boundaries) — every lineitem tagged with its
    // per-returnflag price quartile (ties → lower band), then the band
    // revenue profile. Boundary computation never sorts a group; the
    // tagging is a broadcast join + map-only comparison chain.
    QueryDef(
      "q165_quantile_bins",
      (s, dir) => {
        import s.implicits._
        graft.operators.Stats.quantileBins(
            T.lineitem(s, dir), "l_extendedprice", "l_returnflag")
          .groupBy($"l_returnflag", $"bin")
          .agg(count(lit(1)).as("n"),
            round(fixptSum($"l_extendedprice", 2), 2).as("revenue"))
      },
      Some("""WITH r AS (
             |  SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS v,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
             |    count(*) OVER (PARTITION BY l_returnflag) AS n
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |b AS (
             |  SELECT grp,
             |    max(CASE WHEN q = 0.25 THEN v END) AS b0,
             |    max(CASE WHEN q = 0.5 THEN v END) AS b1,
             |    max(CASE WHEN q = 0.75 THEN v END) AS b2
             |  FROM r JOIN (SELECT unnest([0.25, 0.5, 0.75]) AS q) qs
             |    ON rk = CAST(ceil(q * n) AS BIGINT)
             |  GROUP BY grp)
             |SELECT l.l_returnflag, 1 +
             |    (CASE WHEN CAST(l.l_extendedprice AS DOUBLE) > b.b0 THEN 1 ELSE 0 END) +
             |    (CASE WHEN CAST(l.l_extendedprice AS DOUBLE) > b.b1 THEN 1 ELSE 0 END) +
             |    (CASE WHEN CAST(l.l_extendedprice AS DOUBLE) > b.b2 THEN 1 ELSE 0 END) AS bin,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
             |FROM lineitem l JOIN b ON l.l_returnflag = b.grp
             |GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q166: grid-density clustering (operators/Cluster.gridDensity) —
    // DBSCAN's scalable cousin: ε-cells via integer division, core
    // cells by one map-combined count, adjacency as an 8-offset explode
    // + EQUI-join (never a band join), components via pointer-jump CC.
    // Cluster id = min cell id, which a DuckDB recursive CTE replays
    // exactly — the distributed CC's fixpoint is the hash-verified
    // property. Points are integer arithmetic over custkeys, so both
    // engines derive identical coordinates.
    QueryDef(
      "q166_grid_clusters",
      (s, dir) => {
        import s.implicits._
        val pts = T.customer(s, dir).select(
          ($"c_custkey" * 7919 % 10000).as("px"),
          ($"c_custkey" * 104729 % 10000).as("py"))
        graft.operators.Cluster.gridDensity(pts, "px", "py",
          cellSize = 500L, minPts = 6L)
      },
      Some("""WITH RECURSIVE pts AS (
             |  SELECT c_custkey * 7919 % 10000 AS px,
             |         c_custkey * 104729 % 10000 AS py
             |  FROM customer),
             |cells AS (
             |  SELECT px // 500 AS cx, py // 500 AS cy, count(*) AS n
             |  FROM pts GROUP BY 1, 2),
             |dense AS (
             |  SELECT cx, cy, n, (cx << 32) | (cy & 4294967295) AS id
             |  FROM cells WHERE n >= 6),
             |edges AS (
             |  SELECT a.id AS src, b.id AS dst FROM dense a JOIN dense b
             |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
             | AND a.id <> b.id),
             |reach(id, r) AS (
             |  SELECT id, id FROM dense
             |  UNION
             |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
             |SELECT d.cx, d.cy, m.root AS cluster, d.n
             |FROM dense d JOIN (
             |  SELECT id, min(r) AS root FROM reach GROUP BY id) m USING (id)""".stripMargin)),

    // ------------------------------------------------------------------
    // q167: ordered conversion funnel (Analytics.funnelCounts) —
    // signup → view → purchase with a 7-day per-step window, earliest-
    // qualifying-event re-anchoring. Each step is a user-keyed join on
    // a monotonically shrinking survivor set; integer counts only.
    QueryDef(
      "q167_funnel_steps",
      (s, dir) => graft.operators.Analytics.funnelCounts(
        T.events(s, dir), Seq("signup", "view", "purchase"),
        windowUs = 604800000000L),
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |s1 AS (SELECT user_id, min(us) AS t1 FROM e
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.us >= s1.t1
             |    AND e.us <= s1.t1 + 604800000000 GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(e.us) AS t3 FROM e JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.us >= s2.t2
             |    AND e.us <= s2.t2 + 604800000000 GROUP BY 1)
             |SELECT 1 AS step, 'signup' AS event_type,
             |  (SELECT count(*) FROM s1) AS users
             |UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin)),

    // ------------------------------------------------------------------
    // q168: retention cohort matrix (Analytics.retentionCohorts) —
    // cohort = first-activity week, distinct active users per
    // (cohort, age). Two aggregates + one user-keyed join.
    QueryDef(
      "q168_retention_cohorts",
      (s, dir) => graft.operators.Analytics.retentionCohorts(
        T.events(s, dir), bucketUs = 604800000000L),
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1)
             |SELECT c.cohort, e.wk - c.cohort AS age,
             |  count(DISTINCT e.user_id) AS active_users
             |FROM e JOIN c USING (user_id)
             |GROUP BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q169: session sequence-pattern match (Analytics.sessionsMatching,
    // MATCH_RECOGNIZE-lite) — sessions whose ordered event-type fold
    // matches `view (…)* purchase`. The emitted rows carry the FULL
    // ordered sequence string, so the per-session deterministic fold —
    // not just the match verdict — is what hash-verifies.
    QueryDef(
      "q169_sequence_match",
      (s, dir) => graft.operators.Analytics.sessionsMatching(
        T.events(s, dir), "view(,[a-z]+)*,purchase"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
             |m AS (
             |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
             |      OR us - lag(us) OVER w > 1800000000
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |s AS (
             |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS session_id
             |  FROM m),
             |q AS (
             |  SELECT user_id, session_id,
             |    string_agg(event_type, ',' ORDER BY us, event_id) AS seq
             |  FROM s GROUP BY 1, 2)
             |SELECT user_id, session_id, seq FROM q
             |WHERE regexp_matches(seq, 'view(,[a-z]+)*,purchase')""".stripMargin)),

    // ------------------------------------------------------------------
    // q181: entity resolution (EntityResolution.candidatePairs/entities)
    // — customers plus deterministically-dirtied variants ('#'→'-', +25¢
    // balance drift for every 5th key) are linked back together:
    // blocking on (nationkey, last 4 name chars) confines the quadratic
    // step, a fuzzy pair rule (edit distance ≤ 1 AND balance within
    // 50¢) matches, connected components close transitively, and
    // survivorship emits one golden record per entity (min-id canonical
    // name, summed balances). The oracle replays the same rule and
    // closes components with a recursive CTE.
    QueryDef(
      "q181_entity_resolution",
      (s, dir) => {
        import s.implicits._
        val cust = T.customer(s, dir)
        val cents = expr("CAST(round(c_acctbal * 100, 0) AS LONG)")
        val base = cust.select(($"c_custkey" * 2).as("rec_id"),
          $"c_name".as("name"), $"c_nationkey".cast("long").as("nk"),
          cents.as("bal_cents"))
        val dirty = cust.filter($"c_custkey" % 5 === 0)
          .select(($"c_custkey" * 2 + 1).as("rec_id"),
            regexp_replace($"c_name", "#", "-").as("name"),
            $"c_nationkey".cast("long").as("nk"),
            (cents + 25L).as("bal_cents"))
        val records = base.unionByName(dirty)
        val pairs = graft.operators.EntityResolution
          .candidatePairs(records, "rec_id",
            concat_ws("|", $"nk", expr("right(name, 4)")))
          .filter(levenshtein($"a.name", $"b.name") <= 1 &&
            abs($"a.bal_cents" - $"b.bal_cents") <= 50)
          .select($"a.rec_id".as("id_a"), $"b.rec_id".as("id_b"))
        graft.operators.EntityResolution.entities(records, "rec_id", pairs)
          .groupBy($"entity_id")
          .agg(count(lit(1)).as("n_records"),
            min_by($"name", $"rec_id").as("canon_name"),
            sum($"bal_cents").as("bal_cents_total"))
      },
      Some("""WITH RECURSIVE recs AS (
             |  SELECT c_custkey * 2 AS rec_id, c_name AS name,
             |         CAST(c_nationkey AS BIGINT) AS nk,
             |         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
             |  FROM customer
             |  UNION ALL
             |  SELECT c_custkey * 2 + 1, replace(c_name, '#', '-'),
             |         CAST(c_nationkey AS BIGINT),
             |         CAST(round(c_acctbal * 100, 0) AS BIGINT) + 25
             |  FROM customer WHERE c_custkey % 5 = 0),
             |pairs AS (
             |  SELECT a.rec_id AS id_a, b.rec_id AS id_b
             |  FROM recs a JOIN recs b
             |    ON a.nk = b.nk AND right(a.name, 4) = right(b.name, 4)
             |   AND a.rec_id < b.rec_id
             |   AND levenshtein(a.name, b.name) <= 1
             |   AND abs(a.bal_cents - b.bal_cents) <= 50),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, root) AS (
             |  SELECT rec_id, rec_id FROM recs
             |  UNION
             |  SELECT e.dst, r.root FROM edges e JOIN reach r ON r.id = e.src),
             |lab AS (SELECT id AS rec_id, min(root) AS entity_id
             |        FROM reach GROUP BY id)
             |SELECT l.entity_id, count(*) AS n_records,
             |  min_by(r.name, r.rec_id) AS canon_name,
             |  CAST(sum(r.bal_cents) AS BIGINT) AS bal_cents_total
             |FROM recs r JOIN lab l ON r.rec_id = l.rec_id
             |GROUP BY l.entity_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q182: skew-salted join (SkewJoin.salted) — lineitem×supplier with
    // each supplier key spread over 8 deterministic sub-keys (salt =
    // hash of the line's unique id, NEVER rand(): speculative retries
    // must salt identically) and the supplier side replicated per salt.
    // The result is exactly the plain equi-join — the oracle IS the
    // plain join — while the shuffle distributes a hot supplier across
    // 8 tasks instead of one straggler.
    QueryDef(
      "q182_salted_join",
      (s, dir) => {
        import s.implicits._
        val li = T.lineitem(s, dir).select(
          $"l_suppkey".as("suppkey"), $"l_orderkey", $"l_linenumber",
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS LONG)")
            .as("rev4"))
        val sup = T.supplier(s, dir)
          .select($"s_suppkey".as("suppkey"), $"s_name")
        graft.operators.SkewJoin
          .salted(li, sup, "suppkey", 8, hash($"l_orderkey", $"l_linenumber"))
          .groupBy($"s_name")
          .agg(count(lit(1)).as("n_items"), sum($"rev4").as("rev4_total"))
      },
      Some("""SELECT s_name, count(*) AS n_items,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev4_total
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name""".stripMargin))
  )
}
