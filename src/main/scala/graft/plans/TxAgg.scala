package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** METADATA-ONLY global aggregates for TxLog tables — `count(*)`,
  * `count(col)`, `min(col)`, `max(col)` over a registered
  * [[graft.sources.TxLog.table]] scan answered from the manifest, as a
  * Catalyst rule — including under a range `Filter`.
  *
  * Two shapes fire:
  *
  * '''Unfiltered''' — a global `Aggregate` (no grouping) whose child is
  * a registered table's latest-snapshot scan (or any batch-dir subset
  * of it, e.g. a `readWhere` result) is replaced by a one-row
  * `LocalRelation`: zero files listed, zero files opened, zero tasks
  * launched. This is the optimization Delta/Iceberg ship for
  * `SELECT COUNT(*)` ("metadata-only query"), generalized with the
  * manifest's exact per-column footer null counts so `count(col)` (=
  * rows − nulls) and null-fraction probes are free too.
  *
  * '''Filtered (hybrid)''' — the same aggregate above a `Filter` whose
  * predicate translates EXACTLY to per-column conditions (`AND` of
  * `col ⋈ literal`, ⋈ ∈ {=, <, <=, >, >=}, and `IsNotNull`) classifies
  * each batch three ways against its manifest stats:
  *  - '''excluded''' — no row can satisfy some conjunct (disjoint
  *    bounds, or the batch is all-null in a compared column — SQL
  *    comparisons with null never pass a filter): contributes nothing;
  *  - '''contained''' — every row provably satisfies every conjunct
  *    (bounds strictly inside the probe, strictness respected, and
  *    ZERO nulls in every compared column): answered from metadata;
  *  - '''boundary''' — anything else: genuinely scanned, with the
  *    original filter kept (exact).
  * The aggregate is rewritten to a merge over
  * `Union(metadata one-row partial, Aggregate(Filter(boundary scan)))`
  * — counts re-sum, min/max re-min/max — so only boundary batches cost
  * I/O. At 100 TB this is the "count rows in a date range" dashboard
  * query touching two boundary files instead of the whole table. The
  * rewrite fires only when at least one batch is metadata-answered
  * (profitable), which also makes it fixed-point safe: the boundary
  * side it emits re-classifies to zero contained batches and declines.
  *
  * Exactness rules (decline — leave the plan untouched — otherwise):
  *  - every classified batch must carry the exact footer row count;
  *  - `count(col)` needs the exact null count for every contained
  *    batch holding rows (a batch whose recorded schema LACKS the
  *    column reads as all-null ⇒ contributes `rows` nulls —
  *    schema-evolution exact);
  *  - `min/max(col)` need committed bounds in every contained batch
  *    that holds any value of the column; all-null batches contribute
  *    nothing, which is exact because nulls never participate in
  *    min/max. Columns whose footer stats were dropped (NaN, exotic
  *    types, truncated binary) decline;
  *  - DISTINCT, FILTER clauses, and any other function decline; a
  *    predicate with ANY untranslatable conjunct (OR, expressions over
  *    columns, UDFs) declines — unlike [[TxPruneRule]], which may
  *    ignore conjuncts because pruning only needs soundness, the
  *    hybrid count needs the full predicate's selectivity;
  *  - every scan root must be a batch dir of the latest manifest
  *    (per-batch stats are immutable once committed, so any subset is
  *    answerable; a time-travel read whose dirs were since replaced
  *    has no stats in the latest manifest and declines).
  *
  * Value typing: manifest bounds are engine-portable strings tagged
  * l/d/s; they are parsed back to the SCAN attribute's Catalyst type
  * (long/int/short/byte, double/float, string, date) so the substituted
  * literal is bit-identical to what the scan-and-aggregate plan would
  * produce. Unparseable kind/type pairings decline rather than cast.
  * Filter literals compare against bounds in the manifest's own domain
  * (BigDecimal for l/d, unsigned UTF-8 bytes for s — parquet's order);
  * any comparison that throws classifies the batch as boundary, never
  * excluded.
  */
object TxAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!TxPruneRule.anyRegistered) plan
    else plan.transformUp {
      case agg @ Aggregate(Nil, _, _, _) => answer(agg).getOrElse(agg)
    }

  /** Peel the aggregate's child down to the scan: any attribute-only
    * Projects plus at most one Filter (Catalyst's CombineFilters has
    * already collapsed stacks). Anything computed in between means the
    * aggregate is not over raw columns.
    */
  private def scanOf(child: LogicalPlan, cond: Option[Expression] = None)
      : Option[(LogicalRelation, Option[Expression])] = child match {
    case l: LogicalRelation => Some((l, cond))
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanOf(c, cond)
    case Filter(f, c) if cond.isEmpty => scanOf(c, Some(f))
    case _ => None
  }

  // ---- exact predicate translation -------------------------------------

  private sealed trait Op
  private case object Ge extends Op
  private case object Gt extends Op
  private case object Le extends Op
  private case object Lt extends Op
  private case object Eq extends Op
  private case object NotNull extends Op

  private case class Cond(col: String, op: Op, v: Any)

  /** The filter as exact per-column conditions, or None when ANY part
    * of it is not translatable (exactness demands the whole predicate).
    */
  private def conds(e: Expression): Option[Seq[Cond]] = {
    def v(l: Literal): Option[Any] =
      Option(CatalystTypeConverters.convertToScala(l.value, l.dataType))
        .filter {
          case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double
               | _: java.math.BigDecimal | _: BigDecimal | _: String
               | _: java.sql.Date => true
          case _ => false
        }
    def one(col: String, op: Op, l: Literal): Option[Seq[Cond]] =
      v(l).map(x => Seq(Cond(col, op, x)))
    e match {
      case And(a, b) => for (x <- conds(a); y <- conds(b)) yield x ++ y
      case IsNotNull(a: AttributeReference) =>
        Some(Seq(Cond(a.name, NotNull, null)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => one(a.name, Ge, l)
      case GreaterThan(a: AttributeReference, l: Literal) => one(a.name, Gt, l)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => one(a.name, Le, l)
      case LessThan(a: AttributeReference, l: Literal) => one(a.name, Lt, l)
      case EqualTo(a: AttributeReference, l: Literal) => one(a.name, Eq, l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => one(a.name, Le, l)
      case GreaterThan(l: Literal, a: AttributeReference) => one(a.name, Lt, l)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => one(a.name, Ge, l)
      case LessThan(l: Literal, a: AttributeReference) => one(a.name, Gt, l)
      case EqualTo(l: Literal, a: AttributeReference) => one(a.name, Eq, l)
      case _ => None
    }
  }

  // ---- per-batch three-valued classification ---------------------------

  private sealed trait Tri
  private case object AllRows extends Tri
  private case object NoRows extends Tri
  private case object SomeRows extends Tri

  private type Batch = (Map[String, graft.sources.TxLog.ColStats],
    Option[StructType])

  private def lte(k: String, a: String, b: String): Boolean =
    graft.sources.TxLog.kindLte(k, a, b)
  private def lt(k: String, a: String, b: String): Boolean = !lte(k, b, a)

  private def classify(c: Cond, batch: Batch, rows: Long): Tri = {
    val (stats, schema) = batch
    val absent = schema.exists(!_.fieldNames.contains(c.col))
    val nulls = graft.sources.TxLog.batchNulls(stats, c.col)
      .orElse(if (absent) Some(rows) else None)
    val allNull = absent || nulls.contains(rows)
    c.op match {
      case NotNull =>
        if (allNull) NoRows
        else if (nulls.contains(0L)) AllRows
        else SomeRows
      case cmp =>
        // a row with null in the column fails every comparison, so an
        // all-null batch holds NO qualifying rows; and AllRows requires
        // a proven zero null count on top of the bounds test
        if (allNull) return NoRows
        val st = stats.getOrElse(c.col, return SomeRows)
        scala.util.Try {
          val v = c.v.toString
          val none = cmp match {
            case Ge => lt(st.kind, st.max, v)
            case Gt => lte(st.kind, st.max, v)
            case Le => lt(st.kind, v, st.min)
            case Lt => lte(st.kind, v, st.min)
            case Eq => lt(st.kind, st.max, v) || lt(st.kind, v, st.min)
            case NotNull => false
          }
          val all = nulls.contains(0L) && (cmp match {
            case Ge => lte(st.kind, v, st.min)
            case Gt => lt(st.kind, v, st.min)
            case Le => lte(st.kind, st.max, v)
            case Lt => lt(st.kind, st.max, v)
            case Eq => lte(st.kind, v, st.min) && lte(st.kind, st.max, v)
            case NotNull => false
          })
          if (none) NoRows else if (all) AllRows else SomeRows
        }.getOrElse(SomeRows) // unorderable pairing: scan, never exclude
    }
  }

  /** One column's manifest answer over the contained batches: bounds
    * kind + min/max (None = the column holds no values anywhere) and
    * exact null count (None = unknown for at least one batch).
    */
  private case class ColAnswer(kind: String, bounds: Option[(String, String)],
      nulls: Option[Long])

  /** What each original aggregate contributes: its metadata partial
    * value (Catalyst-internal), the boundary-side partial aggregate
    * function, the partial column's type, and how partials merge.
    */
  private sealed trait MergeKind
  private case object SumK extends MergeKind
  private case object MinK extends MergeKind
  private case object MaxK extends MergeKind

  private def answer(agg: Aggregate): Option[LogicalPlan] = {
    val (scan, condOpt) = scanOf(agg.child).getOrElse(return None)
    val fsRel = scan.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return None
    }
    val roots = fsRel.location.rootPaths.map(p => TxPruneRule.norm(p.toString))
    if (roots.isEmpty) return None
    val tableDir = TxPruneRule.registeredDirOf(roots).getOrElse(return None)
    val spark = fsRel.sparkSession
    val (dirs, batches) = graft.sources.TxLog
      .aggSnapshot(spark, tableDir).getOrElse(return None)
    // every scanned root must be a latest-manifest batch dir (stats for
    // a committed batch dir are immutable, so subsets answer exactly)
    val byDir = dirs.map(TxPruneRule.norm).zip(batches).toMap
    val present: Seq[(String, Batch)] = roots.map { r =>
      r -> byDir.getOrElse(r, return None)
    }

    val cs = condOpt match {
      case None => Seq.empty[Cond]
      case Some(c) => conds(c).getOrElse(return None)
    }

    val rowsPer = present.map { case (_, (st, _)) =>
      graft.sources.TxLog.batchRows(st).getOrElse(return None)
    }
    sealed trait Cls; object Contained extends Cls
    object Boundary extends Cls; object Excluded extends Cls
    val classed = present.zip(rowsPer).map { case ((dir, b), rows) =>
      val tris = cs.map(classify(_, b, rows))
      val cls =
        if (tris.contains(NoRows)) Excluded
        else if (tris.forall(_ == AllRows)) Contained
        else Boundary
      (dir, b, rows, cls)
    }
    val contained = classed.filter(_._4 == Contained)
    val boundary = classed.filter(_._4 == Boundary)
    // profit + fixed-point guard: a filtered aggregate with nothing
    // metadata-answerable stays untouched (and the boundary plan this
    // rewrite emits lands here on the next optimizer pass)
    if (condOpt.isDefined && contained.isEmpty) return None

    val totalRows = contained.map(_._3).sum
    val live = contained.collect { case (_, b, rows, _) if rows > 0 => (b, rows) }

    def colAnswer(name: String): Option[ColAnswer] = {
      var kind: Option[String] = None
      var bounds: Option[(String, String)] = None
      var nulls: Option[Long] = Some(0L)
      live.foreach { case ((stats, schema), rows) =>
        val absent = schema.exists(!_.fieldNames.contains(name))
        val batchNulls = graft.sources.TxLog.batchNulls(stats, name)
          .orElse(if (absent) Some(rows) else None)
        nulls = for (a <- nulls; b <- batchNulls) yield a + b
        stats.get(name) match {
          case Some(st) =>
            kind match {
              case Some(k) if k != st.kind => return None // mixed kinds
              case _ => kind = Some(st.kind)
            }
            bounds = bounds match {
              case None => Some((st.min, st.max))
              case Some((mn, mx)) => Some((
                if (lte(st.kind, st.min, mn)) st.min else mn,
                if (lte(st.kind, mx, st.max)) st.max else mx))
            }
          case None =>
            // exact only when the batch provably holds NO values: its
            // recorded schema lacks the column, or footer null counts
            // say every row is null
            val allNull = absent || batchNulls.contains(rows)
            if (!allNull) return None
        }
      }
      Some(ColAnswer(kind.getOrElse("l"), bounds, nulls))
    }

    /** Manifest bound string -> Catalyst-internal value of the scan
      * attribute's type. None = pairing not provably lossless.
      */
    def parse(kind: String, s: String, dt: DataType): Option[Any] =
      scala.util.Try((kind, dt) match {
        case ("l", LongType) => s.toLong
        case ("l", IntegerType) => s.toInt
        case ("l", ShortType) => s.toShort
        case ("l", ByteType) => s.toByte
        case ("d", DoubleType) => s.toDouble
        case ("d", FloatType) => s.toFloat
        case ("d", dec: DecimalType) =>
          val d = org.apache.spark.sql.types.Decimal(BigDecimal(s))
          if (d.changePrecision(dec.precision, dec.scale)) d
          else return None
        case ("s", StringType) => UTF8String.fromString(s)
        case ("s", DateType) => java.time.LocalDate.parse(s).toEpochDay.toInt
        case _ => return None
      }).toOption

    val memo = scala.collection.mutable.HashMap.empty[String, Option[ColAnswer]]
    def col(name: String) = memo.getOrElseUpdate(name, colAnswer(name))

    // per original aggregate: metadata partial value, boundary partial
    // function, partial type, merge kind
    val specs: Seq[(Any, AggregateFunction, DataType, MergeKind)] =
      agg.aggregateExpressions.map {
        case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
          case Count(Seq(lit @ Literal(v, _))) if v != null =>
            (totalRows, Count(Seq(lit)), LongType, SumK)
          case Count(Seq(ar: AttributeReference)) =>
            val c = col(ar.name).getOrElse(return None)
            (totalRows - c.nulls.getOrElse(return None),
              Count(Seq(ar)), LongType, SumK)
          case Min(ar: AttributeReference) =>
            val c = col(ar.name).getOrElse(return None)
            (c.bounds.map(b => parse(c.kind, b._1, ar.dataType)
              .getOrElse(return None)).orNull, Min(ar), ar.dataType, MinK)
          case Max(ar: AttributeReference) =>
            val c = col(ar.name).getOrElse(return None)
            (c.bounds.map(b => parse(c.kind, b._2, ar.dataType)
              .getOrElse(return None)).orNull, Max(ar), ar.dataType, MaxK)
          case _ => return None
        }
        case _ => return None
      }

    if (boundary.isEmpty) {
      // pure metadata: the whole answer is one local row
      Some(LocalRelation(agg.output,
        Seq(InternalRow.fromSeq(specs.map(_._1)))))
    } else {
      // hybrid: metadata partial UNION boundary-scan partial, re-merged
      val spark2 = fsRel.sparkSession
      val partialAttrs = specs.zipWithIndex.map { case ((_, _, dt, _), i) =>
        AttributeReference(s"_p$i", dt, nullable = true)()
      }
      val metaLocal = LocalRelation(partialAttrs,
        Seq(InternalRow.fromSeq(specs.map(_._1))))
      val bIndex = new InMemoryFileIndex(spark2,
        boundary.map(b => new Path(b._1)), Map.empty, Some(fsRel.dataSchema))
      val bScan = scan.copy(relation = fsRel.copy(location = bIndex)(spark2))
      val bFilter = condOpt.map(Filter(_, bScan)).getOrElse(bScan)
      val bAgg = Aggregate(Nil,
        specs.zipWithIndex.map { case ((_, fn, _, _), i) =>
          Alias(fn.toAggregateExpression(), s"_p$i")()
        }, bFilter)
      val merged = agg.aggregateExpressions.zip(specs.zipWithIndex).map {
        case (orig: Alias, ((_, _, _, mk), i)) =>
          val p = partialAttrs(i)
          val e: Expression = mk match {
            case SumK => Coalesce(Seq(
              Sum(p).toAggregateExpression(), Literal(0L)))
            case MinK => Min(p).toAggregateExpression()
            case MaxK => Max(p).toAggregateExpression()
          }
          Alias(e, orig.name)(exprId = orig.exprId)
        case _ => return None
      }
      Some(Aggregate(Nil, merged, Union(Seq(metaLocal, bAgg))))
    }
  }
}
