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

/** METADATA-answered aggregates for TxLog tables — `count(*)`,
  * `count(col)`, `min(col)`, `max(col)` over a registered
  * [[graft.sources.TxLog.table]] scan answered from the manifest, as a
  * Catalyst rule — per batch, under range `Filter`s, and under
  * batch-constant `GROUP BY` columns.
  *
  * Every batch of the scan classifies INDEPENDENTLY:
  *
  *  - '''excluded''' — it provably contributes nothing: zero rows, or
  *    some filter conjunct no row can satisfy (disjoint bounds, or the
  *    batch is all-null in a compared column — SQL comparisons with
  *    null never pass a filter);
  *  - '''metadata-answered''' — every row provably passes every filter
  *    conjunct (bounds strictly inside the probe, strictness respected,
  *    ZERO nulls in every compared column), every grouping column is
  *    batch-constant (footer min == max with zero nulls ⇒ one value, or
  *    all-null ⇒ the NULL group), and every aggregate is computable
  *    from the batch's stats: `count(*)` = footer rows, `count(col)` =
  *    rows − exact footer null count (a column absent from the batch's
  *    recorded schema reads all-null ⇒ 0 — schema-evolution exact),
  *    `min/max(col)` = committed bounds (all-null ⇒ SQL null). Each
  *    such batch becomes ONE pre-aggregated local row;
  *  - '''boundary''' — anything else: genuinely scanned, with the
  *    original filter kept (exact).
  *
  * The plan rewrites to a re-aggregation over
  * `Union(LocalRelation(one partial row per metadata batch),
  * Aggregate(partials, Filter(boundary-batch scan)))` — counts re-sum,
  * min/max re-merge, groups re-group — so only boundary batches cost
  * I/O. When no batch needs scanning the plan holds ZERO file relations
  * (the Delta/Iceberg "metadata-only query", generalized to filters and
  * group-bys). At 100 TB this answers `count(*)`, "count rows in a date
  * range" and "rows per day over an append-per-day table" from a
  * KB-sized manifest read instead of a table scan.
  *
  * Declines (leaves the plan untouched) when:
  *  - any aggregate is not one of the four functions, is DISTINCT, or
  *    carries a FILTER clause; any output expression is not a grouping
  *    attribute or an aggregate alias;
  *  - the filter has ANY untranslatable conjunct (OR, expressions over
  *    columns, UDFs) — unlike [[TxPruneRule]], which may ignore
  *    conjuncts because pruning only needs soundness, exact counting
  *    needs the full predicate's selectivity;
  *  - any grouping expression is not a bare column;
  *  - some scan root is not a batch dir of the latest manifest
  *    (per-batch stats are immutable once committed, so any subset —
  *    a readWhere result, an append-carried time-travel read — is
  *    answerable; replaced dirs are not);
  *  - no batch classifies metadata-answered or excluded (nothing to
  *    gain — which also makes the rewrite fixed-point safe: the
  *    boundary scan it emits re-classifies to all-boundary and
  *    declines).
  *
  * Value typing: manifest bounds are engine-portable strings tagged
  * l/d/s; they are parsed back to the SCAN attribute's Catalyst type
  * (long/int/short/byte, double/float, string, date) so substituted
  * values are bit-identical to what the scan would produce; an
  * unparseable kind/type pairing makes that batch boundary, never
  * wrong. Filter literals compare against bounds in the manifest's own
  * domain (BigDecimal for l/d, unsigned UTF-8 bytes for s — parquet's
  * order); a comparison that throws classifies the batch as boundary,
  * never excluded.
  */
object TxAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!TxPruneRule.anyRegistered) plan
    else plan.transformUp {
      case agg: Aggregate => answer(agg).getOrElse(agg)
    }

  /** Peel the aggregate's child down to the scan: any attribute-only
    * Projects plus at most one Filter (Catalyst's CombineFilters has
    * already collapsed stacks). Anything computed in between means the
    * aggregate is not over raw columns.
    */
  private def scanOf(child: LogicalPlan, cond: Option[Expression] = None)
      : Option[(LogicalRelation, Option[Expression])] = child match {
    // never touch a STREAMING micro-batch scan (the txlog stream source
    // emits per-batch LogicalRelations over registered dirs): a
    // streaming aggregate is stateful — substituting a local result for
    // one micro-batch's scan would corrupt the running state
    case l: LogicalRelation if l.isStreaming => None
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

  // ---- per-batch three-valued filter classification --------------------

  private sealed trait Tri
  private case object AllRows extends Tri
  private case object NoRows extends Tri
  private case object SomeRows extends Tri

  private type Batch = (Map[String, graft.sources.TxLog.ColStats],
    Option[StructType])

  private def lte(k: String, a: String, b: String): Boolean =
    graft.sources.TxLog.kindLte(k, a, b)
  private def lt(k: String, a: String, b: String): Boolean = !lte(k, b, a)

  /** Exact null count of `col` in the batch, None = unknown. A column
    * the batch's recorded schema lacks reads as all-null.
    */
  private def nullsOf(batch: Batch, col: String, rows: Long): Option[Long] = {
    val (stats, schema) = batch
    graft.sources.TxLog.batchNulls(stats, col)
      .orElse(if (schema.exists(!_.fieldNames.contains(col))) Some(rows)
              else None)
  }

  private def allNull(batch: Batch, col: String, rows: Long): Boolean =
    batch._2.exists(!_.fieldNames.contains(col)) ||
      nullsOf(batch, col, rows).contains(rows)

  private def classify(c: Cond, batch: Batch, rows: Long): Tri = {
    val nulls = nullsOf(batch, c.col, rows)
    val an = allNull(batch, c.col, rows)
    c.op match {
      case NotNull =>
        if (an) NoRows
        else if (nulls.contains(0L)) AllRows
        else SomeRows
      case cmp =>
        // a row with null in the column fails every comparison, so an
        // all-null batch holds NO qualifying rows; and AllRows requires
        // a proven zero null count on top of the bounds test
        if (an) return NoRows
        val st = batch._1.getOrElse(c.col, return SomeRows)
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

  /** Manifest bound string -> Catalyst-internal value of the scan
    * attribute's type. None = pairing not provably lossless.
    */
  private def parse(kind: String, s: String, dt: DataType): Option[Any] =
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

  /** The batch's single value of a grouping column (null = the NULL
    * group), or None when the column is not provably batch-constant.
    */
  private def groupVal(batch: Batch, ar: AttributeReference, rows: Long)
      : Option[Any] = {
    if (allNull(batch, ar.name, rows)) return Some(null)
    val st = batch._1.getOrElse(ar.name, return None)
    if (!nullsOf(batch, ar.name, rows).contains(0L)) return None
    if (!(lte(st.kind, st.min, st.max) && lte(st.kind, st.max, st.min)))
      return None // min != max: more than one value
    parse(st.kind, st.min, ar.dataType) match {
      case Some(v) => Some(v)
      case None => None
    }
  }

  /** One aggregate's value computed from one batch's stats alone, or
    * None when the stats cannot answer it for this batch.
    */
  private def batchVal(fn: AggregateFunction, batch: Batch, rows: Long)
      : Option[Any] = fn match {
    case Count(Seq(Literal(v, _))) if v != null => Some(rows)
    case Count(Seq(ar: AttributeReference)) =>
      nullsOf(batch, ar.name, rows).map(rows - _)
    case Min(ar: AttributeReference) =>
      if (allNull(batch, ar.name, rows)) Some(null)
      else batch._1.get(ar.name).flatMap(st => parse(st.kind, st.min, ar.dataType))
    case Max(ar: AttributeReference) =>
      if (allNull(batch, ar.name, rows)) Some(null)
      else batch._1.get(ar.name).flatMap(st => parse(st.kind, st.max, ar.dataType))
    case _ => None
  }

  private sealed trait MergeKind
  private case object SumK extends MergeKind
  private case object MinK extends MergeKind
  private case object MaxK extends MergeKind

  /** What each output expression is: a grouping column, or an aggregate
    * with its boundary-side partial function, partial type, and merge.
    */
  private sealed trait OutSpec
  private case class GroupOut(ar: AttributeReference, name: String,
      exprId: ExprId) extends OutSpec
  private case class AggOut(fn: AggregateFunction, dt: DataType,
      mk: MergeKind, name: String, exprId: ExprId) extends OutSpec

  private def answer(agg: Aggregate): Option[LogicalPlan] = {
    val (scan, condOpt) = scanOf(agg.child).getOrElse(return None)
    val fsRel = scan.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return None
    }
    val groups: Seq[AttributeReference] = agg.groupingExpressions.map {
      case ar: AttributeReference => ar
      case _ => return None
    }
    // every output is either a grouping attribute or one of the four
    // manifest-answerable aggregates
    val specs: Seq[OutSpec] = agg.aggregateExpressions.map {
      case ar: AttributeReference if groups.exists(_.exprId == ar.exprId) =>
        GroupOut(ar, ar.name, ar.exprId)
      case al @ Alias(ar: AttributeReference, _)
          if groups.exists(_.exprId == ar.exprId) =>
        GroupOut(ar, al.name, al.exprId)
      case al @ Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(lit @ Literal(v, _))) if v != null =>
          AggOut(Count(Seq(lit)), LongType, SumK, al.name, al.exprId)
        case c @ Count(Seq(_: AttributeReference)) =>
          AggOut(c, LongType, SumK, al.name, al.exprId)
        case m @ Min(ar: AttributeReference) =>
          AggOut(m, ar.dataType, MinK, al.name, al.exprId)
        case m @ Max(ar: AttributeReference) =>
          AggOut(m, ar.dataType, MaxK, al.name, al.exprId)
        case _ => return None
      }
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

    // classify: each batch yields Some(partial row values) when fully
    // metadata-answered, is dropped when excluded, or lands in boundary
    val boundary = scala.collection.mutable.ArrayBuffer.empty[String]
    val metaRows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    present.foreach { case (dir, b) =>
      val rows = graft.sources.TxLog.batchRows(b._1).getOrElse(return None)
      if (rows > 0L) {
        val tris = cs.map(classify(_, b, rows))
        if (!tris.contains(NoRows)) {
          // fully inside the filter AND every group/aggregate answerable
          // from this batch's stats -> one partial row; otherwise try
          // the histogram salvage before conceding a scan
          if (tris.forall(_ == AllRows)) {
            val row = specs.foldLeft(Option(Vector.empty[Any])) { (acc, sp) =>
              acc.flatMap { vs =>
                (sp match {
                  case GroupOut(ar, _, _) => groupVal(b, ar, rows)
                  case AggOut(fn, _, _, _, _) => batchVal(fn, b, rows)
                }).map(vs :+ _)
              }
            }
            row match {
              case Some(v) => metaRows += v
              case None => boundary += dir
            }
          } else histSalvage(b, rows, cs, tris, specs) match {
            case HMeta(v) => metaRows += v
            case HDrop => () // histogram proves zero in-range rows
            case HBoundary => boundary += dir
          }
        }
      }
    }
    rewrite(agg, scan, fsRel, condOpt, specs, metaRows.toSeq, boundary.toSeq,
      present.size)
  }

  private sealed trait HistOut
  private case class HMeta(row: Seq[Any]) extends HistOut
  private case object HDrop extends HistOut
  private case object HBoundary extends HistOut

  /** Histogram salvage for a PARTIALLY-overlapping batch (round-8 ask:
    * countBounds' certainty reaching the automatic rule). When every
    * straddling condition is an integer range on ONE column whose
    * commit harvested an equi-width histogram, the batch's own
    * [[graft.sources.TxLog.histCountBounds]] may pin the in-range
    * count EXACTLY (probe aligned with its bucket edges — always true
    * for single-valued buckets) or prove it ZERO:
    *
    *  - zero → the batch drops from the plan entirely (a boundary scan
    *    of a provably-empty batch saved);
    *  - exact → COUNT aggregates answer metadata-only: count(*) is the
    *    in-range count (null keys fail the range anyway, and the
    *    histogram never counted them); count(x) likewise; count(y)
    *    only with a proven zero null count for y;
    *  - anything else (a gap between cMin and cMax, min/max aggregates,
    *    multi-column straddles, non-integer probes) → boundary scan,
    *    exactly as before. Conservative at every turn — a salvage that
    *    cannot PROVE its value never replaces a scan.
    */
  private def histSalvage(b: Batch, rows: Long, cs: Seq[Cond],
      tris: Seq[Tri], specs: Seq[OutSpec]): HistOut = {
    val strad = cs.zip(tris).collect { case (c, SomeRows) => c }
    val cols = strad.map(_.col).distinct
    if (cols.size != 1) return HBoundary
    val x = cols.head
    var lo = Long.MinValue
    var hi = Long.MaxValue
    strad.foreach { c =>
      val v = c.v match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case bb: Byte => bb.toLong
        case _ => return HBoundary
      }
      c.op match {
        case Ge => lo = math.max(lo, v)
        case Gt =>
          if (v == Long.MaxValue) return HBoundary else lo = math.max(lo, v + 1)
        case Le => hi = math.min(hi, v)
        case Lt =>
          if (v == Long.MinValue) return HBoundary else hi = math.min(hi, v - 1)
        case Eq => lo = math.max(lo, v); hi = math.min(hi, v)
        // IsNotNull adds nothing beyond the range (comparisons already
        // exclude nulls, and the histogram never counted them)
        case NotNull => ()
      }
    }
    if (lo > hi) return HDrop // contradictory range: no rows anywhere
    graft.sources.TxLog.histCountBounds(b._1, x, lo, hi) match {
      case None => HBoundary
      case Some((_, 0L)) => HDrop
      case Some((cMin, cMax)) if cMin == cMax =>
        val row = specs.foldLeft(Option(Vector.empty[Any])) { (acc, sp) =>
          acc.flatMap { vs =>
            (sp match {
              case GroupOut(ar, _, _) => groupVal(b, ar, rows)
              case AggOut(Count(Seq(Literal(v0, _))), _, _, _, _) if v0 != null =>
                Some(cMin)
              case AggOut(Count(Seq(ar: AttributeReference)), _, _, _, _) =>
                if (ar.name == x) Some(cMin)
                else nullsOf(b, ar.name, rows).collect { case 0L => cMin }
              case _ => None // min/max inside a straddling batch: scan
            }).map(vs :+ _)
          }
        }
        row.map(HMeta(_)).getOrElse(HBoundary)
      case _ => HBoundary
    }
  }

  private def rewrite(agg: Aggregate, scan: LogicalRelation,
      fsRel: HadoopFsRelation, condOpt: Option[Expression],
      specs: Seq[OutSpec], metaRows: Seq[Seq[Any]], boundary: Seq[String],
      presentCount: Int): Option[LogicalPlan] = {
    // profit + fixed-point guard: nothing excluded, nothing answered ->
    // leave the plan untouched (and the boundary plan this rewrite
    // emits lands here on the next optimizer pass)
    if (boundary.size == presentCount) return None

    val spark = fsRel.sparkSession
    val partialAttrs = specs.zipWithIndex.map {
      case (GroupOut(ar, _, _), i) =>
        AttributeReference(s"_g$i", ar.dataType, nullable = true)()
      case (AggOut(_, dt, _, _, _), i) =>
        AttributeReference(s"_p$i", dt, nullable = true)()
    }
    val metaLocal = LocalRelation(partialAttrs,
      metaRows.map(InternalRow.fromSeq))
    val source: LogicalPlan =
      if (boundary.isEmpty) metaLocal
      else {
        val bIndex = new InMemoryFileIndex(spark,
          boundary.map(new Path(_)), Map.empty, Some(fsRel.dataSchema))
        val bScan = scan.copy(relation = fsRel.copy(location = bIndex)(spark))
        val bFilter = condOpt.map(Filter(_, bScan)).getOrElse(bScan)
        val bAgg = Aggregate(
          specs.collect { case GroupOut(ar, _, _) => ar },
          specs.zipWithIndex.map {
            case (GroupOut(ar, _, _), _) => ar
            case (AggOut(fn, _, _, _, _), i) =>
              Alias(fn.toAggregateExpression(), s"_p$i")()
          }, bFilter)
        Union(Seq(metaLocal, bAgg))
      }
    val outGroups = specs.zipWithIndex.collect {
      case (_: GroupOut, i) => partialAttrs(i)
    }
    val merged: Seq[NamedExpression] = specs.zipWithIndex.map {
      case (GroupOut(_, name, id), i) =>
        Alias(partialAttrs(i), name)(exprId = id)
      case (AggOut(_, _, mk, name, id), i) =>
        val p = partialAttrs(i)
        val e: Expression = mk match {
          case SumK => Coalesce(Seq(
            Sum(p).toAggregateExpression(), Literal(0L)))
          case MinK => Min(p).toAggregateExpression()
          case MaxK => Max(p).toAggregateExpression()
        }
        Alias(e, name)(exprId = id)
    }
    Some(Aggregate(outGroups, merged, source))
  }
}
