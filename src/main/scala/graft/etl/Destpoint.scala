package graft.etl

import graft.geo.Geometry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The destpoint stage of the reference ETL — SURVEY §7.1 step 4,
  * /root/reference/data/src/create_destpoint.py:55-82: buffer the state
  * boundary, keep geographies whose UNWEIGHTED or WEIGHTED centroid
  * falls within the buffered boundary, drop the geometry columns, sort
  * by geoid. Together with blockloc (q17) and cenloc (q29) this
  * completes the 3-stage origin/destination ETL spine.
  *
  * The reference runs two geopandas `sjoin(within)` passes and unions
  * the matching geoid sets with `isin` (create_destpoint.py:63-74); the
  * Spark shape is the same: two within-filters producing geoid keys, a
  * union, and a LEFT SEMI membership join back onto cenloc (U3 + P5) —
  * the centroid rows themselves are never duplicated or shuffled twice.
  *
  * The boundary is a single polygon per invocation (one state), so the
  * within-test broadcasts as a literal closure; the distributed side is
  * cenloc only.
  */
object Destpoint {

  def run(cenloc: DataFrame, boundary: Geometry.Polygon, buffer: Double): DataFrame = {
    val buffered = boundary.buffer(buffer)
    val withinU = udf((x: Double, y: Double) => buffered.contains(x, y))

    val within = cenloc.filter(withinU(col("x"), col("y"))).select("geoid")
    val withinWt = cenloc.filter(withinU(col("x_wt"), col("y_wt"))).select("geoid")

    // NOTE: the reference sorts by geoid before writing
    // (create_destpoint.py:81). That ordering belongs to the SINK, not the
    // operator: callers publish through TableIO.writePartitioned, whose
    // sortWithinPartitions gives per-file geoid order (O3/O5) without the
    // full range-exchange a global orderBy would force at publish scale.
    cenloc.join(within.union(withinWt).distinct(), Seq("geoid"), "left_semi")
  }
}
