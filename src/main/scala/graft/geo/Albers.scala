package graft.geo

import graft.plans.{AlbersForward, AlbersInverse}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.SqlBridge

/** Closed-form ellipsoidal Albers Equal-Area Conic, parameterized as
  * EPSG:5071 (CONUS Albers / NAD83-GRS80) — the projection the reference
  * delegates to pyproj for its 4326↔5071 transforms
  * (/root/reference/data/src/utils/census.py:50-71,159-169). Formulas are
  * the standard Snyder (USGS PP 1395, ch. 14) equations.
  *
  * Forward: (lon, lat) degrees → (x, y) meters. Inverse recovers lon/lat
  * by fixed-point iteration on the authalic latitude (converges to <1e-12
  * rad in ~6 iterations; 15 used for safety).
  */
object Albers {
  private val a = 6378137.0                 // GRS80 semi-major
  private val f = 1.0 / 298.257222101
  private val e2 = 2.0 * f - f * f
  private val e = math.sqrt(e2)

  private val lat0 = math.toRadians(23.0)   // EPSG:5071 parameters
  private val lon0 = math.toRadians(-96.0)
  private val sp1 = math.toRadians(29.5)
  private val sp2 = math.toRadians(45.5)
  private val falseE = 0.0
  private val falseN = 0.0

  private def qf(sinPhi: Double): Double = {
    val es = e * sinPhi
    (1.0 - e2) * (sinPhi / (1.0 - es * es) - (1.0 / (2.0 * e)) * math.log((1.0 - es) / (1.0 + es)))
  }
  private def mf(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
  }

  private val m1 = mf(sp1)
  private val m2 = mf(sp2)
  private val q0 = qf(math.sin(lat0))
  private val q1 = qf(math.sin(sp1))
  private val q2 = qf(math.sin(sp2))
  private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
  private val cBig = m1 * m1 + n * q1
  private val rho0 = a * math.sqrt(cBig - n * q0) / n

  /** degrees → meters */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = math.toRadians(lonDeg)
    val phi = math.toRadians(latDeg)
    val q = qf(math.sin(phi))
    val rho = a * math.sqrt(cBig - n * q) / n
    val theta = n * (lam - lon0)
    (falseE + rho * math.sin(theta), falseN + rho0 - rho * math.cos(theta))
  }

  /** meters → degrees */
  def inverse(x: Double, y: Double): (Double, Double) = {
    val xr = x - falseE
    val yr = rho0 - (y - falseN)
    val rho = math.sqrt(xr * xr + yr * yr)
    val theta = math.atan2(xr, yr)
    val q = (cBig - rho * rho * n * n / (a * a)) / n
    var phi = math.asin(math.min(1.0, math.max(-1.0, q / 2.0)))
    var i = 0
    while (i < 15) {
      val s = math.sin(phi)
      val es = e * s
      val den = 1.0 - es * es
      phi += den * den / (2.0 * math.cos(phi)) *
        (q / (1.0 - e2) - s / den + (1.0 / (2.0 * e)) * math.log((1.0 - es) / (1.0 + es)))
      i += 1
    }
    (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
  }

  /** primitive-array forms — the codegen entry points of
    * [[graft.plans.AlbersForward]]/[[graft.plans.AlbersInverse]] (called
    * as static forwarders from generated code).
    */
  def forwardArr(lonDeg: Double, latDeg: Double): Array[Double] = {
    val r = forward(lonDeg, latDeg); Array(r._1, r._2)
  }
  def inverseArr(x: Double, y: Double): Array[Double] = {
    val r = inverse(x, y); Array(r._1, r._2)
  }

  // Column-level API (F11) — native Catalyst expressions with doGenCode
  // (graft.plans.AlbersExpressions), not UDFs: the transform inlines into
  // whole-stage codegen with no boxing.
  def fwd(lon: Column, lat: Column): Column =
    SqlBridge.column(AlbersForward(SqlBridge.expression(lon), SqlBridge.expression(lat)))
  def inv(x: Column, y: Column): Column =
    SqlBridge.column(AlbersInverse(SqlBridge.expression(x), SqlBridge.expression(y)))
}
