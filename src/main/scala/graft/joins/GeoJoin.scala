package graft.joins

import graft.features.Derived
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo RADIUS self-join — all point pairs within `radiusKm` great-circle
  * kilometers — via unit-sphere 3D grid bucketing: the spatial analog of
  * the banded range join (`plans/RangeJoinRewrite`), replacing the naive
  * BroadcastNestedLoop/cross plan with an equi-join on cell ids.
  *
  * Why XYZ cells and not lat/lon cells: a longitude degree shrinks with
  * cos(lat), so any fixed lat/lon cell width loses recall near the poles
  * (where this dataset's lattice actually crowds). On the unit sphere the
  * great-circle threshold R becomes an exact CHORD threshold
  * c = 2·sin(R / D_earth) — monotone in R — and chord(a,b) ≤ c implies
  * every coordinate differs by ≤ c, so bucketing x/y/z at width c
  * guarantees any qualifying pair lands in the SAME or an ADJACENT cell
  * per axis. One side keeps its own cell; the other explodes to its 27
  * neighbor cells; the equi-join on (cx, cy, cz) yields each candidate
  * pair exactly once (the 27 exploded rows have distinct cells), and the
  * exact haversine filter keeps precision at 100 %.
  *
  * Scale: shuffle volume is 28 rows per point (1 + 27) keyed by cell —
  * linear in N — and pair work is Σ_cells n_a · n_b over adjacent cells
  * only, the standard grid-join bound; AQE's skew split handles crowded
  * cells. The exact compare happens on the ROUNDED distance (4 decimals,
  * the repo's round-before-compare recipe) so the qualifying SET is
  * engine-deterministic; the chord width carries slack for the rounding
  * boundary.
  */
object GeoJoin {

  /** All unordered pairs (id_a < id_b) of `pts` within `radiusKm`,
    * with the rounded great-circle distance.
    */
  def radiusJoin(pts: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusKm: Double): DataFrame = {
    // chord subtended by R (+1 m slack: covers the 4-decimal rounding
    // boundary of the final compare); 12742 km = 2 · EarthRadiusKm,
    // matching Derived.haversineKm's sphere
    val chord = 2.0 * math.sin((radiusKm + 0.001) / 12742.0)
    def rad(c: Column) = radians(c)
    val base = pts.select(col(idCol).as("id"), col(latCol).as("lat"), col(lonCol).as("lon"))
      .withColumn("x", cos(rad(col("lat"))) * cos(rad(col("lon"))))
      .withColumn("y", cos(rad(col("lat"))) * sin(rad(col("lon"))))
      .withColumn("z", sin(rad(col("lat"))))
    def cellOf(c: Column): Column = floor(c / lit(chord)).cast("long")
    val a = base.select(col("id").as("id_a"),
      col("lat").as("lat_a"), col("lon").as("lon_a"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"), cellOf(col("z")).as("cz"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"), lit(dz.toLong).as("dz"))
    val b = base
      .withColumn("o", explode(array(offs: _*)))
      .select(col("id").as("id_b"),
        col("lat").as("lat_b"), col("lon").as("lon_b"),
        (cellOf(col("x")) + col("o.dx")).as("cx"),
        (cellOf(col("y")) + col("o.dy")).as("cy"),
        (cellOf(col("z")) + col("o.dz")).as("cz"))
    a.join(b, Seq("cx", "cy", "cz"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist_km", round(Derived.haversineKm(
        col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")), 4))
      .filter(col("dist_km") <= lit(radiusKm))
      .select(col("id_a"), col("id_b"), col("dist_km"))
  }
}
