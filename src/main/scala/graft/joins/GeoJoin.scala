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

  /** k-NEAREST-neighbors-within-radius join — the BOUNDED-OUTPUT form of
    * [[radiusJoin]] and the production shape at 100 TB (the round-11
    * verdict's directive #1): each point gets its k nearest neighbors
    * within `radiusKm`, so the answer is ≤ N·k rows BY CONSTRUCTION where
    * the all-pairs radius answer grows ~N² once the data's spatial lattice
    * saturates (SCALE.md's j08 accounting measured 65.4 M qualifying pairs
    * at 100×).
    *
    * The CANDIDATE work is made linear too, which the same XYZ grid alone
    * cannot do on saturating data (every point would meet every co-located
    * point): coincident positions are COLLAPSED first — the weighted-point
    * trick of spatial engines, load-bearing here because the synthetic
    * lattice piles ~N/360 points onto each of its 360 distinct positions
    * from sf0.1 up, and city-piled real data behaves the same way.
    *   1. distinct (lat, lon) POSITIONS — a bounded table (≤ lattice
    *      cells; 360 here at every bench scale, so position-pair work is
    *      CONSTANT in N);
    *   2. per position, its k+1 smallest member ids (one keyed window —
    *      within a position every member is equidistant from any probe, so
    *      under the (dist, id) total order only the k+1 smallest ids can
    *      ever reach a top-k after self-exclusion);
    *   3. position-level grid join ([[radiusJoin]]'s cells, self-pair
    *      kept, both directions), DENSE_RANK by rounded distance per probe
    *      position ≤ k+1 — dense so distance TIES can't cut off a position
    *      holding a smaller member id, and k+1 distance levels always
    *      cover ≥ k non-self members (the self level can contribute 0);
    *   4. expand: members of the probe position × capped members of the
    *      candidate positions, exact (dist, id) rank, keep k.
    * Per-probe candidate volume is O(k²) after the caps, so the whole
    * operator is one bounded-fanout pipeline: output AND work linear in N
    * at any pile-up (SCALE.md's j09 row shows the measured flat curve).
    * Points with fewer than k in-radius neighbors emit what exists — the
    * standard bounded-kNN contract.
    *
    * Output: (id, neighbor_id, rank, dist_km), rank 1..≤k under the total
    * (rounded dist, neighbor id) order; distance rounding before EVERY
    * compare keeps the ranking engine-deterministic (the repo's
    * round-before-compare recipe).
    */
  /** TWO-TABLE k-nearest join — "nearest facility": each PROBE point gets
    * its k nearest BUILD points within `radiusKm` (listings → comparable
    * sales, users → closest store/POP). Same position-collapse pipeline as
    * [[kNearestJoin]] with the asymmetric simplifications a two-table join
    * earns: no self-exclusion, so the build-side member cap and the
    * per-probe-position distance-level cap are both k (not k+1) — a member
    * cut by the id cap has k smaller-id co-located (equidistant) members
    * ahead of it, and a position at distance level k+1 has ≥ k members at
    * strictly smaller levels ahead of it, so neither can reach a top-k.
    * Probe positions collapse too (coincident probes share ALL candidate
    * work and fan back out in the final member join). Output:
    * (id, neighbor_id, rank, dist_km), rank 1..≤k under the
    * (rounded dist, neighbor id) total order; probes with fewer than k
    * in-radius build points emit what exists.
    */
  def kNearestJoinAgainst(probe: DataFrame, probeIdCol: String,
      build: DataFrame, buildIdCol: String, latCol: String, lonCol: String,
      radiusKm: Double, k: Int): DataFrame = {
    val chord = 2.0 * math.sin((radiusKm + 0.001) / 12742.0)
    def rad(c: Column) = radians(c)
    def cellOf(c: Column): Column = floor(c / lit(chord)).cast("long")
    def withXyz(df: DataFrame): DataFrame = df
      .withColumn("x", cos(rad(col("lat"))) * cos(rad(col("lon"))))
      .withColumn("y", cos(rad(col("lat"))) * sin(rad(col("lon"))))
      .withColumn("z", sin(rad(col("lat"))))
    val pBase = probe.select(col(probeIdCol).as("id"),
      col(latCol).as("lat"), col(lonCol).as("lon"))
    val bBase = build.select(col(buildIdCol).as("neighbor_id"),
      col(latCol).as("lat"), col(lonCol).as("lon"))
    val pPos = withXyz(pBase.select("lat", "lon").distinct())
      .select(col("lat").as("p_lat"), col("lon").as("p_lon"),
        cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"),
        cellOf(col("z")).as("cz"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"),
        lit(dz.toLong).as("dz"))
    val bPos = withXyz(bBase.select("lat", "lon").distinct())
      .withColumn("o", explode(array(offs: _*)))
      .select(col("lat").as("n_lat"), col("lon").as("n_lon"),
        (cellOf(col("x")) + col("o.dx")).as("cx"),
        (cellOf(col("y")) + col("o.dy")).as("cy"),
        (cellOf(col("z")) + col("o.dz")).as("cz"))
    val wMembers = org.apache.spark.sql.expressions.Window
      .partitionBy("lat", "lon").orderBy("neighbor_id")
    val topMembers = bBase
      .withColumn("mrn", row_number().over(wMembers))
      .filter(col("mrn") <= k)
      .select(col("lat").as("n_lat"), col("lon").as("n_lon"), col("neighbor_id"))
    val wDense = org.apache.spark.sql.expressions.Window
      .partitionBy("p_lat", "p_lon").orderBy("dist_km")
    val posPairs = pPos.join(bPos, Seq("cx", "cy", "cz"))
      .withColumn("dist_km", round(Derived.haversineKm(
        col("p_lat"), col("p_lon"), col("n_lat"), col("n_lon")), 4))
      .filter(col("dist_km") <= lit(radiusKm))
      .withColumn("lvl", dense_rank().over(wDense))
      .filter(col("lvl") <= k)
      .select("p_lat", "p_lon", "n_lat", "n_lon", "dist_km")
    val cand = posPairs.join(topMembers, Seq("n_lat", "n_lon"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("dist_km"), col("neighbor_id"))
    pBase.join(cand,
        col("lat") === col("p_lat") && col("lon") === col("p_lon"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("neighbor_id"), col("rank"), col("dist_km"))
  }

  def kNearestJoin(pts: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusKm: Double, k: Int): DataFrame = {
    val chord = 2.0 * math.sin((radiusKm + 0.001) / 12742.0)
    def rad(c: Column) = radians(c)
    def cellOf(c: Column): Column = floor(c / lit(chord)).cast("long")
    val base = pts.select(col(idCol).as("id"), col(latCol).as("lat"),
      col(lonCol).as("lon"))
    // 1. distinct positions
    val positions = base.select("lat", "lon").distinct()
      .withColumn("x", cos(rad(col("lat"))) * cos(rad(col("lon"))))
      .withColumn("y", cos(rad(col("lat"))) * sin(rad(col("lon"))))
      .withColumn("z", sin(rad(col("lat"))))
    // 2. per-position member cap: the k+1 smallest ids
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy("lat", "lon").orderBy("id")
    val topMembers = base
      .withColumn("mrn", row_number().over(wPos))
      .filter(col("mrn") <= k + 1)
      .select(col("lat").as("n_lat"), col("lon").as("n_lon"),
        col("id").as("neighbor_id"))
    // 3. position-level grid join (self-pair kept; probe side 1 cell,
    //    candidate side exploded to its 27 neighbor cells)
    val a = positions.select(col("lat").as("p_lat"), col("lon").as("p_lon"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"), cellOf(col("z")).as("cz"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"), lit(dz.toLong).as("dz"))
    val b = positions
      .withColumn("o", explode(array(offs: _*)))
      .select(col("lat").as("n_lat"), col("lon").as("n_lon"),
        (cellOf(col("x")) + col("o.dx")).as("cx"),
        (cellOf(col("y")) + col("o.dy")).as("cy"),
        (cellOf(col("z")) + col("o.dz")).as("cz"))
    val wDense = org.apache.spark.sql.expressions.Window
      .partitionBy("p_lat", "p_lon").orderBy("dist_km")
    val posPairs = a.join(b, Seq("cx", "cy", "cz"))
      .withColumn("dist_km", round(Derived.haversineKm(
        col("p_lat"), col("p_lon"), col("n_lat"), col("n_lon")), 4))
      .filter(col("dist_km") <= lit(radiusKm))
      .withColumn("lvl", dense_rank().over(wDense))
      .filter(col("lvl") <= k + 1)
      .select("p_lat", "p_lon", "n_lat", "n_lon", "dist_km")
    // 4. expand to members and take the exact top-k per probe point
    val cand = posPairs.join(topMembers, Seq("n_lat", "n_lon"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("dist_km"), col("neighbor_id"))
    base.join(cand,
        col("lat") === col("p_lat") && col("lon") === col("p_lon"))
      .filter(col("neighbor_id") =!= col("id"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("neighbor_id"), col("rank"), col("dist_km"))
  }

  /** Point-in-box ZONE TAGGING — "which zones contain this point", the
    * geofencing/coverage join (listing → school district, customer →
    * supplier service area): each point is tagged with the MIN zone id
    * containing it plus the count of containing zones; points covered by
    * no zone drop out (inner semantics, matching the SQL replay). Boxes
    * are axis-aligned [lat0, lat0+boxLatDeg] × [lon0, lon0+boxLonDeg]
    * with no antimeridian wrap.
    *
    * Plan shape — never a nested loop: a fixed lat/lon grid at EXACTLY
    * the box dimensions means a box overlaps at most 2 cells per axis
    * (≤ 4 cells) while a point lies in exactly ONE cell, so the
    * equi-join on (cla, clo) yields every (point, covering-box)
    * candidate exactly once — no distinct() needed — and candidate
    * volume is (boxes overlapping the point's cell) per point, never
    * |points| × |zones|. Cells are 2D (not 1D latitude bands) so
    * candidates are bounded in BOTH axes — the spatial cousin of
    * plans/RangeJoinRewrite's banding, one dimension up.
    *
    * Both sides COLLAPSE to distinct positions first (the j09/j10
    * weighted-point trick): coincident points share all candidate work
    * and re-attach by position at the end; coincident boxes pre-reduce
    * to (min zone id, zone count) per corner, which composes exactly
    * under the final min/sum. On the saturating synthetic lattices the
    * collapsed sides are CONSTANT in N (≤ 360 point positions, ≤ 2 100
    * box corners); on organic data the collapse is a map-side
    * pre-aggregation that can only shrink the join. No broadcast hints:
    * the collapsed sides are small enough that AQE picks the broadcast
    * at any tested scale, and at organic-zone scale the same plan
    * degrades gracefully to a shuffled equi-join on the cell id.
    */
  def zoneTag(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, zones: DataFrame, zoneIdCol: String,
      lat0Col: String, lon0Col: String,
      boxLatDeg: Double, boxLonDeg: Double): DataFrame = {
    require(boxLatDeg > 0 && boxLonDeg > 0, "box dimensions must be positive")
    val pts = points.select(col(idCol).as("id"),
      col(latCol).as("lat"), col(lonCol).as("lon"))
    val ppos = pts.select("lat", "lon").distinct()
      .withColumn("cla", floor(col("lat") / boxLatDeg).cast("long"))
      .withColumn("clo", floor(col("lon") / boxLonDeg).cast("long"))
    val zpos = zoneCells(zones, zoneIdCol, lat0Col, lon0Col,
      boxLatDeg, boxLonDeg)
    val tagged = ppos.join(zpos, Seq("cla", "clo"))
      .filter(col("lat") >= col("lat0") &&
        col("lat") <= col("lat0") + boxLatDeg &&
        col("lon") >= col("lon0") &&
        col("lon") <= col("lon0") + boxLonDeg)
      .groupBy("lat", "lon")
      .agg(min("zmin").as("zone_id"), sum("zcnt").as("n_zones"))
    pts.join(tagged, Seq("lat", "lon"))
      .select(col("id"), col("zone_id"), col("n_zones"))
  }

  /** Collapsed zone-corner CELL table shared by [[zoneTag]] and
    * [[zoneTagEachRow]]: coincident boxes pre-reduce to (min zone id,
    * zone count) per corner — which composes exactly under the callers'
    * final min/sum — then each corner explodes to its ≤ 2×2 covered grid
    * cells (grid pitch = exactly the box dims, so a box overlaps at most
    * 2 cells per axis).
    */
  private def zoneCells(zones: DataFrame, zoneIdCol: String,
      lat0Col: String, lon0Col: String,
      boxLatDeg: Double, boxLonDeg: Double): DataFrame =
    zones.select(col(zoneIdCol).as("zid"),
        col(lat0Col).as("lat0"), col(lon0Col).as("lon0"))
      .groupBy("lat0", "lon0")
      .agg(min("zid").as("zmin"), count(lit(1)).as("zcnt"))
      .withColumn("cla", explode(sequence(
        floor(col("lat0") / boxLatDeg).cast("long"),
        floor((col("lat0") + boxLatDeg) / boxLatDeg).cast("long"))))
      .withColumn("clo", explode(sequence(
        floor(col("lon0") / boxLonDeg).cast("long"),
        floor((col("lon0") + boxLonDeg) / boxLonDeg).cast("long"))))

  /** [[zoneTag]] without the point-side position collapse — tags each
    * point ROW independently, which is exactly what a STREAMING points
    * frame needs: the static zone side pre-reduces to the same collapsed
    * cell table ([[zoneCells]], planned per micro-batch like any
    * stream-static broadcast join), each arriving point equi-joins its
    * single (cla, clo) cell, and the only stateful step is the final
    * per-point min/sum aggregate (O(1) state per point id, complete-mode
    * convergent because every candidate for a point arrives in the
    * point's own micro-batch). Batch callers should prefer [[zoneTag]] —
    * the position collapse there can only shrink the join. Output:
    * (id, zone_id, n_zones), inner semantics (uncovered points drop out).
    */
  def zoneTagEachRow(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, zones: DataFrame, zoneIdCol: String,
      lat0Col: String, lon0Col: String,
      boxLatDeg: Double, boxLonDeg: Double): DataFrame = {
    require(boxLatDeg > 0 && boxLonDeg > 0, "box dimensions must be positive")
    val zc = zoneCells(zones, zoneIdCol, lat0Col, lon0Col,
      boxLatDeg, boxLonDeg)
    points.select(col(idCol).as("id"),
        col(latCol).as("lat"), col(lonCol).as("lon"))
      .withColumn("cla", floor(col("lat") / boxLatDeg).cast("long"))
      .withColumn("clo", floor(col("lon") / boxLonDeg).cast("long"))
      .join(zc, Seq("cla", "clo"))
      .filter(col("lat") >= col("lat0") &&
        col("lat") <= col("lat0") + boxLatDeg &&
        col("lon") >= col("lon0") &&
        col("lon") <= col("lon0") + boxLonDeg)
      .groupBy("id")
      .agg(min("zmin").as("zone_id"), sum("zcnt").as("n_zones"))
  }

  /** Box-box OVERLAP join with PER-A aggregates — "how many b-boxes does
    * each a-box intersect, and which is the smallest-id one": the
    * coverage/conflict query between two zone layers (service areas ×
    * listing clusters, districts × parcels). Boxes are axis-aligned,
    * closed intervals, no antimeridian wrap; a pair overlaps iff the
    * intervals intersect on BOTH axes (touching edges count).
    *
    * Plan shape — never a nested loop, never a pair materialization: the
    * grid pitch is the LARGER of the two box dims per axis, so EACH side
    * covers at most 2 cells per axis (≤ 4 cells); overlapping boxes must
    * share the cell containing their intersection's min corner, so the
    * pair is counted ONLY there (`floor(greatest(alat, blat)/pitch) =
    * cla`, likewise lon) — an exact dedup by filter, no distinct().
    * Both sides collapse to distinct corners first (the zoneTag/j09
    * weighted-point trick): the b side pre-reduces to (min id, count)
    * per corner, which composes exactly under the final min/sum, and the
    * a side re-attaches ids by corner at the end. On saturating lattices
    * the collapsed sides are CONSTANT in N; on organic data the collapse
    * is a map-side pre-aggregation that can only shrink the join. The
    * declared output is one row per a-box — LINEAR — while the pair
    * relation it aggregates may grow quadratically; that mass exists
    * only inside the per-cell join, pre-reduced by the corner counts
    * (the j11 lesson: never materialize the quadratic replay).
    * Output: (box_id, n_overlaps, min_b_id), inner semantics.
    */
  def boxOverlapStats(
      a: DataFrame, aIdCol: String, aLat0Col: String, aLon0Col: String,
      aLatDeg: Double, aLonDeg: Double,
      b: DataFrame, bIdCol: String, bLat0Col: String, bLon0Col: String,
      bLatDeg: Double, bLonDeg: Double): DataFrame = {
    require(aLatDeg > 0 && aLonDeg > 0 && bLatDeg > 0 && bLonDeg > 0,
      "box dimensions must be positive")
    val gLat = math.max(aLatDeg, bLatDeg)
    val gLon = math.max(aLonDeg, bLonDeg)
    val ab = a.select(col(aIdCol).as("box_id"),
      col(aLat0Col).as("alat"), col(aLon0Col).as("alon"))
    val apos = boxCells(ab.select("alat", "alon").distinct(),
      "alat", "alon", aLatDeg, aLonDeg, gLat, gLon)
    val perCorner = apos
      .join(bCornerCells(b, bIdCol, bLat0Col, bLon0Col, bLatDeg, bLonDeg,
        gLat, gLon), Seq("cla", "clo"))
      .filter(overlapAtMinCorner(aLatDeg, aLonDeg, bLatDeg, bLonDeg, gLat, gLon))
      .groupBy("alat", "alon")
      .agg(sum("bcnt").as("n_overlaps"), min("bmin").as("min_b_id"))
    ab.join(perCorner, Seq("alat", "alon"))
      .select(col("box_id"), col("n_overlaps"), col("min_b_id"))
  }

  /** [[boxOverlapStats]] without the a-side corner collapse — aggregates
    * per a ROW, which is exactly what a STREAMING a-side needs: the
    * static b side pre-reduces to the same collapsed corner-cell table
    * (planned per micro-batch like any stream-static dimension join),
    * each arriving a-box grid-explodes to its ≤ 2×2 covered cells
    * (bounded, stateless candidate work), pairs dedup by the
    * intersection-min-corner filter, and the only stateful step is the
    * final per-box sum/min aggregate — O(1) state per box id,
    * complete-mode convergent because every candidate for a box arrives
    * in the box's own micro-batch. Batch callers should prefer
    * [[boxOverlapStats]] — the corner collapse there can only shrink
    * the join. Output: (box_id, n_overlaps, min_b_id), inner semantics
    * (overlap-free boxes drop out).
    */
  def boxOverlapEachRow(
      a: DataFrame, aIdCol: String, aLat0Col: String, aLon0Col: String,
      aLatDeg: Double, aLonDeg: Double,
      b: DataFrame, bIdCol: String, bLat0Col: String, bLon0Col: String,
      bLatDeg: Double, bLonDeg: Double): DataFrame = {
    require(aLatDeg > 0 && aLonDeg > 0 && bLatDeg > 0 && bLonDeg > 0,
      "box dimensions must be positive")
    val gLat = math.max(aLatDeg, bLatDeg)
    val gLon = math.max(aLonDeg, bLonDeg)
    boxCells(a.select(col(aIdCol).as("box_id"),
        col(aLat0Col).as("alat"), col(aLon0Col).as("alon")),
        "alat", "alon", aLatDeg, aLonDeg, gLat, gLon)
      .join(bCornerCells(b, bIdCol, bLat0Col, bLon0Col, bLatDeg, bLonDeg,
        gLat, gLon), Seq("cla", "clo"))
      .filter(overlapAtMinCorner(aLatDeg, aLonDeg, bLatDeg, bLonDeg, gLat, gLon))
      .groupBy("box_id")
      .agg(sum("bcnt").as("n_overlaps"), min("bmin").as("min_b_id"))
  }

  /** Grid cells covered by each box: pitch (gLat, gLon) is the LARGER of
    * the two layers' dims per axis, so a (dLat, dLon) box covers at most
    * 2 cells per axis.
    */
  private def boxCells(df: DataFrame, latC: String, lonC: String,
      dLat: Double, dLon: Double, gLat: Double, gLon: Double): DataFrame = df
    .withColumn("cla", explode(sequence(
      floor(col(latC) / gLat).cast("long"),
      floor((col(latC) + dLat) / gLat).cast("long"))))
    .withColumn("clo", explode(sequence(
      floor(col(lonC) / gLon).cast("long"),
      floor((col(lonC) + dLon) / gLon).cast("long"))))

  /** b side collapsed to (min id, count) per distinct corner — composes
    * exactly under the callers' final min/sum — then exploded to covered
    * cells. */
  private def bCornerCells(b: DataFrame, bIdCol: String, bLat0Col: String,
      bLon0Col: String, bLatDeg: Double, bLonDeg: Double,
      gLat: Double, gLon: Double): DataFrame =
    boxCells(
      b.select(col(bIdCol).as("bid"),
          col(bLat0Col).as("blat"), col(bLon0Col).as("blon"))
        .groupBy("blat", "blon")
        .agg(min("bid").as("bmin"), count(lit(1)).as("bcnt")),
      "blat", "blon", bLatDeg, bLonDeg, gLat, gLon)

  /** Closed-interval overlap on both axes AND the exact-dedup-by-filter:
    * the pair is kept ONLY in the cell containing the intersection's min
    * corner. */
  private def overlapAtMinCorner(aLatDeg: Double, aLonDeg: Double,
      bLatDeg: Double, bLonDeg: Double, gLat: Double, gLon: Double): Column =
    col("alat") <= col("blat") + bLatDeg &&
      col("blat") <= col("alat") + aLatDeg &&
      col("alon") <= col("blon") + bLonDeg &&
      col("blon") <= col("alon") + aLonDeg &&
      floor(greatest(col("alat"), col("blat")) / gLat)
        .cast("long") === col("cla") &&
      floor(greatest(col("alon"), col("blon")) / gLon)
        .cast("long") === col("clo")
}
