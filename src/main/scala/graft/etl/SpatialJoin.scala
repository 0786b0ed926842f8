package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial join — the engine analog of the reference's
  * geospatial dimension (aggregates_python_helpers.py:8,82 loads the
  * powiaty shapefile via geopandas; the reference only reads name/code
  * columns, but the dim IS a polygon layer, so a complete engine needs
  * the containment join).
  *
  * Spark-first shape, no geo library:
  *  - polygons are plain rows with a `vertices: array<struct<x,y>>` ring
  *    (closed implicitly — last vertex connects to first);
  *  - blocking is a GRID-CELL equi-join, not a cross join: each polygon
  *    replicates onto the cells its bbox overlaps (bounded by
  *    ceil(bbox/cell)²), each point maps to exactly ONE cell, and the
  *    hash join on (cellx, celly) bounds candidate pairs the same way
  *    the binned RangeJoin bounds interval probes. A point inside a
  *    polygon is inside its bbox, so blocking is recall-complete;
  *  - the exact test is even-odd ray casting evaluated INSIDE the join
  *    as codegen'd array ops (`filter` over the edge list), with
  *    integer-exact crossing arithmetic — (px-xi)·dy vs (py-yi)·dx
  *    compared with the dy-sign flip instead of a fp division — so the
  *    verdict is engine-portable (an ANSI-SQL oracle reproduces it
  *    bit-for-bit) and safe on any simple (incl. non-convex) polygon.
  *
  * Scale: shuffles carry (cell, point) and (cell, polygon) rows only;
  * polygon payloads replicate ×overlapped-cells (size the cell to the
  * MEDIAN polygon bbox — a continent-sized outlier should be split
  * upstream). No driver-side geometry, no R-tree to build or ship.
  */
object SpatialJoin {

  /** Even-odd (ray-casting) containment test as a pure Column expression:
    * a ray from (px, py) toward +x crosses edge (a, b) iff the edge spans
    * py half-openly ((a.y > py) != (b.y > py)) and the crossing point lies
    * right of px — tested as an integer cross-product inequality whose
    * direction flips with sign(dy), never a division.
    */
  def containsPoint(vertices: Column, px: Column, py: Column): Column = {
    val n = size(vertices)
    val edges = transform(vertices, (a, i) =>
      struct(a.as("a"), element_at(vertices, pmod(i + 1, n) + 1).as("b")))
    val crossings = filter(edges, e => {
      val (xi, yi) = (e.getField("a").getField("x"), e.getField("a").getField("y"))
      val (xj, yj) = (e.getField("b").getField("x"), e.getField("b").getField("y"))
      val spans = (yi > py) =!= (yj > py)
      val dy = yj - yi
      val lhs = (px - xi) * dy
      val rhs = (py - yi) * (xj - xi)
      spans && when(dy > 0, lhs < rhs).otherwise(lhs > rhs)
    })
    pmod(size(crossings), lit(2)) === 1
  }

  /** All (point, polygon) containment pairs via grid blocking.
    *
    * `points`: (pointId, x, y) integer coordinates; `polygons`:
    * (polyId, verticesCol) with an array<struct<x,y>> ring. `cellSize`
    * is the grid pitch — points never replicate, polygons replicate to
    * ceil(bboxW/cell)·ceil(bboxH/cell) cells.
    */
  def pointInPolygon(points: DataFrame, pointId: String, px: Column,
      py: Column, polygons: DataFrame, polyId: String, verticesCol: Column,
      cellSize: Long): DataFrame = {
    val cell = lit(cellSize)
    val xs = transform(verticesCol, v => v.getField("x"))
    val ys = transform(verticesCol, v => v.getField("y"))
    val polyCells = polygons.select(col(polyId).as("poly_id"),
        verticesCol.as("vertices"),
        floor(array_min(xs) / cell).as("cx0"),
        floor(array_max(xs) / cell).as("cx1"),
        floor(array_min(ys) / cell).as("cy0"),
        floor(array_max(ys) / cell).as("cy1"))
      .select(col("poly_id"), col("vertices"),
        explode(sequence(col("cx0"), col("cx1"))).as("cellx"),
        col("cy0"), col("cy1"))
      .select(col("poly_id"), col("vertices"), col("cellx"),
        explode(sequence(col("cy0"), col("cy1"))).as("celly"))
    val pts = points.select(col(pointId).as("pt_id"), px.as("px"), py.as("py"),
      floor(px / cell).as("cellx"), floor(py / cell).as("celly"))
    pts.join(polyCells, Seq("cellx", "celly"))
      .where(containsPoint(col("vertices"), col("px"), col("py")))
      .select("pt_id", "poly_id")
  }
}

/** Geometry-typed warehouse dimension — the engine analog of the
  * reference's `load_shapefile_to_bigquery` (aggregates_python_helpers
  * .py:743: shapefile → WKT text column → BigQuery GEOGRAPHY). Parquet has
  * no geometry type, so the portable layout is the same one BigQuery
  * ingests: the polygon as WKT TEXT plus its integer bbox as four plain
  * columns — and the bbox columns are what make the layout FAST, because
  * a spatial range probe ("dims overlapping this viewport") compiles to
  * ordinary min/max predicates that push down to the parquet scan and
  * prune row groups; the WKT blob itself is never filtered on.
  *
  * Scale shape: [[write]] sorts by the Z-order key of (xmin, ymin) (the
  * §2-34c clustering rule), so bbox-range predicates touch a bounded run
  * of row groups instead of the whole dim. [[toWkt]]/[[fromWkt]] are pure
  * built-in column expressions (transform/concat_ws/split) — codegen'd,
  * no UDF, engine-reproducible text (the q85 oracle rebuilds the WKT
  * byte-for-byte in SQL). Coordinates are assumed non-negative (shift
  * signed CRS units upstream; the Z-order key interleaves low 32 bits).
  */
object GeometryDim {

  /** `array<struct<x,y>>` ring → WKT POLYGON text (ring closed by
    * repeating the first vertex, per the WKT spec).
    */
  def toWkt(vertices: Column): Column = {
    val pts = transform(vertices, v =>
      concat(v.getField("x").cast("string"), lit(" "),
        v.getField("y").cast("string")))
    concat(lit("POLYGON (("),
      concat_ws(", ", concat(pts, slice(pts, 1, 1))), lit("))"))
  }

  /** WKT POLYGON text → `array<struct<x,y>>` ring (closing duplicate
    * vertex dropped) — the read side of the round trip.
    */
  def fromWkt(wkt: Column): Column = {
    val inner = regexp_replace(wkt, "^POLYGON \\(\\(|\\)\\)$", "")
    val pts = split(inner, ", ")
    transform(slice(pts, lit(1), size(pts) - 1), p => struct(
      split(p, " ").getItem(0).cast("long").as("x"),
      split(p, " ").getItem(1).cast("long").as("y")))
  }

  /** (wkt, xmin, ymin, xmax, ymax) projection of a polygon layer. */
  def asGeometryColumns(polygons: DataFrame, polyId: String,
      verticesCol: Column): DataFrame = {
    val xs = transform(verticesCol, v => v.getField("x"))
    val ys = transform(verticesCol, v => v.getField("y"))
    polygons.select(col(polyId).as("poly_id"),
      toWkt(verticesCol).as("wkt"),
      array_min(xs).as("xmin"), array_min(ys).as("ymin"),
      array_max(xs).as("xmax"), array_max(ys).as("ymax"))
  }

  /** Land the geometry dim Z-order-clustered on (xmin, ymin) so bbox
    * range predicates prune row groups.
    */
  def write(polygons: DataFrame, polyId: String, verticesCol: Column,
      path: String): Unit =
    asGeometryColumns(polygons, polyId, verticesCol)
      .sortWithinPartitions(
        graft.functions.F.zorder2(col("xmin"), col("ymin")))
      .write.mode("overwrite").parquet(path)

  /** Read back with an optional bbox-overlap probe — plain min/max
    * predicates that push to the scan (PushedFilters; Round6Spec
    * asserts), then the ring re-materializes from WKT.
    */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
      bbox: Option[(Long, Long, Long, Long)] = None): DataFrame = {
    val base = spark.read.parquet(path)
    val probed = bbox match {
      case Some((x0, y0, x1, y1)) =>
        base.where(col("xmin") <= x1 && col("xmax") >= x0 &&
          col("ymin") <= y1 && col("ymax") >= y0)
      case None => base
    }
    probed.withColumn("vertices", fromWkt(col("wkt")))
  }
}
