package graft

import graft.etl.SpatialJoin
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial join: the ray-cast expression against
  * hand-checkable concave geometry, and grid blocking against the
  * unblocked brute-force join.
  */
class SpatialSpec extends SparkSpec {

  import spark.implicits._

  private def poly(id: Long, verts: (Long, Long)*) =
    Seq((id, verts)).toDF("poly_id", "raw")
      .select(col("poly_id"),
        transform(col("raw"), v =>
          struct(v.getField("_1").as("x"), v.getField("_2").as("y")))
          .as("vertices"))

  // L-shape: (0,0)→(4,0)→(4,4)→(2,4)→(2,2)→(0,2) — concave notch at x<2,y>2
  private def lShape = poly(1L, (0L, 0L), (4L, 0L), (4L, 4L), (2L, 4L),
    (2L, 2L), (0L, 2L))

  test("ray cast handles a concave polygon: inside, notch, and outside points") {
    val pts = Seq((1L, 3L, 3L), (2L, 1L, 3L), (3L, 1L, 1L), (4L, 5L, 1L),
      (5L, -1L, -1L)).toDF("pt_id", "px", "py")
    val inside = pts.crossJoin(lShape)
      .where(SpatialJoin.containsPoint(col("vertices"), col("px"), col("py")))
      .select("pt_id").as[Long].collect().toSet
    assert(inside == Set(1L, 3L), // (3,3) in the arm, (1,1) in the base
      s"got $inside — (1,3) sits in the concave notch and must be OUT")
  }

  test("grid blocking finds every pair the brute-force join finds") {
    // polygons straddle many cells relative to cellSize=8; points scattered
    val polys = poly(1L, (0L, 0L), (40L, 0L), (40L, 40L), (20L, 40L),
      (20L, 20L), (0L, 20L))
      .union(poly(2L, (50L, 50L), (90L, 55L), (70L, 95L)))
    val pts = (0L until 200L).map(i => (i, i * 7 % 100 - 2, i * 11 % 100 - 2))
      .toDF("pt_id", "px", "py")
    val blocked = SpatialJoin.pointInPolygon(pts, "pt_id", col("px"),
      col("py"), polys, "poly_id", col("vertices"), cellSize = 8L)
      .as[(Long, Long)].collect().toSet
    val brute = pts.crossJoin(polys)
      .where(SpatialJoin.containsPoint(col("vertices"), col("px"), col("py")))
      .select(col("pt_id"), col("poly_id")).as[(Long, Long)].collect().toSet
    assert(blocked == brute, s"blocked=${blocked.size} brute=${brute.size}")
    assert(brute.nonEmpty && brute.exists(_._2 == 1L) && brute.exists(_._2 == 2L),
      "fixture must put points inside BOTH polygons")
  }
}
