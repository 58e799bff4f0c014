package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Exactness of the degree-ordered triangle counter on graphs with
  * known closed-form counts, plus the canonicalization and determinism
  * guarantees the x_graph_triangles oracle comparison relies on. */
class TrianglesSpec extends AnyFunSuite with SparkTestBase {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  private def summaryRow(pairs: (Long, Long)*): Row =
    Triangles.summary(edges(pairs: _*)).collect().head

  test("K4: 4 triangles, 12 wedges, gcc = 1") {
    val k4 = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j)
    val r = summaryRow(k4: _*)
    assert(r.getAs[Long]("n_nodes") === 4)
    assert(r.getAs[Long]("n_edges") === 6)
    assert(r.getAs[Long]("n_wedges") === 12) // 4 * C(3,2)
    assert(r.getAs[Long]("n_tri") === 4)
    assert(r.getAs[Long]("gcc_bp") === 10000)
  }

  test("path and star: wedges but zero triangles, gcc = 0") {
    val path = summaryRow((1L, 2L), (2L, 3L), (3L, 4L))
    assert(path.getAs[Long]("n_wedges") === 2)
    assert(path.getAs[Long]("n_tri") === 0)
    assert(path.getAs[Long]("gcc_bp") === 0)
    // star: hub degree 4 → C(4,2) = 6 wedges, no closing edges; the
    // orientation points every edge INTO the hub (leaves have degree 1),
    // so the hub-quadratic wedge set is never materialized
    val star = summaryRow((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(star.getAs[Long]("n_wedges") === 6)
    assert(star.getAs[Long]("n_tri") === 0)
  }

  test("canonicalization: duplicates, reversed edges, self-loops collapse") {
    // triangle {1,2,3} fed as duplicated + reversed + self-loop noise
    val r = summaryRow((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L))
    assert(r.getAs[Long]("n_nodes") === 3)
    assert(r.getAs[Long]("n_edges") === 3)
    assert(r.getAs[Long]("n_tri") === 1)
    assert(r.getAs[Long]("gcc_bp") === 10000)
  }

  test("two triangles sharing an edge (diamond) + pendant: exact counts") {
    // nodes 1-2-3-4 with edges 12,13,23,24,34 (diamond) and pendant 4-5
    val r = summaryRow((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L))
    assert(r.getAs[Long]("n_tri") === 2)
    // deg: 1→2, 2→3, 3→3, 4→3, 5→1 ⇒ wedges 1+3+3+3+0 = 10
    assert(r.getAs[Long]("n_wedges") === 10)
    assert(r.getAs[Long]("gcc_bp") === 6000)
  }

  test("enumerate emits each triangle once, on string ids too") {
    import spark.implicits._
    val e = Seq(("x", "y"), ("y", "z"), ("x", "z"), ("z", "w"))
      .toDF("a", "b")
    val tri = Triangles.enumerate(e).collect()
    assert(tri.length === 1)
    val nodes = tri.head.toSeq.map(_.toString).toSet
    assert(nodes === Set("x", "y", "z"))
    // deterministic across runs
    assert(Triangles.enumerate(e).collect().toSeq ===
      Triangles.enumerate(e).collect().toSeq)
  }
}
