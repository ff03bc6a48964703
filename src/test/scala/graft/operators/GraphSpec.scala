package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Integer micro-unit PageRank: recurrence checked against a scalar
  * replay, plus the invariances that make it oracle-checkable. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar replay of the same recurrence (undirected edges). */
  private def replay(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var ranks = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => ranks(u) / deg(u) }.sum
      }
      ranks = in.map { case (v, s) => v -> (150000L + 850000L * s / 1000000L) }
    }
    ranks
  }

  test("pageRank matches a scalar replay on a path-plus-hub graph") {
    // hub 1 touches 2,3,4; path 4-5-6: asymmetric degrees, so ranks differ
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L))
    val got = Graph.pageRank(pairs.toDF("id_a", "id_b"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == replay(pairs, 3), s"got $got")
    // the hub outranks the leaf
    assert(got(1L) > got(6L))
  }

  test("pageRank is invariant to pair orientation, duplicates, and partitioning") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val base = Graph.pageRank(pairs.toDF("id_a", "id_b")).as[(Long, Long)]
      .collect().toMap
    val messy = (pairs.map(_.swap) ++ pairs ++ pairs.take(2))
      .toDF("id_a", "id_b").repartition(13)
    val got = Graph.pageRank(messy).as[(Long, Long)].collect().toMap
    assert(got == base)
  }

  test("rank mass: every node's rank stays within [150000, deg-weighted bound]") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val got = Graph.pageRank(pairs.toDF("id_a", "id_b"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ >= 150000L))
    // star graph: total mass stays near n * 1e6 (damping leaks bounded mass)
    val total = got.values.sum
    assert(total > 3000000L && total < 6000000L, s"total $total")
  }

  test("triangleCount: K4 + planted triangle == brute force; dup/orientation/partitioning invariant") {
    // K4 on 1..4 (4 triangles, each corner in 3), a separate triangle
    // 7-8-9, a pendant edge 9-10 (10 in none), a path 5-6 (none)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (7L, 8L), (8L, 9L), (7L, 9L), (9L, 10L), (5L, 6L))
    def bruteForce(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keys.toSeq.sorted
      val tris = for {
        a <- nodes; b <- nodes if a < b && adj(a)(b)
        c <- nodes if b < c && adj(a)(c) && adj(b)(c)
      } yield Seq(a, b, c)
      tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    }
    val expect = bruteForce(pairs)
    assert(expect(1L) == 3L && expect(7L) == 1L && !expect.contains(10L))
    val got = Graph.triangleCount(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == expect, s"got $got expect $expect")
    // duplicates, reversed orientation, self-loops, and partitioning must
    // not change a single count
    val messy = (pairs ++ pairs.map(_.swap) ++ Seq((1L, 1L), (9L, 9L)))
      .toDF("id_a", "id_b").repartition(13)
    assert(Graph.triangleCount(messy).as[(Long, Long)].collect().toMap == expect)
  }
}
