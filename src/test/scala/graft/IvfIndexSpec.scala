package graft

import org.apache.spark.sql.functions._
import graft.ml.IvfIndex
import graft.operators.DedupOps

/** IVF index invariants: training converges, search is cell-restricted,
  * scores agree with brute force. */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private def emb = graft.sources.Tables.embeddings(spark, sf0001)

  test("Lloyd iterations never increase inertia") {
    val m0 = IvfIndex.train(emb, k = 8, iters = 0)
    val m2 = IvfIndex.train(emb, k = 8, iters = 2)
    val (i0, i2) = (IvfIndex.inertia(emb, m0), IvfIndex.inertia(emb, m2))
    assert(i2 <= i0, s"inertia rose: $i0 -> $i2")
    assert(i2 > 0)
  }

  test("training is deterministic across runs") {
    val a = IvfIndex.train(emb, k = 8, iters = 2)
    val b = IvfIndex.train(emb, k = 8, iters = 2)
    assert(a.centroids.map(_._1).toSeq === b.centroids.map(_._1).toSeq)
    a.centroids.zip(b.centroids).foreach { case ((_, ca), (_, cb)) =>
      assert(ca.toSeq === cb.toSeq)
    }
  }

  test("search: 10 rows, scores equal brute force, probe excluded") {
    val ivf = IvfIndex.simSearchIvf(spark, sf0001)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect()
    assert(ivf.length === 10)
    assert(!ivf.map(_._1).contains(0L))
    val all = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val probeV = all.filter($"vec_id" === 0).select($"v".as("p_v"))
    val brute = all.crossJoin(broadcast(probeV))
      .select($"vec_id", round(DedupOps.cosine($"v", $"p_v"), 6).as("c"))
      .as[(Long, Double)].collect().toMap
    ivf.foreach { case (id, c) => assert(c === brute(id), s"vec $id") }
  }
}
