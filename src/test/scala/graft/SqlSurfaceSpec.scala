package graft

import graft.operators.SqlSurfaceOps

/** Per-operator checks for the second-ring SQL surface (SqlSurfaceOps):
  * semantic invariants on sf0.001 plus plan-shape assertions for the
  * operators whose whole point is the at-scale physical plan (the
  * bucketed band join must not be a nested-loop join). */
class SqlSurfaceSpec extends SparkSuite {

  test("grouping_sets emits exactly the two declared sets") {
    val rows = SqlSurfaceOps.groupingSetsAgg(spark, sf0001).collect()
    // every row aggregates over exactly one of the two columns
    assert(rows.forall(r => r.getInt(4) + r.getInt(5) == 1))
    val total = Seq(
      rows.filter(_.getInt(4) == 0).map(_.getLong(2)).sum,
      rows.filter(_.getInt(5) == 0).map(_.getLong(2)).sum)
    // both sets partition the same input
    assert(total.distinct.size == 1)
  }

  test("intersect ∪ except = all click users, disjointly") {
    val inter = SqlSurfaceOps.setIntersect(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val excpt = SqlSurfaceOps.setExcept(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert((inter & excpt).isEmpty)
    val clickUsers = graft.sources.Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert((inter | excpt) == clickUsers)
  }

  test("full outer join keeps nations present on either side") {
    val rows = SqlSurfaceOps.joinFullOuter(spark, sf0001).collect()
    // no row may be 0/0 — full outer only emits matched-or-one-sided rows
    assert(rows.forall(r => r.getLong(1) > 0 || r.getLong(2) > 0))
  }

  test("band join matches a brute-force reference and is not nested-loop") {
    val df = SqlSurfaceOps.joinRange(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))

    // brute force on the driver (fine at sf0.001: 1k events)
    val ev = graft.sources.Tables.eventsRawNanos(spark, sf0001)
      .selectExpr("event_id", "user_id", "event_type", "ts div 1000 as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val expect = ev.filter(_._3 == "error").map { e =>
      e._1 -> clicks.count(c => c._2 == e._2 &&
        c._4 >= e._4 - 60000000L && c._4 <= e._4).toLong
    }.toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("cumulative sums per customer are distinct strictly-increasing prefixes") {
    // output order is o_orderkey, accumulation order is o_orderdate — so
    // sort the collected sums: prefix sums of positive prices must then be
    // strictly increasing, and the largest must equal the customer's total
    val rows = SqlSurfaceOps.windowCumsum(spark, sf0001).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sums = rs.map(_.getDouble(2)).sorted
      assert(sums.zip(sums.tail).forall { case (a, b) => a < b })
      assert(sums.head > 0)
    }
  }

  test("ntile splits orders into 4 near-equal quartiles") {
    val rows = SqlSurfaceOps.windowNtile(spark, sf0001).collect()
    val sizes = rows.groupBy(_.getInt(2)).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("conditional aggregates are consistent with their own total") {
    val rows = SqlSurfaceOps.conditionalAgg(spark, sf0001).collect()
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(rows.forall(r => r.getLong(4) <= r.getLong(1)))
  }

  test("string_agg joins nation names sorted and complete") {
    val rows = SqlSurfaceOps.stringAgg(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val names = r.getString(1).split(",")
      assert(names.length == 5) // 25 nations / 5 regions
      assert(names.sorted.sameElements(names))
    }
  }

  test("unioned daily HLL sketches estimate the period total within 5%") {
    import org.apache.spark.sql.functions._
    // the raw union estimate (the key now emits its BOUND boolean, so the
    // tight 5% property is re-derived here from the same plan pieces)
    val approx = graft.sources.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
      .collect().head.getLong(0).toDouble
    val exact = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count().toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
    // the registered key: exact columns correct, bound boolean true, and
    // the union genuinely dedups across days (total < Σ daily distincts)
    val r = SqlSurfaceOps.approxDistinctMerge(spark, sf0001).collect().head
    assert(r.getLong(2).toDouble === exact) // exact_total_users
    assert(r.getBoolean(3), "union_ok bound violated")
    assert(exact < r.getLong(1)) // sum_daily_exact overcounts multi-day users
  }

  test("approx distinct stays within 5% of exact") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    raw.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
    // the registered key: exact counts + bound booleans all true
    val key = SqlSurfaceOps.approxDistinct(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    raw.foreach { r =>
      val (e, ok) = key(r.getString(0))
      assert(e === r.getLong(2) && ok, s"${r.getString(0)}")
    }
  }

  test("map round-trip equals the plain groupBy count") {
    val viaMap = SqlSurfaceOps.mapFuncs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaMap == direct)
  }

  test("window_rank_family: ranks are valid rationals, first/last bracket the value") {
    val rows = SqlSurfaceOps.windowRankFamily(spark, sf0001).collect()
    rows.foreach { r =>
      val (v, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= v && v <= hi)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // percent_rank
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)  // cume_dist
    }
  }

  test("array_funcs: non_browse is types minus click/view, sorted") {
    val rows = SqlSurfaceOps.arrayFuncs(spark, sf0001).collect()
    def parse(s: String): Seq[String] =
      if (s.isEmpty) Seq.empty else s.split(",").toSeq
    rows.foreach { r =>
      val types = parse(r.getString(1))
      val nb = parse(r.getString(4))
      assert(types.sorted == types)
      assert(nb.toSet == types.toSet -- Set("click", "view"))
      assert(r.getInt(2) === types.length)
      assert(r.getBoolean(3) === types.contains("purchase"))
    }
  }

  test("approx percentiles stay within sketch error of the exact form") {
    import org.apache.spark.sql.functions._
    val exact = SqlSurfaceOps.percentileGroup(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // raw sketch values (the key now emits the rank-bracket booleans, so
    // the 5%-of-exact VALUE property is re-derived from the raw sketch)
    val approx = graft.sources.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("a"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("b"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("c"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (a50q, a90q, a50p)) =>
      val (e50q, e90q, e50p) = exact(k)
      assert(math.abs(a50q - e50q) <= 0.05 * math.max(1.0, e50q), s"$k p50_qty")
      assert(math.abs(a90q - e90q) <= 0.05 * math.max(1.0, e90q), s"$k p90_qty")
      assert(math.abs(a50p - e50p) <= 0.05 * math.max(1.0, e50p), s"$k p50_price")
    }
    // the registered key: rank-bracket booleans all true per group
    SqlSurfaceOps.percentileGroupApprox(spark, sf0001).collect()
      .foreach { r =>
        assert(r.getLong(1) > 0)
        assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
          s"${r.getString(0)} rank bracket violated")
      }
  }

  test("variant extraction equals the string-path get_json_object") {
    import org.apache.spark.sql.functions._
    val viaVariant = SqlSurfaceOps.variantJson(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaString = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaVariant === viaString)
  }

  test("unpivot triples the row count and preserves values") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val long = SqlSurfaceOps.unpivotStack(spark, sf0001)
    assert(long.count() === li.count() * 3)
    val plan = long.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(1500)) // no join, no shuffle
  }

  test("per-group percentiles are ordered and within data range") {
    val rows = SqlSurfaceOps.percentileGroup(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2)) // p50 <= p90
      assert(r.getDouble(1) >= 1.0 && r.getDouble(2) <= 50.0)
    }
  }

  test("width_bucket histogram covers all orders exactly once") {
    val total = SqlSurfaceOps.widthBucketHist(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head.getLong(0)
    assert(total === graft.sources.Tables.orders(spark, sf0001).count())
  }

  test("sample_hash reads a pushed-down predicate, not a full scan") {
    val plan = SqlSurfaceOps.sampleHash(spark, sf0001)
      .queryExecution.executedPlan.toString
    // modulus itself can't push to parquet, but the filter must sit
    // directly on the scan within the same codegen stage (no shuffle first)
    assert(plan.contains("pmod"), plan.take(2000))
  }

  test("sample_mixture: the scarcest language binds (some lang's feasible " +
    "corpus equals the chosen N), targets honor the declared mixture, and " +
    "kept counts never exceed availability") {
    val rows = SqlSurfaceOps.sampleMixture(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == Set("en", "de", "fr", "es", "zh"))
    val n = rows.map(r => r.getLong(1) * 10 / r.getLong(2)).min
    rows.foreach { r =>
      val (avail, w, tgt, ppm, kept) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(tgt == w * n / 10)       // target honors the weight exactly
      assert(tgt <= avail)            // never asks for more than exists
      assert(ppm >= 0 && ppm <= 1000000)
      assert(kept <= avail)
      // thresholded-uniform acceptance lands near the target rate: the
      // deviation of a deterministic-hash Bernoulli stays well inside a
      // quarter of the STRATUM size (≈4σ at these counts; es at sf0.001
      // sits 2.5σ off). Exactness is not the point here — the oracle
      // hash-check pins bit-exact reproducibility separately.
      assert(math.abs(kept - tgt) <= math.max(10L, avail / 4))
    }
    // the binding language's feasible corpus IS the corpus: its
    // availability*10/weight equals n by construction of the min
    assert(rows.exists(r => r.getLong(1) * 10 / r.getLong(2) == n))
  }

  test("sample_temperature: α=0.5 weights are exact, targets respect the " +
    "budget and the one-epoch cap, and sampling rates favor scarce langs") {
    val rows = SqlSurfaceOps.sampleTemperature(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avail, wppm, tgt, ppm, kept) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(wppm == math.floor(math.sqrt(avail.toDouble) * 1e6).toLong)
      assert(tgt <= avail)            // no upsampling past one epoch
      assert(ppm >= 0 && ppm <= 1000000)
      assert(kept <= avail)
      // hash-thresholded acceptance lands near the target (same bound
      // discipline as sample_mixture above)
      assert(math.abs(kept - tgt) <= math.max(10L, avail / 4))
    }
    // Σ targets never exceed the 60% budget
    val total = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(3)).sum <= total * 6 / 10)
    // the temperature property: sampling RATE (target/avail) is monotone
    // non-increasing in availability — scarce languages are favored
    val byAvail = rows.sortBy(_.getLong(1))
      .map(r => r.getLong(3).toDouble / r.getLong(1))
    assert(byAvail.zip(byAvail.tail).forall { case (scarce, rich) =>
      scarce >= rich - 1e-9 })
  }

  test("split_train_eval: partitions the corpus, train holds the bulk") {
    val rows = SqlSurfaceOps.splitTrainEval(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(rows.values.sum == total)    // every doc in exactly one split
    assert(rows.getOrElse("train", 0L) > total * 9 / 10)
    // splits are stable: rerun assigns identically
    val again = SqlSurfaceOps.splitTrainEval(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === again)
  }

  test("sample_epoch_shuffle: each epoch is a permutation of the corpus, " +
    "positions are contiguous per shard, and epochs genuinely reshuffle") {
    val rows = SqlSurfaceOps.sampleEpochShuffle(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    (1 to 2).foreach { e =>
      val epoch = rows.filter(_._1 == e)
      assert(epoch.length.toLong === total) // every doc exactly once
      assert(epoch.map(_._4).distinct.length.toLong === total)
      epoch.groupBy(_._2).foreach { case (_, shard) =>
        assert(shard.map(_._3).sorted.toSeq === (1 to shard.length).toSeq)
      }
    }
    // the epoch salt must produce a GENUINE reshuffle, not a shard
    // relabeling (the additive-salt defect this spec once missed): each
    // epoch-1 shard's documents must scatter across several epoch-2
    // shards, and the relative order of co-sharded documents must flip
    // for a substantial fraction of pairs
    val s1 = rows.filter(_._1 == 1).map(r => r._4 -> (r._2, r._3)).toMap
    val e2 = rows.filter(_._1 == 2)
    e2.groupBy(r => s1(r._4)._1).foreach { case (shard1, docs) =>
      val fanout = docs.map(_._2).distinct.length
      assert(fanout >= 4, s"epoch-1 shard $shard1 fans out to only $fanout")
    }
    // and within an epoch-2 shard, the epoch-1 positions of its members
    // must not arrive in sorted order (an order-preserving relabel
    // would keep them monotone) — checked per shard with enough members
    val ord = Ordering[(Int, Int)]
    val monotone = e2.groupBy(_._2).values.collect {
      case docs if docs.length >= 10 =>
        val e1pos = docs.sortBy(_._3).map(r => s1(r._4))
        e1pos.sliding(2).forall {
          case Array(a, b) => ord.lteq(a, b)
          case _ => true
        }
    }
    assert(monotone.nonEmpty && monotone.count(identity) == 0,
      "an epoch-2 shard preserved epoch-1 ordering wholesale")
  }

  test("window_hopping: every event lands in exactly 3 windows, starts are " +
    "slide-aligned, and spans cover the event") {
    val rows = graft.operators.RelationalOps.windowHopping(spark, sf0001)
      .collect()
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == 3L * nEvents)
    val slideUs = 300L * 1000000L
    assert(rows.forall(r => r.getLong(1) % slideUs == 0L))
  }
}
