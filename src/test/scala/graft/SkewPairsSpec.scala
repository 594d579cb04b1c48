package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewPairs

/** Skew hardening for within-cell candidate generation: plants one giant
  * cell and asserts (a) the salted triangular join returns EXACTLY the
  * pair set of the plain self-join (no recall cost), and (b) sub-block
  * sizes — hence per-task pair counts — are bounded by the cap. */
class SkewPairsSpec extends SparkSuite {
  import spark.implicits._

  // one hot cell of 300 rows, two cold cells, ids deliberately interleaved
  // across cells so canonicalization (a.id < b.id) is exercised
  private lazy val skewed = (0 until 340).map { i =>
    val cell = if (i < 300) 0 else if (i < 320) 1 else 2
    (i.toLong, cell, i * 2.0)
  }.toDF("id", "cell", "payload")

  private val cap = 32

  test("salted pairs = plain self-join pairs, exactly (giant cell, no loss)") {
    val naive = skewed.as("x").join(skewed.as("y"),
        $"x.cell" === $"y.cell" && $"x.id" < $"y.id")
      .select($"x.id", $"y.id").as[(Long, Long)].collect().toSet
    val salted = SkewPairs.pairs(skewed, Seq("cell"), "id", cap)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    // 300·299/2 + 20·19/2 + 20·19/2 = 45230
    assert(naive.size === 45230)
    assert(salted === naive)
    // canonical order within each pair
    assert(salted.forall { case (a, b) => a < b })
  }

  test("per-sub-block row count is bounded → per-task pairs ≤ ~cap²") {
    val asg = SkewPairs.assignments(skewed, Seq("cell"), "id", cap)
    // nsub = ceil(cell_count / cap): 300/32 → 10, 20/32 → 1
    val nsubs = asg.select($"cell", $"_nsub").distinct()
      .as[(Int, Int)].collect().toMap
    assert(nsubs === Map(0 -> 10, 1 -> 1, 2 -> 1))
    // hash assignment balances: no sub-block holds more than 3×cap rows
    // (expected ~cap; the slack absorbs hash variance). A join bucket is
    // two sub-blocks, so per-task pairs ≤ (3·cap)·(3·cap) — bounded by the
    // cap, independent of the hot cell's total size.
    val maxBlock = asg.groupBy($"cell", $"_g").count()
      .agg(max("count")).as[Long].head()
    assert(maxBlock <= 3L * cap, s"hot sub-block of $maxBlock rows > ${3 * cap}")
    // the giant cell actually split (this is the skew case, not a no-op)
    val hotBlocks = asg.filter($"cell" === 0).select($"_g").distinct().count()
    assert(hotBlocks === 10)
  }

  test("cold cells degenerate to the plain self-join (nsub = 1, no blow-up)") {
    // a df with no cell over the cap must produce exactly one sub-block per
    // cell — replication factor 1, i.e. zero overhead vs the unsalted join
    val cold = (0 until 100).map(i => (i.toLong, i % 10)).toDF("id", "cell")
    val asg = SkewPairs.assignments(cold, Seq("cell"), "id", 64)
    assert(asg.select($"_nsub").distinct().as[Int].collect().toSeq === Seq(1))
    val pairs = SkewPairs.pairs(cold, Seq("cell"), "id", 64)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    assert(pairs.size === 10 * (10 * 9) / 2)
  }

  test("dedup_embed_ivf: pairs ⊆ brute force, equal cosines, exact dups found") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    // driver-side brute force over all pairs (500 vecs at sf0.001)
    val vecs = e.as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      i <- vecs.indices.iterator; j <- (i + 1) until vecs.length
      c = cos(vecs(i)._2, vecs(j)._2) if math.round(c * 1e6) / 1e6 >= 0.4
    } yield (vecs(i)._1, vecs(j)._1) -> math.round(c * 1e6) / 1e6).toMap
    val got = graft.operators.DedupOps.dedupEmbedIvf(spark, sf0001)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (a) every reported pair exists in brute force with the same cosine
    got.foreach { case (pair, c) =>
      assert(brute.get(pair).exists(b => math.abs(b - c) < 2e-6),
        s"$pair: ivf=$c brute=${brute.get(pair)}")
    }
    assert(got.nonEmpty)
    // (b) bit-identical vectors quantize to the same cell → always found
    val exactDups = (for {
      i <- vecs.indices.iterator; j <- (i + 1) until vecs.length
      if vecs(i)._2 == vecs(j)._2
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    assert(exactDups.forall(got.contains),
      s"missed exact-dup pairs: ${exactDups.filterNot(got.contains)}")
  }

  test("production sites return identical pairs under the salt (sf0.001)") {
    // dedup_embed through the public operator vs a naive in-test self-join
    // over the same vectors — the oracle equivalence, pinned locally
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
    val naive = e.as("a").join(e.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select(
        $"a.vec_id".as("va"), $"b.vec_id".as("vb"),
        round(graft.operators.DedupOps.cosine($"a.v", $"b.v"), 6).as("c"))
      .filter($"c" >= 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val got = graft.operators.DedupOps.dedupEmbed(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty) // the corpus has planted near-dup embeddings
  }
}
