package graft

import org.apache.spark.sql.functions._
import graft.operators.{RelationalOps, TextOps}
import graft.sources.Tables

/** Invariants for sub-document dedup (span flagging / block removal)
  * beyond the DuckDB oracle: consistency with the document-level dedup
  * keys and conservation laws that must hold at any scale factor.
  */
class SpanDedupSpec extends SparkSuite {

  test("text_span_dedup: ratios bounded; exact-duplicate documents are " +
    "fully span-duplicated") {
    val rows = TextOps.textSpanDedup(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // dup spans <= spans
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // any byte-identical document pair (the dedup_exact signal) must have
    // every span shared → dup_ratio 1.0 on both members
    val dupDocs = Tables.documents(spark, sf0001)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    dupDocs.foreach { id => // vacuous at SFs without planted exact dups
      val r = byId(id)
      if (r.getLong(1) > 0) assert(r.getDouble(3) == 1.0)
    }
    // conservation: per-doc span totals add up to the corpus span count
    val totalSpans = Tables.documents(spark, sf0001)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .filter(size(col("toks")) >= 8)
      .select((size(col("toks")) - 7).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalSpans)
  }

  test("text_block_dedup: kept-block total equals the corpus's distinct " +
    "block count, and surviving text is a subsequence of the original") {
    val out = TextOps.textBlockDedup(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // conservation: every distinct block survives exactly once
    val distinctBlocks = out.map(_.getLong(1)).sum - // all blocks
      (out.map(_.getLong(1)).sum - out.map(_.getLong(2)).sum) // minus dropped
    val expected = Tables.documents(spark, sf0001)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(explode(expr(
        "transform(sequence(0, (size(toks) + 7) div 8 - 1)," +
          " b -> array_join(slice(toks, b * 8 + 1, 8), ' '))")).as("blk"))
      .distinct().count()
    assert(distinctBlocks == expected)
    // per doc: kept <= total, and the rebuilt text's tokens appear in the
    // original in order (subsequence of 8-token blocks)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rebuilt = r.getString(3)
      if (rebuilt.nonEmpty) {
        val orig = docs(r.getLong(0)).split("\\s+")
        val blocks = orig.grouped(8).map(_.mkString(" ")).toSeq
        val keptSeq = rebuilt.split("\\s+").grouped(8).map(_.mkString(" ")).toList
        // every kept block is one of the doc's own blocks, in order
        var idx = 0
        keptSeq.foreach { kb =>
          val at = blocks.indexOf(kb, idx)
          assert(at >= 0, s"block '$kb' not found in order")
          idx = at + 1
        }
      }
    }
  }

  test("source_overlap: one row per unordered source pair, Jaccard in " +
    "(0, 1], intersection bounded by the smaller vocabulary") {
    val sizes = Tables.documents(spark, sf0001)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(col("source"), explode(col("toks")).as("t")).distinct()
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = TextOps.sourceOverlap(spark, sf0001).collect()
    assert(rows.length == sizes.size * (sizes.size - 1) / 2)
    rows.foreach { r =>
      val (a, b, inter, j) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(inter <= math.min(sizes(a), sizes(b)))
      assert(j > 0.0 && j <= 1.0) // shared 30-word vocab ⇒ overlap exists
    }
  }

  test("text_collocations: bigram counts bounded by both unigram counts; " +
    "PMI matches the hand formula on a sampled pair") {
    val uni = Tables.documents(spark, sf0001)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUni = uni.values.sum.toDouble
    val rows = TextOps.textCollocations(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nBig = Tables.documents(spark, sf0001)
      .select((size(split(trim(lower(col("text"))), "\\s+")) - 1).as("m"))
      .agg(sum(col("m"))).collect().head.getLong(0).toDouble
    rows.foreach { r =>
      val (a, b, nab, pmi) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(nab >= 5 && nab <= math.min(uni(a), uni(b)))
      val ref = math.log((nab / nBig) / ((uni(a) / nUni) * (uni(b) / nUni)))
      assert(math.abs(pmi - ref) < 1e-6)
    }
  }

  test("dq_profile: generated data is clean — every check reports zero") {
    val rows = graft.operators.AnalyticsOps.dqProfile(spark, sf0001).collect()
    assert(rows.length == 9)
    rows.foreach(r => assert(r.getLong(1) == 0L, r.getString(0)))
  }

  test("embed_outlier: exactly the 5 lowest-cosine vectors per label, " +
    "scores bounded") {
    val out = graft.operators.SimilarityOps.embedOutlier(spark, sf0001)
      .collect()
    val perLabel = out.groupBy(_.getInt(0))
    perLabel.foreach { case (_, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to 5))
      rs.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
      // ranks are consistent with the scores (rank 1 = farthest)
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.sameElements(byRank.sorted))
    }
  }

  test("sample_negatives: no sampled pair was ever purchased; at most 5 " +
    "contiguous ranks per customer") {
    val neg = graft.operators.SqlSurfaceOps.sampleNegatives(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val purchased = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg.nonEmpty)
    neg.foreach { case (c, p, _) => assert(!purchased.contains((c, p))) }
    val nParts = Tables.part(spark, sf0001).count()
    neg.foreach { case (_, p, _) => assert(p >= 1 && p <= nParts) }
    neg.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length))
    }
  }

  test("join_bloom_prefilter: identical to the plain join, and the Bloom " +
    "stage actually prunes the fact side") {
    val got = RelationalOps.joinBloomPrefilter(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = Tables.lineitem(spark, sf0001)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Exact.sumRevenue(
          col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == plain.toSeq)
    // the Bloom stage is a true prefilter: applying it alone keeps a
    // superset of the matching rows but far less than the full fact table
    val li = Tables.lineitem(spark, sf0001)
    val bloomKept = RelationalOps.bloomPrefilteredFact(spark, sf0001).count()
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(bloomKept >= trueMatches)        // no false negatives
    assert(bloomKept < li.count() / 2)      // it actually prunes
  }
}
