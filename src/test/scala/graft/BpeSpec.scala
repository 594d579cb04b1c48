package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.BpeEncode
import graft.ml.Bpe

/** BPE train + encode: learned merges match the published algorithm on a
  * corpus computable by hand, the native expression agrees with an
  * independent reference implementation, interpreted ≡ codegen, and
  * tokenization is lossless. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Independent straight-line reference encoder (deliberately different
    * structure from BpeEncode.encode): apply merges one rank at a time in
    * rank order. Equivalent because applying rank r can never create a
    * pair of rank < r out of thin air that was applied already... it CAN
    * in general — so this reference replays best-rank-first exactly like
    * the engine, but via a recursive scan instead of the iterative
    * ArrayList loop. */
  private def refEncodeWord(w: String, ranks: Map[(String, String), Int]): List[String] = {
    def step(syms: List[String]): List[String] = {
      val pairs = syms.zip(syms.drop(1))
      val present = pairs.flatMap(p => ranks.get(p).map(_ -> p))
      if (present.isEmpty) syms
      else {
        val (_, (a, b)) = present.minBy(_._1)
        def mergeAll(xs: List[String]): List[String] = xs match {
          case x :: y :: rest if x == a && y == b => (x + y) :: mergeAll(rest)
          case x :: rest => x :: mergeAll(rest)
          case Nil => Nil
        }
        step(mergeAll(syms))
      }
    }
    step(w.map(_.toString).toList)
  }

  test("train learns the most frequent pair first, deterministically") {
    val docs = Seq("aa ab aa ab aa", "ab aa ab aa", "cd cd").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val merges = Bpe.train(docs, nMerges = 3)
    // 'a a' appears 5x (in aa words), 'a b' 4x, 'c d' 2x
    assert(merges.head === ("a", "a"))
    assert(merges.contains(("a", "b")))
    assert(merges.contains(("c", "d")))
    // same corpus, different partitioning → same merges
    val merges2 = Bpe.train(docs.repartition(7), nMerges = 3)
    assert(merges.toSeq === merges2.toSeq)
  }

  test("native expression matches the independent reference encoder") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val merges = Bpe.train(docs, nMerges = 32)
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val got = docs.limit(50)
      .select($"doc_id", BpeEncode($"text", merges).as("toks"), $"text")
      .as[(Long, Seq[String], String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, toks, text) =>
      val want = text.toLowerCase.trim.split("\\s+").toList
        .filter(_.nonEmpty).flatMap(refEncodeWord(_, ranks))
      assert(toks.toList === want)
      // lossless: concatenating tokens reproduces the text sans whitespace
      assert(toks.mkString === text.toLowerCase.trim.replaceAll("\\s+", ""))
    }
  }

  test("interpreted eval is bit-identical to the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val merges = Bpe.train(docs, nMerges = 32)
    val expr = graft.functions.BpeEncode(
      BoundReference(0, StringType, nullable = false), merges)
    val fromDf = docs.limit(30)
      .select($"text", BpeEncode($"text", merges).as("toks"))
      .as[(String, Seq[String])].collect()
    fromDf.foreach { case (text, dfToks) =>
      val interp = expr.eval(InternalRow(UTF8String.fromString(text)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val toks = (0 until interp.numElements())
        .map(i => interp.getUTF8String(i).toString)
      assert(toks === dfToks)
    }
  }

  test("text_bpe key: compression < 1 and merges shrink token count") {
    val rows = Bpe.textBpe(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf0001).count())
    rows.foreach { case (_, nBpe, nSym0, ratio) =>
      assert(nBpe <= nSym0) // merges only ever shrink
      assert(nBpe > 0 && ratio > 0.0 && ratio <= 1.0)
    }
    // 64 merges on this vocabulary must actually compress (most of the
    // ~30-word vocab becomes single tokens)
    val mean = rows.map(_._4).sum / rows.length
    assert(mean < 0.5, s"mean compression $mean")
  }
}
