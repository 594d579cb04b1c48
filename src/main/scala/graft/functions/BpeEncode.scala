package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression applying a trained BPE merge table to text —
  * the APPLY half of byte-pair-encoding tokenization (Sennrich et al.
  * 2016, the published algorithm behind GPT-2/RoBERTa vocabularies; the
  * TRAIN half is `ml/Bpe.train`, an offline job).
  *
  * Per word (whitespace token, lowercased): start from single characters
  * and repeatedly merge every occurrence of the best-ranked adjacent
  * symbol pair until no mergeable pair remains — rank = merge-table
  * position, ties impossible (ranks are distinct by construction).
  * Returns the concatenated token stream for the document.
  *
  * Why an Expression (charter preference (b), the [[PqAssign]]/
  * [[DotProduct]] precedent): the merge loop is per-row imperative string
  * work that higher-order-function trees can't express, and a UDF would
  * break whole-stage codegen for every operator fused around it. The
  * generated code is ONE static call into [[BpeEncode.encode]] with the
  * rank table attached via `addReferenceObj` (the model-literal device) —
  * the stage stays fused and the hot loop runs as a single JITed method
  * on both paths, which also makes interpreted ≡ codegen trivially
  * bit-identical (same method).
  *
  * At 100 TB the merge table is a few thousand entries riding the closure
  * like any broadcast model; the scan stays embarrassingly parallel with
  * O(word length) state per row.
  */
case class BpeEncode(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {

  // deep equality: Array is reference-equal by default, which would break
  // semanticEquals/subexpression elimination (the PqAssign lesson)
  override def equals(other: Any): Boolean = other match {
    case that: BpeEncode =>
      child == that.child && merges.toSeq == that.merges.toSeq
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + merges.toSeq.hashCode()

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.rankTable(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(ranks, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeEncode.encode($r, $v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column-API entry point with the merge table bound. */
  def apply(text: Column, merges: Array[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(text), merges))

  /** Pair key: tokens never contain whitespace (words are whitespace
    * splits), so "a b" is collision-free. */
  private[graft] def rankTable(
      merges: Array[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      require(m.put(a + " " + b, Integer.valueOf(i)) == null,
        s"duplicate merge pair ($a, $b)")
    }
    m
  }

  /** Shared by interpreted eval and generated code — one method, one
    * behavior. Public only for codegen access. */
  def encode(ranks: java.util.HashMap[String, Integer],
      text: UTF8String): GenericArrayData = {
    val words = text.toString.toLowerCase.trim.split("\\s+")
    val out = new java.util.ArrayList[UTF8String]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = new java.util.ArrayList[String](w.length)
        var ci = 0
        while (ci < w.length) {
          // surrogate-pair-safe character split
          val cp = w.codePointAt(ci)
          val n = Character.charCount(cp)
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        var done = false
        while (!done && syms.size > 1) {
          // best-ranked adjacent pair present in the word
          var best = Int.MaxValue
          var i = 0
          while (i < syms.size - 1) {
            val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
            if (r != null && r.intValue() < best) best = r.intValue()
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            // merge every occurrence of the best pair, left to right
            val merged = new java.util.ArrayList[String](syms.size)
            var j = 0
            while (j < syms.size) {
              if (j < syms.size - 1 && {
                val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
                r != null && r.intValue() == best
              }) {
                merged.add(syms.get(j) + syms.get(j + 1))
                j += 2
              } else {
                merged.add(syms.get(j))
                j += 1
              }
            }
            syms = merged
          }
        }
        var k = 0
        while (k < syms.size) {
          out.add(UTF8String.fromString(syms.get(k)))
          k += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }
}
