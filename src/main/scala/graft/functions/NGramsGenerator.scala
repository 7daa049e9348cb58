package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True UDTF tier (SURVEY.md §2.10): a custom Catalyst [[Generator]] that
  * emits `(pos, ngram)` rows straight from a token array.
  *
  * Why a Generator and not `posexplode(shingles(...))`: the expression
  * form materializes the COMPLETE n-gram array per document (an
  * `Array[UTF8String]` of size ≈ token count) before the Generate
  * operator explodes it. This generator streams one n-gram at a time
  * through an iterator — peak per-row allocation is one n-gram, not one
  * document's worth — which is the difference that matters when a 100 TB
  * corpus has million-token outlier documents. Duplicates are preserved
  * (positions are part of the output), matching `shinglesAll` semantics.
  *
  * Runs through `GenerateExec` in eval mode (custom generators are
  * outside explode's codegen special case) — the per-row cost is the
  * string concatenation itself; the surrounding stages stay codegen'd.
  */
case class NGramsGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngrams_gen requires (ARRAY<STRING>, n >= 1), got ${child.dataType.simpleString}, n=$n")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val m = arr.numElements()
      (0 to m - n).iterator.map { i =>
        var j = 0
        var len = n - 1 // separator bytes
        while (j < n) { len += arr.getUTF8String(i + j).numBytes(); j += 1 }
        val sb = new java.lang.StringBuilder(len)
        j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override def terminate(): IterableOnce[InternalRow] = Iterator.empty

  override def prettyName: String = "ngrams_gen"

  override protected def withNewChildInternal(newChild: Expression): NGramsGenerator =
    copy(child = newChild)
}

object NGramsGenerator {
  /** Register `ngrams_gen(tokens, n)` in the session registry (idempotent);
    * n must be a foldable integer literal. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("ngrams_gen")
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[NGramsGenerator].getName, "ngrams_gen"),
        (exprs: Seq[Expression]) =>
          NGramsGenerator(exprs.head, exprs(1).eval().asInstanceOf[Int]))
    }
  }
}
