package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column => mk, expression => ex}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the explicit operator form of runtime
  * filtering: build a compact membership sketch over the BUILD side's
  * join keys and apply it to the PROBE side's scan BEFORE its shuffle,
  * so rows that cannot match never leave the scan stage.
  *
  * The 100 TB story: when both join sides are too big to broadcast,
  * the join is a sort-merge over two full shuffles — and shuffle bytes
  * on the fact side dominate the query. A bloom over the (already
  * filter-reduced) build keys is a few MB regardless of fact-side
  * size, ships to every executor as a plan constant, and cuts the
  * fact-side exchange by the build side's selectivity (false-positive
  * rate ε adds only ε of the pruned volume back). Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injects the same shape
  * automatically in narrow cases; this operator is the explicit form
  * that composes with any plan and any key expression.
  *
  * The expression is a native Catalyst `UnaryExpression` with
  * `doGenCode` — the deserialized `BloomFilter` is attached to the
  * generated class as a reference object, so the probe stays inside
  * whole-stage codegen (one virtual call per row, no boxing).
  */
case class BloomMightContainLong(child: Expression, bits: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def nullSafeEval(v: Any): Any = bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def toString: String = s"bloom_might_contain($child)"
}

object BloomFunctions {

  /** Serialize a bloom over `keyCol` (LongType) of `df`. One build-side
    * aggregation job runs eagerly — the same work a broadcast build
    * would do, but the result is O(bits) not O(rows). */
  def buildLongFilter(df: DataFrame, keyCol: String,
                      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Predicate column: key ∈ bloom (false positives at the built fpp,
    * no false negatives — callers needing exactness re-verify with the
    * real join, which the pruning has already made cheap). */
  def mightContainLong(keyCol: Column, bits: Array[Byte]): Column =
    mk(BloomMightContainLong(ex(keyCol), bits))
}
