package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}

/** Cosine similarity over two numeric arrays as a primitive loop —
  * no intermediate array allocation (unlike a zip_with/aggregate
  * higher-order composition, which builds a product array per row).
  * Accumulates left-to-right in double, matching DuckDB's
  * list_cosine_similarity for oracle parity. Accepts float or double
  * arrays; floats are widened per element.
  *
  * Codegen: emits a call to the static [[ArrCosineSim.compute]] loop
  * inside the generated code, so vector-heavy stages stay in
  * whole-stage codegen without the CodegenFallback per-row boxed-row
  * eval (~25% on a 2M x 64-dim scan). */
case class ArrCosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // lazy: children may be unresolved at construction time
  private lazy val lFloat = elemIsFloat(left)
  private lazy val rFloat = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrCosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrCosineSim.compute($a, $b, $lFloat, $rFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object ArrCosineSim {
  /** Shared primitive loop for interpreted and generated code. */
  def compute(a: ArrayData, b: ArrayData, lFloat: Boolean, rFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => mk, expression => ex}
  def arr_cosine(a: Column, b: Column): Column = mk(ArrCosineSim(ex(a), ex(b)))
}
