package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with codegen) for the hot paths Spark's
  * built-ins can't express in O(n): rolling document fingerprints and
  * float-vector similarity. Preference order per SURVEY.md §7: these beat
  * Scala UDFs (no ser/de, stay inside WholeStageCodegen).
  */

/** Rabin-Karp rolling polynomial hash over the UTF-8 bytes of a string:
  * `h = Σ byte·base^i mod m`, order-sensitive (transpositions change it,
  * unlike a bag-of-words hash). A built-in-only formulation needs a
  * per-character `substr` fold — O(n²) on UTF-8 — so this is a genuine
  * custom-Expression case, O(n) with codegen.
  */
case class RollingHashExpr(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.hashBytes(
      input.asInstanceOf[UTF8String].getBytes, base, mod)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} =
         |    (${ev.value} * ${base}L + ($bytes[$i] & 0xFF)) % ${mod}L;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashExpr = copy(child = newChild)
}

object RollingHashExpr {
  def hashBytes(bytes: Array[Byte], base: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    acc
  }
}

/** Dot product of two `array<float>` columns, O(d) with codegen — the inner
  * loop of brute-force and LSH cosine search. The built-in
  * `aggregate(zip_with(...))` formulation allocates two intermediate arrays
  * per row-pair; this reads both `ArrayData`s in place.
  */
case class FloatVecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an `array<float>` column. */
case class FloatVecNormExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fvec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      acc += x.getFloat(i).toDouble * x.getFloat(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $a.getFloat($i);
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FloatVecNormExpr = copy(child = newChild)
}

/** Column-level entry points. */
object native {
  import org.apache.spark.sql.graftshim.ColumnBridge
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def rolling_hash(text: Column, base: Long = 257L,
      mod: Long = 1000000007L): Column =
    c(RollingHashExpr(e(text), base, mod))

  def fvec_dot(a: Column, b: Column): Column = c(FloatVecDotExpr(e(a), e(b)))

  def fvec_norm(a: Column): Column = c(FloatVecNormExpr(e(a)))

  def fvec_cosine(a: Column, b: Column): Column =
    fvec_dot(a, b) / (fvec_norm(a) * fvec_norm(b))
}
