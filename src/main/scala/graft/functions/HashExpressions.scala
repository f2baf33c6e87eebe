package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData

/** Custom codegen'd Catalyst expressions for the dedup hash kernels
  * (SURVEY.md §4: the one place profiling demanded a native `Expression` —
  * the HOF compositions in HashFunctions evaluate interpreted, element by
  * element, which made MinHash signatures ~50× slower than these).
  *
  * Each expression is null-intolerant, deterministic, and generates a single
  * static call into HashKernels, so it participates in whole-stage codegen
  * like a built-in.
  */
object HashExpressions {

  case class ShingleHashSet(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(s: Any): Any =
      HashKernels.shingleHashSet(s.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleHashSet($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
      copy(child = newChild)
  }

  case class RollingHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(s: Any): Any =
      HashKernels.rollingHash(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingHash($c)")
    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
  }

  case class RollingHashArray(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.rollingHashArray(arr.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingHashArray($c)")
    override protected def withNewChildInternal(newChild: Expression): RollingHashArray =
      copy(child = newChild)
  }

  case class MinhashSig(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.minhashSig(arr.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): MinhashSig =
      copy(child = newChild)
  }

  case class Simhash32(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(arr: Any): Any =
      HashKernels.simhash32(arr.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash32($c)")
    override protected def withNewChildInternal(newChild: Expression): Simhash32 =
      copy(child = newChild)
  }

  case class SimhashBits(child: Expression, bits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(arr: Any): Any =
      HashKernels.simhashBits(arr.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhashBits($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression): SimhashBits =
      copy(child = newChild)
  }

  case class LshBands(child: Expression, bands: Int, rows: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.lshBands(arr.asInstanceOf[ArrayData], bands, rows)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.lshBands($c, $bands, $rows)")
    override protected def withNewChildInternal(newChild: Expression): LshBands =
      copy(child = newChild)
  }

  case class TokenHashes(child: Expression, minLen: Int, maxLen: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(s: Any): Any =
      HashKernels.tokenHashes(s.asInstanceOf[UTF8String], minLen, maxLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.tokenHashes($c, $minLen, $maxLen)")
    override protected def withNewChildInternal(newChild: Expression): TokenHashes =
      copy(child = newChild)
  }

  case class WindowHashSet(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.windowHashSet(arr.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.windowHashSet($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WindowHashSet =
      copy(child = newChild)
  }

  case class WindowHashList(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.windowHashList(arr.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.windowHashList($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WindowHashList =
      copy(child = newChild)
  }

  case class UnitVector(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.unitVector(arr.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.unitVector($c)")
    override protected def withNewChildInternal(newChild: Expression): UnitVector =
      copy(child = newChild)
  }

  case class PlaneBands(child: Expression, bands: Int, bits: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.planeBands(arr.asInstanceOf[ArrayData], bands, bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.planeBands($c, $bands, $bits)")
    override protected def withNewChildInternal(newChild: Expression): PlaneBands =
      copy(child = newChild)
  }

  case class CenterVector(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.centerVector(arr.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.centerVector($c)")
    override protected def withNewChildInternal(newChild: Expression): CenterVector =
      copy(child = newChild)
  }

  case class PlaneProject(child: Expression, outDim: Int, seed: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(arr: Any): Any =
      HashKernels.planeProject(arr.asInstanceOf[ArrayData], outDim, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.planeProject($c, $outDim, $seed)")
    override protected def withNewChildInternal(newChild: Expression): PlaneProject =
      copy(child = newChild)
  }

  case class JaccardLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.jaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashKernels.jaccardLong($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardLong =
      copy(left = newLeft, right = newRight)
  }

  case class ContainmentLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.containmentLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashKernels.containmentLong($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ContainmentLong =
      copy(left = newLeft, right = newRight)
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashKernels.dotProduct($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  // Column-API wrappers (the public surface).
  def shingleHashSet(c: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(c), n))
  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
  def rollingHashArray(c: Column): Column =
    GraftBridge.column(RollingHashArray(GraftBridge.expression(c)))
  def minhashSig(c: Column, k: Int): Column =
    GraftBridge.column(MinhashSig(GraftBridge.expression(c), k))
  def simhash32(c: Column): Column =
    GraftBridge.column(Simhash32(GraftBridge.expression(c)))
  def simhashK(c: Column, bits: Int): Column =
    GraftBridge.column(SimhashBits(GraftBridge.expression(c), bits))
  def lshBands(c: Column, bands: Int, rows: Int): Column =
    GraftBridge.column(LshBands(GraftBridge.expression(c), bands, rows))
  def tokenHashesK(c: Column, minLen: Int = 2, maxLen: Int = 15): Column =
    GraftBridge.column(TokenHashes(GraftBridge.expression(c), minLen, maxLen))
  def windowHashSet(c: Column, n: Int): Column =
    GraftBridge.column(WindowHashSet(GraftBridge.expression(c), n))
  def windowHashList(c: Column, n: Int): Column =
    GraftBridge.column(WindowHashList(GraftBridge.expression(c), n))
  def dotK(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def unitVector(c: Column): Column =
    GraftBridge.column(UnitVector(GraftBridge.expression(c)))
  def planeBands(c: Column, bands: Int, bits: Int): Column =
    GraftBridge.column(PlaneBands(GraftBridge.expression(c), bands, bits))
  def planeProject(c: Column, outDim: Int, seed: Int): Column =
    GraftBridge.column(PlaneProject(GraftBridge.expression(c), outDim, seed))
  def centerVector(c: Column): Column =
    GraftBridge.column(CenterVector(GraftBridge.expression(c)))
  def jaccardLongK(a: Column, b: Column): Column =
    GraftBridge.column(JaccardLong(GraftBridge.expression(a), GraftBridge.expression(b)))
  def containmentLongK(a: Column, b: Column): Column =
    GraftBridge.column(ContainmentLong(GraftBridge.expression(a), GraftBridge.expression(b)))
}
