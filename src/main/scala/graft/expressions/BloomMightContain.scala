package graft.expressions

import graft.functions.BloomSketch
import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column-side membership probe against a [[graft.functions.BloomSketch]]
  * bit array — the executable half of the pre-filter story: the aggregated
  * filter bytes arrive as a (typically literal/broadcast) `binary` child,
  * the probe key streams through, and the probe stays inside
  * WholeStageCodegen (same xxhash64 + Kirsch–Mitzenmacher index sequence
  * as the build side, seed 42).
  *
  * `numBits`/`numHashes` are constructor parameters, NOT children: they
  * must match the build-side sizing exactly, and `numBits` can be
  * non-byte-aligned (the textbook optimum rarely lands on a multiple of
  * 8), so it cannot be recovered from the byte length.
  */
case class BloomMightContain(filter: Expression, key: Expression,
                             numBits: Int, numHashes: Int)
  extends BinaryExpression {
  // the SQL surface (`bloom_might_contain(f, k, m, h)`) reaches this
  // constructor with user-typed sizing — reject it at analysis time, not
  // as an executor ArithmeticException/ArrayIndexOutOfBounds mid-query
  require(numBits >= 8, s"numBits=$numBits must be >= 8 (build-side rule)")
  require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")

  override def left: Expression = filter
  override def right: Expression = key

  override def checkInputDataTypes(): TypeCheckResult =
    if (filter.dataType == BinaryType && key.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, string) inputs, " +
        s"got (${filter.dataType.sql}, ${key.dataType.sql})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(f: Any, k: Any): Any =
    BloomSketch.mightContainU(f.asInstanceOf[Array[Byte]],
      numBits, numHashes, k.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) => {
      val h = ctx.freshName("h")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i"); val bit = ctx.freshName("bit")
      val res = ctx.freshName("res")
      s"""
         |if ($f.length < ${(numBits + 7) / 8}) {
         |  throw new IllegalArgumentException(
         |    "bloom filter has " + $f.length + " bytes but numBits=" +
         |    $numBits + " needs ${(numBits + 7) / 8} — sizing mismatch");
         |}
         |final long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |  .hashUTF8String($k, 42L);
         |final int $h1 = (int) ($h >>> 32);
         |final int $h2 = ((int) $h) | 1;
         |boolean $res = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  final int $bit = java.lang.Math.floorMod($h1 + $i * $h2, $numBits);
         |  if (($f[$bit >>> 3] & (1 << ($bit & 7))) == 0) {
         |    $res = false; break;
         |  }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(filter = newLeft, key = newRight)
}

object BloomMightContain {
  /** Column API: probe `key` against aggregated `filter` bytes sized
    * (numBits, numHashes) — build and probe sizing MUST match.
    */
  def mightContain(filter: Column, key: Column,
                   numBits: Int, numHashes: Int): Column =
    GraftColumn(BloomMightContain(GraftColumn.expr(filter),
      GraftColumn.expr(key), numBits, numHashes))
}
