package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a BROADCAST Bloom filter, as a native
  * expression — the codegen twin of `udf(s => bf.value.mightContainString(s))`.
  *
  * Why not Spark's own `BloomFilterMightContain`: that expression requires
  * the serialized filter embedded as a foldable (Literal/subquery) child,
  * so every task deserializes it from the PLAN — fine for the
  * runtime-join-filter sizes it was built for, wrong for a
  * decontamination filter that can reach hundreds of MB at the 100M-item
  * scale, where torrent broadcast is the right transport. This expression
  * keeps the `Broadcast` handle (tiny in the serialized plan; the value
  * travels once per executor over torrent) and still compiles into
  * whole-stage codegen via a reference object, so the probe sits fused
  * between the shingle explode and the verify join with no UDF boxing
  * wall.
  *
  * Null semantics: null input → null (the enclosing filter drops it),
  * matching the replaced UDF's `s != null && ...` = false. */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$bc.value())" +
        s".mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
