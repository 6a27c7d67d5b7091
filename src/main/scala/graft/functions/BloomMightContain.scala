package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long key against a pre-built Bloom filter,
  * fully codegen'd.
  *
  * The filter travels with the plan as serialized bytes (it is sketch
  * metadata, like IVF centroids or LSH hyperplanes — kilobytes to a
  * few MB for benchmark-suite-sized probe sets) and is deserialized
  * once per executor instance via a transient lazy, then referenced
  * from generated code. This is the broadcast-pre-filter building
  * block behind `Dedup.contaminationBloom`: at 100 TB the corpus side
  * of a semi-join never needs to shuffle rows that the filter already
  * rules out — only the candidate sliver (true hits + the fpp share of
  * false positives) reaches the exchange.
  *
  * Never returns false negatives (Bloom property), so an exact
  * confirm-join downstream reproduces exact semantics.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column wrapper: true iff `key` (long) might be in `bloom`. */
  def mightContain(key: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    Shims.toColumn(BloomMightContain(
      Shims.toExpression(key.cast("long")), out.toByteArray))
  }
}
