package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: minimum polynomial rolling hash over all
  * `window`-byte windows of a string — the O(n) scale path for the
  * rolling-window document fingerprint
  * ([[graft.ops.TextAnalysis.rollingFingerprint]] is the md5-based,
  * oracle-checkable variant; it recomputes a hash per window, O(n*w)).
  *
  * Classic Rabin–Karp: H(i+1) = (H(i) - b(i)*B^(w-1)) * B + b(i+w),
  * over the UTF-8 bytes, in Long arithmetic masked to 62 bits (power-of
  * -two modulus keeps the slide exact). One pass, no allocation.
  *
  * Codegen: participates in WholeStageCodegen via a static method call
  * (the same shape Spark's own `StaticInvoke` emits), so the hot loop
  * JITs inside the generated stage — no virtual dispatch, no UDF
  * serialization. The reference has nothing comparable; this is the
  * "custom Expression beats UDF" extension point (SURVEY.md §2.10).
  */
case class RollingHashMin(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashMin.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHashMin.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)
}

object RollingHashMin {

  val Base = 1000003L
  val Mask = (1L << 62) - 1 // power-of-two modulus: exact O(1) slide

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) mod 2^62
    var pow = 1L
    var k = 1
    while (k < w) { pow = (pow * Base) & Mask; k += 1 }
    // hash of the first window
    var h = 0L
    var i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) & Mask; i += 1 }
    var min = h
    // slide
    while (i < n) {
      val out = (bytes(i - w) & 0xff) * pow & Mask
      h = ((h - out + (Mask + 1)) * Base + (bytes(i) & 0xff)) & Mask
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-API entry point. */
  def rollingHashMin(c: Column, window: Int = 16): Column =
    org.apache.spark.sql.graftshim.columnOf(
      RollingHashMin(org.apache.spark.sql.graftshim.expressionOf(c), window))
}
