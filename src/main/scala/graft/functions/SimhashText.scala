package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash over a text column as a NATIVE codegen'd expression — the
  * fused twin of [[graft.dedup.DedupOps.simhashExpr]] (HOF form), which is
  * CodegenFallback and costs ~ms/row interpreted: the q96 replay computed it
  * once per document in the PREP tables and once per arrival in the
  * streaming dedup, all at source-scan width (single task per micro-batch).
  * This expression computes the identical signature in one per-row loop.
  *
  * Exact semantic parity (law-pinned in DedupSpec beside the existing
  * simhashExpr == relational-simhash law):
  *   - tokens = Spark `split(trim(text), "\\s+")` minus empties —
  *     [[UTF8String.trim]] (0x20 only), the MinhashSignature discipline;
  *   - per token h = first 8 md5 hex chars as a long (the 32-bit prefix);
  *   - bit b accumulates +cnt when bit b of h is set else −cnt, summed over
  *     token OCCURRENCES (integer sums — order-free);
  *   - signature bit b set iff the accumulated count is > 0; no tokens ⇒ 0L
  *     (the HOF fold over an empty array), null text ⇒ null.
  */
case class SimhashText(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash32"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(text: Any): Any =
    SimhashText.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimhashText.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {

  private val mdPool: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): Long = {
    val toks = text.trim().toString.split("\\s+")
    // per-DISTINCT-token occurrence counts: md5 each distinct token once
    // (±cnt summed per occurrence ≡ the HOF per-occurrence fold)
    val counts = new java.util.HashMap[String, Int]()
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty)
        counts.merge(toks(t), 1, (a, b) => a + b)
      t += 1
    }
    val acc = new Array[Long](32)
    val md = mdPool.get()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      val dig = md.digest(e.getKey.getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 bytes, as an unsigned 32-bit value
      var h = 0L
      var b = 0
      while (b < 4) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      val cnt = e.getValue.toLong
      var p = 0
      while (p < 32) {
        acc(p) += (if (((h >> p) & 1L) == 1L) cnt else -cnt)
        p += 1
      }
    }
    var sig = 0L
    var p = 0
    while (p < 32) {
      if (acc(p) > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
