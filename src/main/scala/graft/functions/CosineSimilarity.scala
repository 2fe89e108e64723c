package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float/double array
  * columns — the hot-path replacement for the three higher-order-function
  * folds in [[graft.vector.VectorOps.cosine]] (SURVEY.md §4 "optional
  * niceties"). One pass over both arrays computes dot, |a|² and |b|²
  * simultaneously, with a `doGenCode` loop that stays inside whole-stage
  * codegen (no lambda-function dispatch per element, no 3× array traversal).
  *
  * Semantics are BIT-IDENTICAL to the HOF path (sequential left-to-right
  * double accumulation, elements widened to double before multiplying), so
  * queries can swap implementations without breaking oracle parity:
  * null input, length mismatch, or null element → null; zero vectors → NaN
  * (0/0), matching the HOF result.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = get(x, i, tx); val yv = get(y, i, ty)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getterL = if (elemType(left).get == FloatType) "getFloat" else "getDouble"
    val getterR = if (elemType(right).get == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.$getterL($i);
         |    final double $y = (double) $b.$getterR($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Function registration: via `spark.sql.extensions=graft.functions.
  * GraftExtensions` at session build, or [[GraftFunctions.register]] on a
  * live session. Either way `cosine_sim(a, b)` becomes available to SQL and
  * to `functions.call_function`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSim)
    ext.injectFunction(GraftFunctions.lshSignatureSalted)
    ext.injectFunction(GraftFunctions.minhashSignature)
    ext.injectFunction(GraftFunctions.simhash32)
    ext.injectFunction(AcFunctions.acSpans)
    ext.injectFunction(CounterMapFunctions.counterMap)
  }
}

object GraftFunctions {
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  val lshSignature: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("lsh_signature"),
      new ExpressionInfo(classOf[LshSignature].getName, "lsh_signature"),
      (children: Seq[Expression]) => LshSignature(children(0), children(1)))

  val lshSignatureSalted: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("lsh_signature_salted"),
      new ExpressionInfo(classOf[LshSignatureSalted].getName,
        "lsh_signature_salted"),
      (children: Seq[Expression]) => LshSignatureSalted(children(0), children(1)))

  val minhashSignature: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName,
        "minhash_signature"),
      (children: Seq[Expression]) =>
        MinhashSignature(children(0), children(1), children(2)))

  val simhash32: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimhashText].getName, "simhash32"),
      (children: Seq[Expression]) => SimhashText(children(0)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(cosineSim._1, cosineSim._2, cosineSim._3)
    spark.sessionState.functionRegistry
      .registerFunction(lshSignature._1, lshSignature._2, lshSignature._3)
    spark.sessionState.functionRegistry.registerFunction(
      lshSignatureSalted._1, lshSignatureSalted._2, lshSignatureSalted._3)
    spark.sessionState.functionRegistry.registerFunction(
      minhashSignature._1, minhashSignature._2, minhashSignature._3)
    spark.sessionState.functionRegistry.registerFunction(
      simhash32._1, simhash32._2, simhash32._3)
  }
}
