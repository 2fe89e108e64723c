package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Token-level Aho–Corasick automaton: simultaneous search for MANY token
  * sequences in one left-to-right pass. Built once per executor from the
  * pattern literals.
  */
object TokenAhoCorasick {

  /** goto: per-state token → state; fail: suffix links; out: (len, entity)
    * patterns ending at each state (output links pre-merged at build). */
  final class Automaton(goTo: Array[Map[String, Int]], fail: Array[Int],
                        out: Array[List[(Int, Int)]]) extends Serializable {
    def step(state: Int, tok: String): Int = {
      var s = state
      while (s != 0 && !goTo(s).contains(tok)) s = fail(s)
      goTo(s).getOrElse(tok, 0)
    }
    def outputs(state: Int): List[(Int, Int)] = out(state)
  }

  def build(patterns: Seq[(Seq[String], Int)]): Automaton = {
    val goTo = mutable.ArrayBuffer(mutable.Map.empty[String, Int])
    val out = mutable.ArrayBuffer(mutable.ListBuffer.empty[(Int, Int)])
    patterns.foreach { case (toks, entity) =>
      var s = 0
      toks.foreach { t =>
        s = goTo(s).getOrElseUpdate(t, {
          goTo += mutable.Map.empty; out += mutable.ListBuffer.empty
          goTo.length - 1
        })
      }
      out(s) += ((toks.length, entity))
    }
    val fail = Array.fill(goTo.length)(0)
    val queue = mutable.Queue[Int]()
    goTo(0).values.foreach(queue += _)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      goTo(u).foreach { case (tok, v) =>
        queue += v
        var f = fail(u)
        while (f != 0 && !goTo(f).contains(tok)) f = fail(f)
        val fv = goTo(f).getOrElse(tok, 0)
        fail(v) = if (fv != v) fv else 0
        out(v) ++= out(fail(v))
      }
    }
    new Automaton(goTo.map(_.toMap).toArray, fail, out.map(_.toList).toArray)
  }
}

/** `ac_spans(tokens, surfaces, entities)` — every occurrence of every
  * gazetteer surface in a token array, as `array<struct<pos:int, len:int,
  * entity:int>>` (pos = 0-based start token).
  *
  * This is the custom-Expression tier of SURVEY.md §5's operator ladder:
  * multi-pattern phrase matching is the one V5 operation Spark's built-ins
  * cannot express without materializing EVERY candidate n-gram span
  * ([[graft.text.EntityLinking.ngramSpans]] — row count ≈ maxN × corpus
  * tokens, and unusable for long patterns). The automaton finds all matches
  * in ONE pass per document regardless of pattern count or length, the way
  * spaCy's EntityRuler matcher does on a single machine
  * (/root/reference/dev.ipynb cells 112-116) — but per-row inside a Spark
  * scan, with the pattern set shipped once per executor as a literal (the
  * gazetteer is KB–MB broadcast state by design, like every EntityRuler
  * deployment).
  *
  * `surfaces` (space-joined token patterns) and `entities` must be foldable
  * literals — the automaton is compiled lazily once per executor.
  * Evaluation is `CodegenFallback`: the data-dependent goto/fail walk has no
  * profitable straight-line codegen form; the cost is one virtual call per
  * ROW (not per token), so scans stay batch-friendly.
  *
  * NULL handling: null token array → null; null elements cannot occur
  * (upstream tokenizers never emit null tokens).
  */
case class AhoCorasickSpans(first: Expression, second: Expression,
                            third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "ac_spans"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("entity", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == ArrayType(StringType, false) ||
      first.dataType == ArrayType(StringType, true)
    if (!ok)
      TypeCheckResult.TypeCheckFailure("ac_spans: tokens must be array<string>")
    else if (second.dataType != ArrayType(StringType, false) &&
      second.dataType != ArrayType(StringType, true))
      TypeCheckResult.TypeCheckFailure("ac_spans: surfaces must be array<string>")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "ac_spans: surfaces and entities must be literals")
    else if (third.dataType != ArrayType(IntegerType, false) &&
      third.dataType != ArrayType(IntegerType, true))
      TypeCheckResult.TypeCheckFailure("ac_spans: entities must be array<int>")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: TokenAhoCorasick.Automaton = {
    val s = second.eval(null).asInstanceOf[ArrayData]
    val e = third.eval(null).asInstanceOf[ArrayData]
    val pats = (0 until s.numElements()).map { i =>
      (s.getUTF8String(i).toString.split(' ').toSeq, e.getInt(i))
    }
    TokenAhoCorasick.build(pats)
  }

  override def nullSafeEval(tokens: Any, s: Any, e: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val matches = mutable.ArrayBuffer.empty[InternalRow]
    var state = 0
    var i = 0
    while (i < n) {
      state = automaton.step(state, arr.getUTF8String(i).toString)
      automaton.outputs(state).foreach { case (len, entity) =>
        matches += InternalRow(i - len + 1, len, entity)
      }
      i += 1
    }
    new GenericArrayData(matches.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AhoCorasickSpans =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object AcFunctions {
  val acSpans: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ac_spans"),
      new ExpressionInfo(classOf[AhoCorasickSpans].getName, "ac_spans"),
      (children: Seq[Expression]) =>
        AhoCorasickSpans(children(0), children(1), children(2)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(acSpans._1, acSpans._2, acSpans._3)
}
