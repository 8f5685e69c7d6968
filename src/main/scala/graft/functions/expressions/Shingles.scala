package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingles: array<string> tokens →
  * array<string> of space-joined n-grams, first-occurrence order
  * (identical to `array_distinct(transform(sequence(...), concat_ws))`,
  * which runs interpreted — this is the codegen'd single pass). Inputs
  * shorter than n yield an EMPTY array (the declarative guard's
  * behavior), so downstream minhash nulls out exactly as before.
  *
  * NULL contract (the one deliberate divergence from the declarative
  * form): NULL input → NULL output (standard null-intolerant
  * propagation), where the declarative `when` guard yields an empty
  * array. Downstream semantics are identical either way — a NULL
  * signature takes the same per-doc sentinel band key an empty one
  * does — pinned by ExpressionsSpec.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.simpleString(5)}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WordShingles.build(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |    graft.functions.expressions.WordShingles.build($arr, $n));
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen. */
  def build(toks: ArrayData, n: Int): Array[UTF8String] = {
    val m = toks.numElements()
    if (m < n) return Array.empty
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      seen += UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    seen.toArray
  }
}

/** Native distinct character n-grams of a string, first-occurrence
  * order — mirror of TextFunctions.charShingles.
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_shingles expects string, got ${other.simpleString(5)}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CharShingles.build(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |    graft.functions.expressions.CharShingles.build($s, $n));
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_char_shingles"
}

object CharShingles {
  /** `substring` on UTF8String is CODEPOINT-indexed, like the SQL
    * substr the declarative form uses — byte slicing would diverge on
    * multi-byte text.
    */
  def build(s: UTF8String, n: Int): Array[UTF8String] = {
    val len = s.numChars()
    if (len < n) return Array.empty
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= len - n) {
      seen += s.substringSQL(i + 1, n)
      i += 1
    }
    seen.toArray
  }
}
