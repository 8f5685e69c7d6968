package graft.functions.expressions

import org.apache.commons.codec.digest.DigestUtils

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native k-permutation MinHash signature: array<string> shingles →
  * array<long> of k values, `min over shingles of (aⱼ·h(s)+bⱼ) mod p`,
  * where h(s) = first 40 bits of md5(s) reduced mod p.
  *
  * Why a custom Catalyst Expression (SURVEY §7.4's "first genuine
  * custom-Catalyst candidate"): the declarative formulation —
  * k × `array_min(transform(...))` over a shared hash array — is built
  * from higher-order functions, which Spark evaluates INTERPRETED (no
  * whole-stage codegen, boxed lambdas, no common-subexpression
  * elimination across the k permutations). This expression is one
  * codegen'd tight loop: one md5 per shingle, k min-updates in a local
  * long[], zero allocation per permutation.
  *
  * Value-identical to the declarative path and the DuckDB oracle
  * spelling (TextOracle.minhashSignature): same hash (md5 hex prefix =
  * first 5 digest bytes big-endian), same permutation constants, same
  * modulus. Returns NULL for an empty shingle array (the declarative
  * array_min(empty) yields all-null elements; both band-key consumers
  * treat the two identically via their isnull-on-first-element check).
  *
  * Scale: per-row, shuffle-free, O(|shingles|·1) hashing + O(|shingles|·k)
  * arithmetic; the natural inner stage of the LSH dedup pipeline at any
  * corpus size.
  */
case class MinHashSig(child: Expression, k: Int, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects array<string>, got ${other.simpleString(5)}")
    }
  }

  // permutation constants — shared with TextFunctions.minhashSignature
  private val as: Array[Long] = Array.tabulate(k)(j => 37L + 101L * j)
  private val bs: Array[Long] = Array.tabulate(k)(j => 91L + 53L * j)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = MinHashSig.hash40(arr.getUTF8String(i).getBytes) % prime
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = graft.functions.expressions.MinHashSig.hash40(
         |        $arr.getUTF8String($i).getBytes()) % ${prime}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSig {
  /** First 40 bits of md5 as an unsigned big-endian long — equal to
    * `conv(substr(md5(s), 1, 10), 16, 10)` (first 10 hex chars).
    */
  def hash40(bytes: Array[Byte]): Long = {
    val d = DigestUtils.md5(bytes)
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }
}
