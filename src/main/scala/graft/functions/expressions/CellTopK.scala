package graft.functions.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row top-`nprobe` centroid ids of one vector against a literal
  * codebook: rank all K centroids by `(round(cosine, 6) DESC, cid ASC)`
  * in ONE codegen'd loop and return the winning ids in rank order as
  * `array<bigint>` (shorter than `nprobe` when K < nprobe).
  *
  * Semantics are EXACTLY the declarative chain it replaces — the
  * K-literal `array(struct(round(graft_cosine(v, cᵢ), 6), -cidᵢ))`
  * scored array reduced by an `array_max`/`array_remove` fold
  * (SimilarityQueries.seedScored/topCells): same cosine fold order,
  * same HALF_UP 6-dp round (the Spark `Round` rule for doubles:
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)`, NaN/∞ pass through),
  * same highest-score-then-lowest-cid tie-break — so every oracle hash
  * built on the declarative form is unchanged. Degenerate-input rules
  * (round-15 advice): a dimension-mismatched centroid ranks below every
  * real-scored one and fills tail ranks lowest-cid-first (the fold's
  * null-score-struct order, matched exactly); an input array CONTAINING
  * a null element nulls the whole row — the one documented divergence
  * (the fold would emit all-null scores and rank by cid) — because the
  * primitive getters would otherwise read undefined values.
  *
  * Why custom: the declarative form's expression TREE is O(K·nprobe) —
  * K struct constructors each wrapping a cosine call, re-referenced by
  * every step of the array_remove fold. At the compiled default (K=8)
  * codegen swallows it; under the `spark.graft.sim.ncells` deployment
  * contract (K grows with the corpus: 200 at 10×, 640 at 100×) the
  * generated method exceeds JVM/codegen limits, falls back to
  * interpreted evaluation, and the per-row assignment cost bends the
  * whole sim_ family superlinear (the round-14 bench's 6–11× per-decade
  * ratios at scaled K). Here the codebook is a compile-time reference
  * object (`ctx.addReferenceObj`) — expression size is O(1) in K, the
  * scan stays inside whole-stage codegen at any K, and the loop keeps
  * three accumulators plus an `nprobe`-slot insertion list in
  * registers/locals.
  *
  * The codebook rides the expression as constructor DATA (model-sized,
  * captured from the session-memoized centroid seq), not as child
  * expressions — there is nothing to fold or push down into a literal
  * array K wide.
  */
case class CellTopK(child: Expression,
                    cids: Array[Long],
                    cents: Array[Array[Double]],
                    nprobe: Int)
    extends UnaryExpression {

  require(cids.length == cents.length,
    s"cids (${cids.length}) and cents (${cents.length}) must align")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(LongType, _) => Some(LongType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      "graft_cell_topk expects an array<float|double|bigint> vector, got " +
        child.dataType.simpleString(5))
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // a null ELEMENT would read as 0.0 through getFloat/getDouble —
    // an undefined value, where graft_cosine nulls the score. The row
    // is nulled instead (round-15 advice; divergence from the
    // declarative fold documented in the scaladoc)
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val x = new Array[Double](n)
    i = 0
    elemType.get match {
      case FloatType => while (i < n) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      case DoubleType => while (i < n) { x(i) = arr.getDouble(i); i += 1 }
      case LongType => while (i < n) { x(i) = arr.getLong(i).toDouble; i += 1 }
      case _ => throw new IllegalStateException
    }
    val ids = CellTopK.topK(x, cents, cids, nprobe)
    new GenericArrayData(ids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val get = elemType.get match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case LongType => "getLong"
      case _ => throw new IllegalStateException
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val ids = ctx.freshName("ids")
      val hasNull = ctx.freshName("hasNull")
      val cls = CellTopK.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // null-element guard mirrors nullSafeEval: null the row rather
      // than read an undefined 0.0 through the primitive getter
      s"""
         |final int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $x = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $x[$i] = (double) $a.$get($i);
         |  }
         |  final long[] $ids = $cls.topK($x, $centsRef, $cidsRef, $nprobe);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ids);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellTopK =
    copy(child = newChild)

  override def prettyName: String = "graft_cell_topk"
}

/** Two-level (IMI-style) assignment as ONE native expression —
  * `graft_hier_assign`: top-1 super-centroid by the [[CellTopK]] rank
  * rule (round-6 cosine DESC, ties to lowest id), then top-1 member
  * cell of that super by the same rule, returned as the cell id.
  *
  * Why not compose it: the first `assign=hier` form was a CASE with one
  * `when` branch per super, each wrapping its own [[CellTopK]] — K2
  * branches of generated code. The round-15 K-sweep measured that form
  * LOSING to the flat argmax at K=5000 (0.69×) despite doing ~35×
  * fewer FLOPs: the O(K2) branch dispatch and generated-method size ate
  * the savings. Here both levels run in one codegen'd loop over
  * reference-object arrays — expression size O(1) in K, per-row work
  * K2 + |members(top super)| ≈ 2√K scores, and the measured sweep
  * separates the way the cost model says it should.
  *
  * The caller passes LIVE supers only (supers that ended training with
  * members) — the memberless-super NULL-cell hole is closed at
  * construction; `require` re-checks alignment.
  */
case class HierAssign(child: Expression,
                      supCids: Array[Long], supCents: Array[Array[Double]],
                      memCids: Array[Array[Long]],
                      memCents: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(supCids.length == supCents.length &&
    supCids.length == memCids.length && supCids.length == memCents.length,
    s"super/member group arrays must align: ${supCids.length}/" +
      s"${supCents.length}/${memCids.length}/${memCents.length}")
  require(supCids.nonEmpty, "at least one live super required")
  require(memCids.forall(_.nonEmpty),
    "every super passed must have members (live supers only)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(LongType, _) => Some(LongType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      "graft_hier_assign expects an array<float|double|bigint> vector, got " +
        child.dataType.simpleString(5))
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val x = new Array[Double](n)
    i = 0
    elemType.get match {
      case FloatType => while (i < n) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      case DoubleType => while (i < n) { x(i) = arr.getDouble(i); i += 1 }
      case LongType => while (i < n) { x(i) = arr.getLong(i).toDouble; i += 1 }
      case _ => throw new IllegalStateException
    }
    CellTopK.hierAssign(x, supCids, supCents, memCids, memCents)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supCidsRef = ctx.addReferenceObj("supCids", supCids, "long[]")
    val supCentsRef = ctx.addReferenceObj("supCents", supCents, "double[][]")
    val memCidsRef = ctx.addReferenceObj("memCids", memCids, "long[][]")
    val memCentsRef = ctx.addReferenceObj("memCents", memCents, "double[][][]")
    val get = elemType.get match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case LongType => "getLong"
      case _ => throw new IllegalStateException
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val hasNull = ctx.freshName("hasNull")
      val cls = CellTopK.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $x = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $x[$i] = (double) $a.$get($i);
         |  }
         |  ${ev.value} = $cls.hierAssign($x, $supCidsRef, $supCentsRef, $memCidsRef, $memCentsRef);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HierAssign =
    copy(child = newChild)

  override def prettyName: String = "graft_hier_assign"
}

object CellTopK {

  /** Unpack the codebook literal (`array<array<double>>`) the SQL
    * registration receives into the expression's reference object —
    * once at plan build, never per row.
    */
  def literalCents(l: org.apache.spark.sql.catalyst.expressions.Literal): Array[Array[Double]] =
    l.value.asInstanceOf[ArrayData].toArray[ArrayData](
      ArrayType(DoubleType)).map(_.toDoubleArray())

  /** Unpack the cid literal (`array<bigint>`). */
  def literalCids(l: org.apache.spark.sql.catalyst.expressions.Literal): Array[Long] =
    l.value.asInstanceOf[ArrayData].toLongArray()

  /** Unpack grouped codebooks (`array<array<array<double>>>`) — the
    * per-super member-centroid groups of [[HierAssign]]. */
  def literalCentGroups(
      l: org.apache.spark.sql.catalyst.expressions.Literal): Array[Array[Array[Double]]] =
    l.value.asInstanceOf[ArrayData].toArray[ArrayData](
      ArrayType(ArrayType(DoubleType)))
      .map(_.toArray[ArrayData](ArrayType(DoubleType)).map(_.toDoubleArray()))

  /** Unpack grouped cids (`array<array<bigint>>`). */
  def literalCidGroups(
      l: org.apache.spark.sql.catalyst.expressions.Literal): Array[Array[Long]] =
    l.value.asInstanceOf[ArrayData].toArray[ArrayData](
      ArrayType(LongType)).map(_.toLongArray())

  /** The two-level assignment loop: [[topK]] at nprobe=1 over the
    * supers, then [[topK]] at nprobe=1 over the winning super's member
    * group — the exact rank rule both times, so the result is
    * bit-identical to the branch-per-super CASE of CellTopK calls it
    * replaces (HierAssignSpec pins it) at O(1) generated-code size.
    */
  def hierAssign(x: Array[Double], supCids: Array[Long],
                 supCents: Array[Array[Double]],
                 memCids: Array[Array[Long]],
                 memCents: Array[Array[Array[Double]]]): Long = {
    val top = topK(x, supCents, supCids, 1)
    val sid = top(0)
    var i = 0
    while (supCids(i) != sid) i += 1
    topK(x, memCents(i), memCids(i), 1)(0)
  }

  /** Spark's `Round(x, 6)` rule for doubles — `BigDecimal.valueOf`
    * (i.e. `Double.toString` canonicalization) then HALF_UP setScale;
    * NaN/infinite inputs pass through untouched. Must stay in lockstep
    * with the declarative `functions.round` the oracle hashes were
    * built on.
    */
  private def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** The ranking loop: all K cosines, an insertion list of the best
    * `nprobe` by (score DESC, cid ASC). K is model-sized (≤ thousands)
    * and nprobe single-digit, so the insertion list beats a heap.
    * Public so generated code can call it (reflective object access
    * from codegen'd Java).
    */
  def topK(x: Array[Double], cents: Array[Array[Double]],
           cids: Array[Long], nprobe: Int): Array[Long] = {
    val k = cents.length
    val keep = math.min(nprobe, k)
    val bestSc = new Array[Double](keep)
    val bestId = new Array[Long](keep)
    var filled = 0
    var c = 0
    var nx = 0.0
    var j = 0
    while (j < x.length) { nx += x(j) * x(j); j += 1 }
    val sx = math.sqrt(nx)
    var nMismatch = 0
    while (c < k) {
      val cent = cents(c)
      // dimension mismatch scores NULL in the declarative form; the
      // null-score struct survives that chain's filter (it checks the
      // cid field) and ranks below every REAL score — so mismatched
      // centroids fill TAIL ranks, lowest cid first, when fewer than
      // nprobe valid centroids exist (round-15 advice: they used to be
      // skipped entirely, diverging in exactly that degenerate case)
      if (cent.length != x.length) nMismatch += 1
      if (cent.length == x.length) {
        var dot = 0.0; var nc = 0.0
        var i = 0
        while (i < cent.length) {
          val y = cent(i)
          dot += x(i) * y; nc += y * y
          i += 1
        }
        val sc = round6(dot / (sx * math.sqrt(nc)))
        val cid = cids(c)
        // find insertion slot: better = higher score, or equal score
        // and lower cid. Double.compare IS Spark's double ordering
        // (NaN greatest, NaN == NaN) — a zero vector's all-NaN scores
        // rank exactly as the declarative array_max fold ranks them
        var pos = filled
        while (pos > 0 && {
          val d = java.lang.Double.compare(sc, bestSc(pos - 1))
          d > 0 || (d == 0 && cid < bestId(pos - 1))
        }) pos -= 1
        if (pos < keep) {
          val last = math.min(filled, keep - 1)
          var m = last
          while (m > pos) { bestSc(m) = bestSc(m - 1); bestId(m) = bestId(m - 1); m -= 1 }
          bestSc(pos) = sc; bestId(pos) = cid
          if (filled < keep) filled += 1
        }
      }
      c += 1
    }
    if (filled < keep && nMismatch > 0) {
      // tail-fill with the mismatched cids, ascending (the declarative
      // fold's order among equal-null scores: max of -cid)
      val tail = new Array[Long](nMismatch)
      var t = 0
      c = 0
      while (c < k) {
        if (cents(c).length != x.length) { tail(t) = cids(c); t += 1 }
        c += 1
      }
      java.util.Arrays.sort(tail)
      t = 0
      while (filled < keep && t < nMismatch) {
        bestSc(filled) = java.lang.Double.NaN // unused; slots are id-read
        bestId(filled) = tail(t)
        filled += 1; t += 1
      }
    }
    java.util.Arrays.copyOf(bestId, filled)
  }
}
