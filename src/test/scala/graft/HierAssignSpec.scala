package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.Random

import graft.operators.SimilarityQueries

/** Bit-parity of the native `graft_hier_assign` (one two-level loop,
  * O(1) codegen in K) against the branch-per-super CASE of
  * `graft_cell_topk` calls it replaced — the CellTopKSpec discipline:
  * the composed spelling is the semantics, the native expression is
  * the physical form, and every oracle hash built on the composed
  * spelling must be unchanged.
  */
class HierAssignSpec extends SparkSpec {

  private val D = 16

  private def top1(cids: Seq[Long], cents: Seq[Seq[Double]], v: Column): Column =
    element_at(call_function("graft_cell_topk", v,
      typedLit(cents), typedLit(cids), lit(1)), 1)

  /** The CASE spelling: top-1 super over the live supers, then a branch
    * per super ranking only its members. */
  private def caseForm(sup: Seq[(Long, Seq[Double])],
                       groups: Map[Long, Seq[(Long, Seq[Double])]],
                       v: Column): Column = {
    val sc = top1(sup.map(_._1), sup.map(_._2), v)
    coalesce(groups.toSeq.sortBy(_._1).map { case (sid, mem) =>
      when(sc === lit(sid), top1(mem.map(_._1), mem.map(_._2), v))
    }: _*)
  }

  private def nativeForm(sup: Seq[(Long, Seq[Double])],
                         groups: Map[Long, Seq[(Long, Seq[Double])]],
                         v: Column): Column =
    call_function("graft_hier_assign", v,
      typedLit(sup.map(_._2)), typedLit(sup.map(_._1)),
      typedLit(sup.map(s => groups(s._1).map(_._2))),
      typedLit(sup.map(s => groups(s._1).map(_._1))))

  test("native two-level assignment ≡ branch-per-super CASE over a trained hierarchy") {
    val s = spark
    import s.implicits._
    val rnd = new Random(37)
    val k = 29
    // a REAL trained hierarchy (trainSuper over random quantized
    // centroids) — live supers + member groups exactly as
    // hierAssignExpr builds them
    val cents = (1L to k.toLong).map(c =>
      (c, Array.fill(D)(math.floor(rnd.nextGaussian() * 1e6).toLong)))
    val (sup, members) = SimilarityQueries.trainSuper(
      cents, SimilarityQueries.hierK2(k))
    val bySuper = cents.groupBy(c => members(c._1))
      .map { case (sid, mem) => sid -> mem.map { case (c, v) => (c, v.toSeq.map(_.toDouble)) }.toSeq }
    val live = sup.filter(s0 => bySuper.contains(s0._1))
      .map { case (sid, v) => (sid, v.toSeq.map(_.toDouble)) }
    val rows = (1L to 400L).map(i =>
      (i, Seq.fill(D)(math.floor(rnd.nextGaussian() * 1e6).toLong)))
    val df = rows.toDF("vec_id", "qv")
    val diff = df.select(
      caseForm(live, bySuper, col("qv")).as("c"),
      nativeForm(live, bySuper, col("qv")).as("n"))
      .filter(not(col("c") <=> col("n")))
    assert(diff.count() === 0,
      "every row's two-level assignment must match the CASE spelling")
  }

  test("a vector nearest a dead super still lands in a live member cell; null elements null the row") {
    val s = spark
    import s.implicits._
    // hand-built hierarchy with only LIVE supers passed (the dead-super
    // exclusion happens at construction, as hierAssignExpr does): two
    // supers along +x and +y, members offset around them
    def axis(i: Int): Seq[Double] = Seq.tabulate(D)(d => if (d == i) 1e6 else 0.0)
    val sup = Seq((1L, axis(0)), (2L, axis(1)))
    val groups = Map(
      1L -> Seq((10L, axis(0)), (11L, axis(0).updated(1, 2e5))),
      2L -> Seq((20L, axis(1)), (21L, axis(1).updated(0, 2e5))))
    // a vector along -x is FAR from both supers but must still assign
    // (coalesce over live branches can never be null for non-null input)
    val v1 = Seq.tabulate(D)(d => if (d == 0) -1e6.toLong else 0L)
    val got = Seq((1L, v1)).toDF("vec_id", "qv")
      .select(nativeForm(sup, groups, col("qv"))).head()
    assert(!got.isNullAt(0), "non-null input must always get a cell")
    // null element → null row (the CellTopK containsNull rule)
    val vNull = Seq.tabulate(D)(d => if (d == 3) None else Some(1e6.toLong))
    val gotN = Seq((2L, vNull)).toDF("vec_id", "qv")
      .select(nativeForm(sup, groups, col("qv").cast("array<bigint>"))).head()
    assert(gotN.isNullAt(0), "null-element input must null the row")
  }
}
