package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.Random

/** Bit-parity of the native `graft_cell_topk` against the declarative
  * scored-array chain it replaced (the K-literal
  * `array(struct(round(graft_cosine), -cid))` reduced by the
  * `array_max`/`array_remove` fold) — the ExpressionsSpec discipline:
  * every native expression is held equal to the declarative spelling
  * the oracle hashes were built on, here across both input shapes the
  * engine feeds it (raw float embeddings for the seeded quantizer,
  * integer-quantized longs for the trained one) plus the tie and
  * degenerate-vector edges.
  */
class CellTopKSpec extends SparkSpec {

  private val D = 16
  private val K = 23 // > nprobe, not a power of two, exercises ties poorly-aligned

  private def declarativeTop(cents: Seq[(Long, Seq[Double])], v: Column,
                             nprobe: Int): Column = {
    val scored = array(cents.map { case (cid, cv) =>
      struct(round(call_function("graft_cosine", v, typedLit(cv)), 6).as("sc"),
        lit(-cid).as("ncid"))
    }: _*)
    val bests = (1 to nprobe).foldLeft((List.empty[Column], scored)) {
      case ((acc, arr), _) =>
        (array_max(arr) :: acc, array_remove(arr, array_max(arr)))
    }._1.reverse
    filter(array(bests.map(b => -b.getField("ncid")): _*), c => c.isNotNull)
  }

  private def nativeTop(cents: Seq[(Long, Seq[Double])], v: Column,
                        nprobe: Int): Column =
    call_function("graft_cell_topk", v,
      typedLit(cents.map(_._2)), typedLit(cents.map(_._1)), lit(nprobe))

  test("top-nprobe cells: native ≡ declarative over random floats") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val cents = (1L to K).map(c => (c, Seq.fill(D)(rnd.nextGaussian()))).toSeq
    val rows = (1L to 500L).map(i => (i, Seq.fill(D)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "v")
    val got = df.select(col("vec_id"),
      declarativeTop(cents, col("v"), 3).as("d"),
      nativeTop(cents, col("v"), 3).as("n"))
      .filter(not(col("d") === col("n")))
    assert(got.count() === 0, "every row's probe list must match the declarative fold")
  }

  test("argmax (nprobe=1) over quantized longs ≡ declarative, incl. duplicate-centroid ties") {
    val s = spark
    import s.implicits._
    val rnd = new Random(13)
    val base = Seq.fill(D)(math.floor(rnd.nextGaussian() * 1e6))
    // two IDENTICAL centroids (cids 5 and 9): the tie must go to cid 5
    val cents = (1L to K).map { c =>
      (c, if (c == 9L) base else Seq.fill(D)(math.floor(rnd.nextGaussian() * 1e6)))
    }.toSeq.map { case (c, v) => (c, if (c == 5L) base else v) }
    val rows = (1L to 300L).map(i =>
      (i, Seq.fill(D)(math.floor(rnd.nextGaussian() * 1e6).toLong)))
    val df = rows.toDF("vec_id", "qv")
    val decl = df.select(col("vec_id"),
      element_at(declarativeTop(cents, col("qv").cast("array<double>"), 1), 1).as("cell"))
    val nat = df.select(col("vec_id"),
      element_at(nativeTop(cents, col("qv"), 1), 1).as("cell"))
    assert(decl.except(nat).count() === 0 && nat.except(decl).count() === 0)
    // the tie case concretely: a row AT the duplicated centroid
    val tieRow = Seq((1000L, base.map(_.toLong))).toDF("vec_id", "qv")
    val cell = tieRow.select(element_at(nativeTop(cents, col("qv"), 1), 1)).head().getLong(0)
    assert(cell === 5L, "equal scores must break to the LOWEST cid")
  }

  test("K < nprobe returns exactly K cells, rank-ordered") {
    val s = spark
    import s.implicits._
    val rnd = new Random(17)
    val cents = (1L to 2L).map(c => (c, Seq.fill(D)(rnd.nextGaussian()))).toSeq
    val df = Seq((1L, Seq.fill(D)(rnd.nextGaussian().toFloat))).toDF("vec_id", "v")
    val got = df.select(declarativeTop(cents, col("v"), 5).as("d"),
      nativeTop(cents, col("v"), 5).as("n")).head()
    assert(got.getSeq[Long](0) === got.getSeq[Long](1))
    assert(got.getSeq[Long](1).length === 2)
  }

  test("zero vector (all-NaN scores) ranks as the declarative fold ranks it") {
    val s = spark
    import s.implicits._
    val rnd = new Random(19)
    val cents = (1L to 5L).map(c => (c, Seq.fill(D)(rnd.nextGaussian()))).toSeq
    val df = Seq((1L, Seq.fill(D)(0.0f))).toDF("vec_id", "v")
    val got = df.select(declarativeTop(cents, col("v"), 3).as("d"),
      nativeTop(cents, col("v"), 3).as("n")).head()
    assert(got.getSeq[Long](0) === got.getSeq[Long](1),
      "NaN ordering (greatest, ties by cid) must match Spark's double ordering")
  }

  test("dimension-mismatched centroids fill tail ranks lowest-cid-first, matching the fold") {
    val s = spark
    import s.implicits._
    val rnd = new Random(29)
    // 2 valid centroids + 2 MISMATCHED (wrong dim → null score in the
    // declarative fold, which survives its filter and ranks below every
    // real score); nprobe=5 forces the tail ranks into view (round-15
    // advice: the native loop used to skip mismatched centroids
    // entirely, returning 2 ids where the fold returns 4)
    val cents = Seq(
      (7L, Seq.fill(D)(rnd.nextGaussian())),
      (4L, Seq.fill(D + 1)(rnd.nextGaussian())), // mismatched
      (2L, Seq.fill(D)(rnd.nextGaussian())),
      (9L, Seq.fill(D - 3)(rnd.nextGaussian()))) // mismatched
    val df = Seq((1L, Seq.fill(D)(rnd.nextGaussian().toFloat))).toDF("vec_id", "v")
    val got = df.select(declarativeTop(cents, col("v"), 5).as("d"),
      nativeTop(cents, col("v"), 5).as("n")).head()
    assert(got.getSeq[Long](0) === got.getSeq[Long](1),
      s"tail ranks must match the fold: ${got.getSeq[Long](0)} vs ${got.getSeq[Long](1)}")
    assert(got.getSeq[Long](1).length === 4)
    // the two mismatched cids sit LAST, ascending
    assert(got.getSeq[Long](1).takeRight(2) === Seq(4L, 9L))
  }

  test("an input array containing a null element nulls the row (documented divergence)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(31)
    val cents = (1L to 5L).map(c => (c, Seq.fill(D)(rnd.nextGaussian()))).toSeq
    val df = Seq((1L, Seq.fill(D)(Option(rnd.nextGaussian())).updated(3, None)))
      .toDF("vec_id", "v")
    // the primitive getters would read an undefined 0.0 for the null
    // slot; the expression nulls the whole row instead (scaladoc'd as
    // the one divergence from the declarative fold)
    val got = df.select(nativeTop(cents.map { case (c, v) => (c, v) },
      col("v").cast("array<double>"), 3).as("n")).head()
    assert(got.isNullAt(0), "null-element input must null the row")
  }

  test("plan stays in whole-stage codegen at large K") {
    val s = spark
    val rnd = new Random(23)
    val bigK = 300
    val cents = (1L to bigK.toLong).map(c => (c, Seq.fill(D)(rnd.nextGaussian()))).toSeq
    // a non-local source (range) and a HOF-free vector build, so the
    // projection actually plans a codegen stage — a local Seq collapses
    // to LocalTableScan and `transform` is itself CodegenFallback,
    // either of which would make this assert vacuous
    val v = array((1 to D).map(i => sin(col("id") * i).cast("float")): _*)
    val df = s.range(1, 51).select(col("id").as("vec_id"), v.as("v"))
    val q = df.select(nativeTop(cents, col("v"), 3).as("cells"))
    val plan = q.queryExecution.executedPlan.toString
    // whole-stage codegen prints as the `*(n)` stage prefix on the line
    // owning the expression
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_cell_topk") && l.trim.startsWith("*(")),
      s"native probe ranking must stay codegen'd at K=$bigK:\n$plan")
    assert(q.collect().forall(_.getSeq[Long](0).length === 3))
  }
}
