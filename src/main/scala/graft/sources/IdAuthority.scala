package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.util.sketch.BloomFilter

/** Index-sized id-authority for the append guards of the incremental
  * stores ([[DedupLayout.append]], [[TextLayout.append]]).
  *
  * The guards exist because a re-appended doc_id silently corrupts the
  * per-batch stores (duplicated shingle/band rows, doubled count
  * partials). Their first form answered "is this id already indexed?"
  * with a corpus-wide distinct over the store prefix — correct, but
  * O(corpus rows) on the hot ingest path of EVERY micro-batch (round-8
  * advice). This sidecar moves the answer into a CUMULATIVE BLOOM
  * FILTER, so a clean batch pays two batch-sized jobs and zero prefix
  * scans; the exact store is consulted only for the bloom's false
  * positives (fpp-bounded, usually none).
  *
  * Layout: `<root>/_id_bloom/bloom-<batchId>` — one file per append,
  * each holding the ids of EVERY batch `<= batchId` (underscore dir:
  * invisible to parquet listings, the `_trained_hist` rule). The guard
  * for batch b reads the newest file `< b` — prefix semantics, so a
  * SAME-batch-id replay never consults its own record and recomputes it
  * byte-identically (bloom insertion is bitwise-OR: order- and
  * repeat-insensitive). The file is written temp-then-rename (atomic
  * FILE rename) BEFORE the store partitions, so a crash mid-append
  * leaves the bloom over-approximating — a later false suspect resolves
  * against the exact store, never a false pass.
  *
  * Sizing: capacity doubles amortized. A record that would overflow its
  * inherited capacity rebuilds the cumulative filter from the exact
  * prefix ids at `2×` occupancy — the one corpus-id scan left, paid
  * O(log n) times over the store's lifetime instead of every append.
  * At [[Fpp]]=1% the authority costs ~1.2 bytes/id: index-sized, and
  * the build streams ids through a single task (one allocation, no
  * per-task zero copies). When even that outgrows a task — tens of
  * billions of ids — shard the sidecar by `pmod(hash(id), B)` (the
  * [[DedupLayout.EdgeBuckets]] idiom) or flip [[TrustKey]].
  *
  * [[TrustKey]] (`spark.graft.ids.trust=true`) skips the CHECK for
  * deployments whose upstream already guarantees unique ids (the T3
  * duplicate-tolerant contract: dedup belongs upstream) — recording
  * continues, so the authority stays fresh and the guard can be
  * re-enabled without a rebuild.
  */
object IdAuthority {

  /** Session conf: `true` skips the duplicate-id CHECK (trusted
    * upstream-deduped ingest, T3); the sidecar is still recorded.
    */
  val TrustKey = "spark.graft.ids.trust"

  /** False-positive rate of the cumulative filter: each false positive
    * costs one pushed-predicate probe of the exact store, so 1% keeps
    * the expected per-batch probe count ~ batch/100.
    */
  val Fpp = 0.01

  /** Smallest capacity a rebuild provisions — doubling from here. */
  val MinCapacity: Long = 1L << 16

  /** More bloom hits than this per batch falls back to one exact
    * semi-join check (a batch THIS duplicated is about to be refused
    * anyway, or the filter has saturated and the rebuild below is due).
    */
  val SuspectCap = 10000

  private def dir(root: String) = root.stripSuffix("/") + "/_id_bloom"

  private def encodeId(id: Long): String =
    if (id < 0) s"m${-id}" else id.toString

  private def decodeId(name: String): Option[Long] = {
    val s = name.stripPrefix("bloom-")
    if (s.startsWith("m") && s.drop(1).nonEmpty && s.drop(1).forall(_.isDigit))
      Some(-s.drop(1).toLong)
    else if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong)
    else None
  }

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private case class Sidecar(capacity: Long, count: Long, bloom: BloomFilter)

  /** The newest record strictly below `batchId` — the prefix authority
    * a guard or a merge consults. A malformed record (crash-truncated)
    * reads as absent: the caller falls back to the exact store, which
    * is always right.
    */
  private def latestBefore(spark: SparkSession, root: String,
                           batchId: Long): Option[Sidecar] = {
    val d = new org.apache.hadoop.fs.Path(dir(root))
    val f = fs(spark, root)
    if (!f.exists(d)) return None
    f.listStatus(d).iterator
      .flatMap(s => decodeId(s.getPath.getName).map(_ -> s.getPath))
      .filter(_._1 < batchId)
      .maxByOption(_._1)
      .flatMap { case (_, p) =>
        try {
          val in = new DataInputStream(f.open(p))
          try {
            val cap = in.readLong(); val n = in.readLong()
            Some(Sidecar(cap, n, BloomFilter.readFrom(in)))
          } finally in.close()
        } catch { case _: java.io.IOException => None }
      }
  }

  private def serialize(s: Sidecar): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(s.capacity); out.writeLong(s.count)
    s.bloom.writeTo(out); out.close()
    bos.toByteArray
  }

  private def write(spark: SparkSession, root: String, batchId: Long,
                    s: Sidecar): Unit = {
    val f = fs(spark, root)
    val d = new org.apache.hadoop.fs.Path(dir(root))
    val p = new org.apache.hadoop.fs.Path(d, s"bloom-${encodeId(batchId)}")
    val tmp = new org.apache.hadoop.fs.Path(d,
      s".bloom-${encodeId(batchId)}.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(serialize(s)) finally out.close()
    // FILE renames replace atomically on POSIX, but HDFS-like stores
    // REFUSE a rename onto an existing destination (returning false,
    // not throwing) — delete the old record first. The empty window is
    // safe ([[latestBefore]] finding nothing falls back to the exact
    // store); a swallowed false is NOT (the stale record would stay
    // authoritative), so a failed publish raises.
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) {
      if (f.exists(tmp)) f.delete(tmp, false)
      throw new java.io.IOException(
        s"IdAuthority: failed to publish sidecar record $p")
    }
  }

  /** Build a filter of `capacity` over a column of ids with ONE
    * allocation: the distinct ids stream through a single task. The
    * returned count is exact (distinct), so capacity accounting never
    * drifts.
    */
  private def build(ids: DataFrame, capacity: Long): (Long, BloomFilter) = {
    val one = ids.toDF("id").select(col("id").cast("long")).distinct()
      .coalesce(1)
      .mapPartitions { it =>
        val b = BloomFilter.create(capacity, Fpp)
        var n = 0L
        it.foreach { r => b.putLong(r.getLong(0)); n += 1 }
        val bos = new ByteArrayOutputStream()
        val out = new DataOutputStream(bos)
        out.writeLong(n); b.writeTo(out); out.close()
        Iterator(bos.toByteArray)
      }(Encoders.BINARY)
      .collect()
    if (one.isEmpty) (0L, BloomFilter.create(capacity, Fpp))
    else {
      val in = new DataInputStream(new ByteArrayInputStream(one.head))
      try (in.readLong(), BloomFilter.readFrom(in)) finally in.close()
    }
  }

  /** The arrival ids the cumulative filter flags as possibly-seen —
    * capped at `cap + 1` so the driver collect is bounded.
    */
  private def suspects(spark: SparkSession, ids: DataFrame,
                       bloom: BloomFilter, cap: Int): Seq[Long] = {
    val bc = spark.sparkContext.broadcast(bloom)
    try ids.toDF("id").select(col("id").cast("long")).distinct()
      .mapPartitions { it =>
        val b = bc.value
        it.filter(r => b.mightContainLong(r.getLong(0))).map(_.getLong(0))
      }(Encoders.scalaLong)
      .limit(cap + 1)
      .collect().toSeq
    // destroy, not unpersist: the filter is rebuilt per append, and a
    // long-running streaming driver would otherwise accumulate one
    // index-sized broadcast per micro-batch
    finally bc.destroy()
  }

  private def refuse(who: String, batchId: Long, id: String,
                     what: String): Nothing =
    throw new IllegalStateException(
      s"$who(batch $batchId): arrival doc_id $id already exists in the " +
        s"$what — a re-appended id would corrupt the per-batch stores; " +
        "redeliver with the ORIGINAL batch id, dedup ids upstream (T3), " +
        s"or set $TrustKey=true for an upstream that guarantees it")

  /** One exact probe of the store prefix for the given candidate ids —
    * a pushed `isin` predicate over the pruned id column, row-group
    * skippable, candidate-sized not corpus-sized.
    */
  private def confirmed(priorIds: DataFrame, cand: Seq[Long]): Option[Long] =
    priorIds.toDF("id").filter(col("id").isin(cand: _*))
      .limit(1).collect().headOption.map(_.getLong(0))

  /** The whole guard-and-record protocol for one append:
    *
    *  1. unless [[TrustKey]], CHECK the arrivals against the newest
    *     sidecar `< batchId` (bloom pass over the batch; exact probe
    *     only for bloom hits) — or, when no sidecar exists yet
    *     (pre-upgrade root, pruned history), one exact semi-join
    *     against `priorIds`, after which the record below bootstraps
    *     the sidecar so the next append is bloom-guarded;
    *  2. RECORD `bloom-<batchId>` = prefix ∪ arrivals — a same-capacity
    *     merge when the inherited capacity holds, else the doubling
    *     rebuild from `priorIds` ∪ arrivals.
    *
    * `priorIds` is by-name: a bloom-guarded clean batch never evaluates
    * it. `what` names the store in the refusal ("index prefix",
    * "token-log prefix").
    */
  def guardAndRecord(spark: SparkSession, root: String, batchId: Long,
                     arrivalIds: DataFrame, priorIds: => DataFrame,
                     who: String, what: String): Unit = {
    val trust = spark.conf.getOption(TrustKey).contains("true")
    lazy val prior = priorIds
    val side = latestBefore(spark, root, batchId)
    if (!trust) side match {
      case Some(s) =>
        val hits = suspects(spark, arrivalIds, s.bloom, SuspectCap)
        if (hits.size > SuspectCap) {
          // saturated filter or a mass-duplicated batch: one exact check
          prior.toDF("id")
            .join(arrivalIds.toDF("id").select(col("id").cast("long")),
              Seq("id"), "left_semi")
            .limit(1).collect().headOption
            .foreach(r => refuse(who, batchId, r.getLong(0).toString, what))
        } else if (hits.nonEmpty) {
          confirmed(prior, hits)
            .foreach(id => refuse(who, batchId, id.toString, what))
        }
      case None =>
        prior.toDF("id")
          .join(arrivalIds.toDF("id").select(col("id").cast("long")),
            Seq("id"), "left_semi")
          .limit(1).collect().headOption
          .foreach(r => refuse(who, batchId, r.getLong(0).toString, what))
    }
    record(spark, root, batchId, arrivalIds, prior, side)
  }

  /** Record without checking — [[DedupLayout.materialize]]'s base
    * batch, and every append under [[TrustKey]].
    */
  private def record(spark: SparkSession, root: String, batchId: Long,
                     arrivalIds: DataFrame, priorIds: => DataFrame,
                     side: Option[Sidecar]): Unit = {
    val next = side match {
      case Some(s) =>
        val (n, add) = build(arrivalIds, s.capacity)
        if (s.count + n <= s.capacity) {
          s.bloom.mergeInPlace(add) // same (capacity, fpp) => compatible
          Sidecar(s.capacity, s.count + n, s.bloom)
        } else {
          // amortized doubling: the one remaining corpus-id scan
          val all = priorIds.toDF("id")
            .unionByName(arrivalIds.toDF("id").select(col("id").cast("long")))
          val target = math.max(2 * (s.count + n), MinCapacity)
          val (total, bloom) = build(all, target)
          Sidecar(target, total, bloom)
        }
      case None =>
        val all = priorIds.toDF("id")
          .unionByName(arrivalIds.toDF("id").select(col("id").cast("long")))
        sized(all)
    }
    write(spark, root, batchId, next)
  }

  /** Bootstrap build sized off the exact distinct count: a first pass
    * at [[MinCapacity]] learns n; only when 2n outgrows it does a
    * second, right-sized pass run.
    */
  private def sized(ids: DataFrame): Sidecar = {
    val (n0, b0) = build(ids, MinCapacity)
    val target = math.max(2 * n0, MinCapacity)
    if (target == MinCapacity) Sidecar(target, n0, b0)
    else { val (n, b) = build(ids, target); Sidecar(target, n, b) }
  }

  /** Record the BASE build's ids (batch -1) so the first append is
    * already bloom-guarded. A base build REPLACES the root's previous
    * life (materialize explicitly supports rebuilding over a used
    * root — it wipes the compaction marker for the same reason), so
    * the whole sidecar is wiped first: a surviving `bloom-<b>` record
    * would be selected by [[latestBefore]] as the guard authority for
    * the new appends while lacking the new ids — a re-appended doc_id
    * would pass silently, the exact corruption the guard refuses.
    */
  def recordBase(spark: SparkSession, root: String, ids: DataFrame,
                 baseBatch: Long): Unit = {
    val f = fs(spark, root)
    val d = new org.apache.hadoop.fs.Path(dir(root))
    if (f.exists(d)) f.delete(d, true)
    write(spark, root, baseBatch, sized(ids))
  }

  /** Drop sidecar records below the compaction watermark — the batches
    * [[LogCompaction]] has FINALIZED can never replay, so their records
    * serve nobody; the newest file `≥ w` keeps every live guard and
    * every replayable batch served. Missing history degrades gracefully
    * (the guard falls back to one exact check and re-bootstraps).
    */
  def prune(spark: SparkSession, root: String, watermark: Long): Seq[Long] = {
    val d = new org.apache.hadoop.fs.Path(dir(root))
    val f = fs(spark, root)
    if (!f.exists(d)) return Nil
    val victims = f.listStatus(d).iterator
      .flatMap(s => decodeId(s.getPath.getName).map(_ -> s.getPath))
      .filter(_._1 < watermark).toSeq.sortBy(_._1)
    victims.foreach { case (_, p) => f.delete(p, false) }
    victims.map(_._1)
  }
}
