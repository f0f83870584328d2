package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, count, element_at, input_file_name, lit, split}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcConsumer

/** #33h streaming changelog consumer — the continuous form of
  * [[CdcConsumer]]: tail a keyed table's `_changelog/` as a FILE STREAM
  * (each upsert's batch directory is one new arrival) and fold every
  * micro-batch of before/after images into a derived grouped aggregate,
  * maintained as VERSIONED parquet snapshots.
  *
  * Why this composes safely:
  *  - the fold is ADDITIVE (insert credits; update debits the old image
  *    and credits the new), so it commutes across micro-batch slicing —
  *    file-arrival order inside the stream never changes the result;
  *  - snapshots are versioned: the folded state materializes fully at a
  *    temp path and commits by ONE atomic rename to
  *    `<derivedPath>.s<N>` — there is never an instant without a
  *    complete readable snapshot (the caller-seeded `derivedPath` is
  *    state −1);
  *  - each committed state records WHO folded it (a consumer id minted
  *    per checkpoint) at WHICH streaming epoch, plus a DATA-scoped fold
  *    position: the changelog HIGH-WATER MARK (largest batch id WHOLLY
  *    folded — every earlier existing batch too) and the FRONTIER (the
  *    exact files already folded from batches above the mark). The mark
  *    alone would be wrong: a micro-batch boundary can split one
  *    changelog batch's files (maxFilesPerTrigger), so "max batch id
  *    seen" over-claims — a crash plus checkpoint loss would then drop
  *    the batch's unfolded remainder. Two replay shapes are exactly-once:
  *     * same checkpoint, crash between state commit and checkpoint
  *       write → the re-delivered epoch is ≤ the committed epoch of the
  *       same consumer → SKIP (no double count);
  *     * checkpoint lost/rebuilt → a NEW consumer id sees the old
  *       state; the full redelivery is filtered to files NOT yet folded
  *       (batch > hwm, minus the frontier), so already-folded work drops
  *       and work the lost checkpoint never folded still lands.
  *  - a crash BEFORE a commit leaves a temp dir the replay overwrites;
  *    superseded states are garbage-collected after each commit,
  *    keeping the immediately-previous one for in-flight readers.
  *
  * The frontier stays tiny by construction: batch directories commit by
  * one atomic rename (their file set is immutable once visible), so a
  * batch leaves the frontier — and the mark advances — as soon as its
  * last file folds; only in-flight split batches ever sit in it.
  *
  * Read the current state with [[readDerived]]. At 100 TB this is the
  * "derived table follows the base table" loop: upserts pay one
  * delta-sized classification each, and the derived aggregate follows
  * within a trigger without ever scanning the base.
  */
object StreamingCdc {

  private val MetaFile = "_graft_cdc_meta"

  /** @param hwm  largest changelog batch id such that ITSELF and every
    *             existing batch below it are wholly folded
    * @param frontier (batchId, fileName) pairs already folded from
    *             batches ABOVE the mark (split batches in flight) */
  private final case class StateMeta(consumerId: String, epoch: Long,
                                     hwm: Long,
                                     frontier: Seq[(Long, String)] = Nil)

  private def versionOf(name: String, base: String): Option[Long] =
    if (name.startsWith(base + ".s")) name.stripPrefix(base + ".s").toLongOption
    else None

  /** (stateVersion, path, meta) of the newest committed state; the
    * caller-seeded `derivedPath` itself is version −1 with no meta.
    * One parent-dir listing. */
  private def currentState(fs: FileSystem,
                           derivedPath: String): (Long, String, Option[StateMeta]) = {
    val p = new Path(derivedPath)
    val base = p.getName
    val versions = fs.listStatus(p.getParent).toSeq
      .filter(_.isDirectory)
      .flatMap(st => versionOf(st.getPath.getName, base)
        .map(_ -> st.getPath.toString))
    if (versions.isEmpty) (-1L, derivedPath, None)
    else {
      val (v, dir) = versions.maxBy(_._1)
      (v, dir, readMeta(fs, new Path(dir, MetaFile)))
    }
  }

  private def readMeta(fs: FileSystem, p: Path): Option[StateMeta] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, UTF_8).split("\n").toSeq match {
          case cid +: e +: h +: rest =>
            val fr = rest.filter(_.nonEmpty).flatMap { ln =>
              ln.split("\t") match {
                case Array(b, n) => b.toLongOption.map(_ -> n)
                case _ => None
              }
            }
            Some(StateMeta(cid, e.toLong, h.toLong, fr))
          case _ => None
        }
      } finally in.close()
    }

  private def writeMeta(fs: FileSystem, p: Path, m: StateMeta): Unit = {
    val out = fs.create(p, true)
    val lines = Seq(m.consumerId, m.epoch.toString, m.hwm.toString) ++
      m.frontier.map { case (b, n) => s"$b\t$n" }
    try out.write(lines.mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  /** One id per CHECKPOINT, minted on first use and persisted inside
    * it — how a committed state knows whether a re-delivered epoch id
    * is its own (skip) or a rebuilt checkpoint's (filter by the fold
    * position). */
  private def consumerIdOf(fs: FileSystem, checkpoint: String): String = {
    val p = new Path(checkpoint, "_graft_consumer_id")
    if (fs.exists(p)) {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, UTF_8).trim
      } finally in.close()
    } else {
      val id = UUID.randomUUID().toString
      fs.mkdirs(new Path(checkpoint))
      val out = fs.create(p, false)
      try out.write(id.getBytes(UTF_8)) finally out.close()
      id
    }
  }

  /** The derived aggregate's current snapshot (seed or newest committed
    * state) — the read side of the consumer. */
  def readDerived(spark: SparkSession, derivedPath: String): DataFrame = {
    val fs = new Path(derivedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(currentState(fs, derivedPath)._2)
  }

  /** Footer row count — the one case where a file can legitimately stay
    * unfolded forever: a zero-row part file never yields a row to the
    * stream, so it can never enter the frontier; completeness must not
    * wait on it. One driver-side footer read, only for frontier-batch
    * files not yet folded (rare, bounded by in-flight split batches). */
  private def footerRows(conf: org.apache.hadoop.conf.Configuration,
                         p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      var rows = 0L
      r.getFooter.getBlocks.forEach(bl => rows += bl.getRowCount)
      rows
    } finally r.close()
  }

  /** Advance the wholly-folded mark: walk existing batch ids above
    * `curHwm` in order; a batch passes when every one of its parquet
    * files is folded (or provably empty); the first incomplete batch
    * blocks. Returns (newHwm, survivingFrontier). */
  private def advanceMark(cfs: FileSystem,
                          conf: org.apache.hadoop.conf.Configuration,
                          clRoot: Path, curHwm: Long,
                          frontier: Seq[(Long, String)]): (Long, Seq[(Long, String)]) = {
    val byBatch: Map[Long, Set[String]] =
      frontier.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
    val existing = cfs.listStatus(clRoot).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName.stripPrefix("batch=").toLongOption
        .map(_ -> st.getPath))
      .filter(_._1 > curHwm).sortBy(_._1)
    var hwm = curHwm
    var blocked = false
    existing.foreach { case (b, bp) =>
      if (!blocked) {
        val folded = byBatch.getOrElse(b, Set.empty)
        val whole = cfs.listStatus(bp).forall { st =>
          !(st.isFile && st.getPath.getName.endsWith(".parquet")) ||
            folded.contains(st.getPath.getName) ||
            footerRows(conf, st.getPath) == 0L
        }
        if (whole) hwm = b else blocked = true
      }
    }
    (hwm, frontier.filter(_._1 > hwm))
  }

  /** Changelog-retention guard: the FILE STREAM simply never lists an
    * expired batch dir, so a fold position below the
    * `expireChangelog` floor would silently skip the reaped batches —
    * fail loudly toward a re-seed instead. A consumer with NO folded
    * state yet (`hwm` None) is exempt: its seed snapshot asserts the
    * horizon (the caller's documented responsibility to seed at or
    * above the floor). */
  private def guardFloor(spark: org.apache.spark.sql.SparkSession,
                         warehouse: String, table: String,
                         hwm: Option[Long]): Unit =
    hwm.foreach { h =>
      val floor = graft.store.KeyedTable.changelogFloor(
        spark, warehouse, table)
      if (floor > h + 1)
        throw new graft.store.StoreException(
          s"changelog batches (${h + 1} .. ${floor - 1}) of $table " +
          "were expired (expireChangelog) under this consumer's fold " +
          "position — the stream would silently skip them; re-seed " +
          "the derived state from a current snapshot and restart with " +
          "a fresh checkpoint")
    }

  /** Start the consumer over `<warehouse>/<table>/_changelog/batch=*`.
    *
    * @param derivedPath seed snapshot holding the aggregate state
    *                    (groupCol, countCol, sumCol) — must exist (seed
    *                    it with the base aggregate at stream-start
    *                    horizon, or an empty frame for "from scratch");
    *                    folded states commit as `<derivedPath>.s<N>`
    *                    siblings, resolved by [[readDerived]]
    * @param maxFilesPerTrigger cap files per micro-batch (ops tuning for
    *                    huge backlogs; also how the split-batch replay
    *                    spec forces a changelog batch across epochs)
    * @param crashAfterEpochs fault injection for specs ONLY: throw after
    *                    this many successful state commits, simulating a
    *                    crash between a commit and the checkpoint write
    * @return a query running with Trigger.AvailableNow (drains the
    *         changelog backlog and stops; rerun with the same
    *         checkpoint to consume later batches incrementally) */
  def start(spark: SparkSession, warehouse: String, table: String,
            derivedPath: String, checkpoint: String,
            groupCol: String, countCol: String, sumCol: String,
            valueCol: String,
            maxFilesPerTrigger: Option[Int] = None,
            crashAfterEpochs: Option[Int] = None): StreamingQuery = {
    val clRoot = s"$warehouse/$table/${graft.store.KeyedTable.ChangelogDir}"
    val clGlob = s"$clRoot/batch=*"
    // eager changelog-retention guard (re-checked per epoch): fail at
    // START even when no new batch would fire an epoch
    locally {
      val fsD = new Path(derivedPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (_, _, meta0) = currentState(fsD, derivedPath)
      guardFloor(spark, warehouse, table, meta0.map(_.hwm))
    }
    // schema from the committed batches, WITH the `batch` partition
    // value — the fold position is tracked per batch id. basePath
    // keeps the partition column visible despite the glob consuming
    // the partition directories.
    val sch = spark.read.option("mergeSchema", "true")
      .option("basePath", clRoot).parquet(clGlob).schema
    val reader = spark.readStream.schema(sch).option("mergeSchema", "true")
      .option("basePath", clRoot)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val commits = new java.util.concurrent.atomic.AtomicInteger(0)
    reader.parquet(clGlob)
      .writeStream
      .queryName(s"graft-cdc-$table")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val fs = new Path(derivedPath).getFileSystem(conf)
        val consumerId = consumerIdOf(fs, checkpoint)
        val (curVer, curDir, curMeta) = currentState(fs, derivedPath)
        val sameConsumer = curMeta.exists(_.consumerId == consumerId)
        if (sameConsumer && curMeta.exists(_.epoch >= epochId)) {
          // this epoch's state already committed — the crash landed
          // between the commit and the checkpoint write; folding again
          // would double-count, so the replay is a no-op
          ()
        } else {
          val curHwm = curMeta.map(_.hwm).getOrElse(-1L)
          val curFrontier = curMeta.map(_.frontier).getOrElse(Nil)
          // changelog-retention guard (also checked eagerly at start)
          guardFloor(s, warehouse, table,
            if (curMeta.isDefined) Some(curHwm) else None)
          // track WHICH file each image row came from: the fold position
          // must be file-grained, because a micro-batch boundary can
          // split one changelog batch's files across epochs
          val rows0 = batch
            .withColumn("_graft_b", col("batch").cast("long"))
            .withColumn("_graft_f",
              element_at(split(input_file_name(), "/"), -1))
          // a REBUILT checkpoint re-delivers everything: drop work the
          // surviving state already folded — whole batches ≤ hwm, plus
          // the frontier's files of split batches above it. Under the
          // original checkpoint nothing is filtered — Spark's own file
          // tracking guarantees no re-delivery there.
          val rows = if (sameConsumer) rows0 else {
            val foldedKeys = curFrontier.map { case (b, n) => s"$b/$n" }
            val fresh = col("_graft_b") > lit(curHwm) && (
              if (foldedKeys.isEmpty) lit(true)
              else !concat(col("_graft_b").cast("string"), lit("/"),
                col("_graft_f")).isInCollection(foldedKeys))
            rows0.filter(fresh)
          }
          // one job: per-file row presence (bounded by files/trigger)
          // doubles as the something-arrived check
          val perFile = rows.groupBy(col("_graft_b"), col("_graft_f"))
            .agg(count(lit(1)).as("n")).collect()
          if (perFile.isEmpty) () // nothing unfolded arrived
          else {
            val pairs = perFile.toSeq.map(r => (r.getLong(0), r.getString(1)))
            val (newHwm, newFrontier) = advanceMark(
              new Path(clRoot).getFileSystem(conf), conf, new Path(clRoot),
              curHwm, (curFrontier ++ pairs).distinct)
            val newVer = curVer + 1
            val tmp = new Path(s"$derivedPath.tmp-$newVer")
            val committed = new Path(s"$derivedPath.s$newVer")
            fs.delete(tmp, true) // partial output of a crashed attempt
            CdcConsumer.applyGroupedAgg(s.read.parquet(curDir),
                rows.drop("_graft_b", "_graft_f"),
                groupCol, countCol, sumCol, valueCol)
              .write.parquet(tmp.toString) // materialized BEFORE commit
            writeMeta(fs, new Path(tmp, MetaFile),
              StateMeta(consumerId, epochId, newHwm, newFrontier))
            if (!fs.rename(tmp, committed))
              throw new graft.store.StoreException(
                s"cdc snapshot commit failed: $tmp -> $committed")
            // GC superseded states, keeping the immediately-previous
            // one for readers that resolved just before this commit
            val base = new Path(derivedPath).getName
            fs.listStatus(new Path(derivedPath).getParent).foreach { st =>
              versionOf(st.getPath.getName, base).foreach { v =>
                if (v < curVer) fs.delete(st.getPath, true)
              }
            }
            crashAfterEpochs.foreach { n =>
              if (commits.incrementAndGet() >= n)
                throw new graft.store.StoreException(
                  s"injected crash after $n state commit(s) (spec fault injection)")
            }
          }
        }
        ()
      }
      .start()
  }
}
