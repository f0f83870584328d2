package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** How to write into an existing table — mirrors the reference's
  * `how` parameter (/root/reference/pandabase/sql.py:61-70). */
sealed trait WriteMode
object WriteMode {
  /** Fail if the table already exists. */
  case object CreateOnly extends WriteMode
  /** Add rows; fail if any incoming PK already exists. */
  case object Append extends WriteMode
  /** Insert-or-fully-replace by PK (NULLs in the incoming row win too). */
  case object Upsert extends WriteMode
}

/** How [[KeyedTable.delete]] physically removes matched rows. */
sealed trait DeleteMode
object DeleteMode {
  /** Decide per call from manifest row counts alone: merge-on-read
    * when the matched set is a small fraction of the touched buckets'
    * live rows (write cost ∝ |matches|), copy-on-write when most of
    * the touched data is dying anyway (the rewrite then SHRINKS the
    * table instead of stacking tombstones over doomed files). */
  case object Auto extends DeleteMode
  /** Rewrite every touched bucket without the matched rows (the
    * pre-r14 behavior): write cost ∝ touched-bucket bytes. */
  case object CopyOnWrite extends DeleteMode
  /** Commit positional delete-vector sidecars in the manifest; reads
    * anti-join them and rewriting commits materialize them. Write
    * cost ∝ |matches| — the Iceberg-v2 position-delete slope a daily
    * CDC purge on a 100 TB table needs. */
  case object MergeOnRead extends DeleteMode
}

/** A primary-keyed parquet table — the Spark-native re-expression of the
  * reference's pandas↔SQL table (/root/reference/pandabase/sql.py).
  *
  * Layout: `<warehouse>/<table>/data/pb_bucket=<i>/...parquet` with
  * `i = pmod(xxhash64(pk...), buckets)`, plus `_graft_meta.json` and
  * versioned snapshot manifests under `_manifests/` (see [[Manifest]]).
  *
  * Scale design (SURVEY.md §4): upsert/append only ever read and rewrite
  * the hash buckets actually touched by the incoming keys, so a small
  * delta against a huge table does proportionally small IO. Commits are
  * write-to-staging + additive file moves + ONE atomic manifest flip:
  * readers resolve the file set through the current manifest, so a read
  * racing any mutation sees a complete snapshot (old or new, never
  * partial) — correct even on object stores with no atomic directory
  * rename. Superseded files and manifests persist until [[vacuum]],
  * which also gives bounded time travel ([[readSql]] `asOfVersion`).
  * PK range reads push down to parquet row-group min/max stats.
  *
  * Writers additionally serialize through [[WriteLock]] (`_graft_lock`,
  * atomic create-if-absent): each commit is atomic but the
  * read-merge-commit SEQUENCE is not, so two concurrent mutators of the
  * same table fail fast instead of interleaving. Readers never take
  * the lock.
  */
object KeyedTable {

  /** Internal hash-bucket partition column. */
  val BucketCol = "pb_bucket"

  /** Transient adjacent-duplicate flag used by create's observe()-fused
    * PK validation (never written: dropped before the parquet sink). */
  private val PkDupCol = "_graft_pkdup"

  /** Changelog subdirectory name (sibling of `data/`, never touched by
    * vacuum, invisible to the bucket reader). Retention is its own
    * explicit call — [[expireChangelog]] — because snapshot expiry and
    * change-stream retention are different lifecycles with different
    * consumers. */
  val ChangelogDir = "_changelog"

  /** Floor marker inside [[ChangelogDir]] recording the first surviving
    * batch after an [[expireChangelog]] (underscore-prefixed, so the
    * merged parquet read skips it). */
  private val ChangelogFloorFile = "_floor.json"

  val DefaultBuckets = 32

  /** Split a `table@branch` reference; a bare name has no branch. `@`
    * can never appear in a stored table name ([[Names.cleanName]]
    * rejects it), so the separator is unambiguous. */
  private[store] def splitRef(table: String): (String, Option[String]) = {
    val i = table.indexOf('@')
    if (i < 0) (table, None)
    else {
      val (t, br) = (table.substring(0, i), table.substring(i + 1))
      if (t.isEmpty || br.isEmpty || br.contains('@'))
        throw new StoreException(
          s"bad branch reference '$table' (expected table@branch)")
      (t, Some(br))
    }
  }

  /** A branch ref `t@br` resolves to the branch's OWN metadata dir
    * (`<t>/_branches/<br>` — meta, manifests, tags, changelog, lock),
    * while [[dataDir]] stays the BASE table's: branches share immutable
    * data files, so fork and fast-forward are metadata-only
    * ([[Branches]]). */
  def tableDir(warehouse: String, table: String): String =
    splitRef(table) match {
      case (t, None) => s"$warehouse/$t"
      case (t, Some(br)) => s"$warehouse/$t/${Branches.DirName}/$br"
    }

  /** Resolve the reference's `schema=` namespace kwarg
    * (/root/reference/pandabase/util.py:5-15, sql.py:46: `schema.table`
    * addressing, per-schema listing): a schema is a SUB-WAREHOUSE — the
    * directory `<warehouse>/<schema>/` — so every store operation
    * (write, read, join, catalog) works inside a namespace by resolving
    * through here first, with zero changes to the bucket layout or
    * commit protocols. None = the default (top-level) namespace. */
  def schemaDir(warehouse: String, schema: Option[String]): String =
    schema match {
      case None => warehouse
      case Some(s) =>
        if (Names.cleanName(s) != s)
          throw new IllegalNameException(
            s"Illegal characters in schema name: $s. try: ${Names.cleanName(s)}")
        s"$warehouse/$s"
    }
  private[store] def dataDir(warehouse: String, table: String) =
    s"$warehouse/${splitRef(table)._1}/data"

  /** Invert [[tableDir]]: (warehouse, table-or-branch ref). A dir under
    * `_branches/` maps back to the `t@branch` addressing form. */
  private[store] def refOf(tableDir: String): (String, String) = {
    val p = new Path(tableDir)
    val parent = p.getParent
    if (parent != null && parent.getName == Branches.DirName &&
        parent.getParent != null) {
      val baseDir = parent.getParent
      (baseDir.getParent.toString, s"${baseDir.getName}@${p.getName}")
    } else (parent.toString, p.getName)
  }

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame, pk: Seq[String], buckets: Int): DataFrame =
    df.withColumn(BucketCol,
      pmod(xxhash64(pk.map(col): _*), lit(buckets.toLong)).cast(IntegerType))

  /** Cluster rows by bucket before a partitionBy write: one writer task
    * (→ one file) per bucket instead of up-to `inputPartitions × buckets`
    * small files — the small-files problem is the first thing that kills
    * a 100 TB table. The shuffle this adds is the write's only wide op.
    *
    * Rows additionally sort by PK within each bucket: hashing destroys
    * range locality (every bucket samples the full PK range, so file
    * min/max stats are useless), but a within-bucket sort makes each
    * ROW GROUP's stats tight — range reads then skip most row groups
    * of every file instead of scanning the table. Map-side, spillable,
    * no extra shuffle; also compresses PK-correlated columns better. */
  private def clusterByBucket(df: DataFrame, buckets: Int, pk: Seq[String]): DataFrame =
    df.repartition(buckets, col(BucketCol))
      .sortWithinPartitions((BucketCol +: pk).map(col): _*)

  /** Write `df` into `<warehouse>/<tableName>` keyed by `pk`.
    *
    * Mirrors reference `to_sql` (/root/reference/pandabase/sql.py:40):
    * identifier cleaning, PK validation (non-null, unique), create /
    * append-with-overlap-check / full-row upsert, `autoIndex` synthetic
    * PK, `addNewColumns` schema evolution (metadata-only here), and
    * coercion of incoming types toward the table schema
    * ("database is the source of truth", sql.py:213-254).
    */
  /** @param strictUtc reference fail-fast contract (default): any naive
    *   (TimestampNTZ) datetime column — PK or value — is rejected, like
    *   the reference's ValueError on naive / non-UTC datetimes
    *   (sql.py:100, 133-136; tests/test_sql.py:273, 807). Spark's
    *   TimestampType is already a UTC instant, so "tz-aware but not
    *   UTC" cannot reach us as a type — NTZ is the one expressible
    *   violation. Pass `strictUtc = false` to opt into the previous
    *   behavior: NTZ is pinned to the same wall-clock UTC instant
    *   (session TZ is UTC). */
  def toSql(df: DataFrame,
            warehouse: String,
            tableName: String,
            pk: Seq[String] = Nil,
            how: WriteMode = WriteMode.CreateOnly,
            autoIndex: Boolean = false,
            addNewColumns: Boolean = false,
            buckets: Int = DefaultBuckets,
            validate: Boolean = true,
            inferBool: Boolean = true,
            strictUtc: Boolean = true,
            schema: Option[String] = None,
            changelog: Boolean = false,
            txn: Option[(String, Long)] = None): Unit = {
    val wh = schemaDir(warehouse, schema)
    val spark = df.sparkSession
    // IDEMPOTENT appends (the Delta txnAppId/txnVersion model): a
    // (appId, version) token rides the manifest's `streams` ledger in
    // the SAME atomic flip as the data, so a retried ingest job whose
    // first attempt committed becomes a NO-OP instead of a PK-overlap
    // failure. Append-shaped writes only — the one retry-able mutation
    // where "did my attempt land?" is otherwise unanswerable. The token
    // shares the streaming-sink ledger namespace: observable through
    // `t$streams`, retired via `drop_stream_ledger`, monotonic per
    // appId (an attempt at or below the recorded version no-ops).
    txn.foreach { case (id, _) =>
      if (id.isEmpty)
        throw new StoreException("txn appId must be non-empty")
      if (how != WriteMode.Append)
        throw new StoreException(
          "txn tokens are an append-retry contract (how=Append); " +
          "upserts are naturally idempotent — retry them without a token")
    }
    val (baseName, branchName) = splitRef(tableName)
    (baseName +: branchName.toSeq).foreach { n =>
      if (Names.cleanName(n) != n)
        throw new IllegalNameException(
          s"Illegal characters in table name: $n. try: ${Names.cleanName(n)}")
    }
    if (autoIndex && pk.nonEmpty)
      throw new StoreException("pass either pk or autoIndex=true, not both")
    if (strictUtc) {
      val naive = df.schema.fields.filter(_.dataType == TimestampNTZType)
      if (naive.nonEmpty)
        throw new StoreException(
          s"Column(s) ${naive.map(_.name).mkString(", ")} timezone must be set " +
          "(naive TimestampNTZ rejected; convert to a UTC instant, or pass " +
          "strictUtc=false to pin the wall-clock to UTC) (reference: sql.py:133)")
    }

    // clean column names (reference silently cleans; helpers.py:228)
    val cleaned = df.columns.foldLeft(df) { (d, c) =>
      val cc = Names.cleanName(c)
      if (cc == c) d else d.withColumnRenamed(c, cc)
    }
    val pkClean = pk.map(Names.cleanName)
    pkClean.foreach { k =>
      if (!cleaned.columns.contains(k))
        throw new StoreException(s"pk column $k not in DataFrame columns ${cleaned.columns.toSeq}")
    }

    val dir = tableDir(wh, tableName)
    // Schema/table kind guard: the warehouse tree tells the two kinds
    // apart structurally (a TABLE dir holds _graft_meta; a SCHEMA dir
    // holds table dirs), and writing the wrong kind into an existing
    // dir silently flips it — a table named like a schema would bury
    // the schema's tables, a schema named like a table would nest
    // inside it. Reject both collisions up front.
    schema.foreach { s =>
      val f0 = fs(spark, wh)
      if (f0.exists(new Path(wh, TableMeta.FileName)))
        throw new StoreException(
          s"cannot address schema '$s': $wh is a TABLE (holds ${TableMeta.FileName}); " +
          "schema and table names must not collide (drop or rename one)")
    }
    // the existence check runs INSIDE the lock: two concurrent creators
    // arbitrate here (one creates, the other sees the table and gets
    // the CreateOnly error instead of a torn rename race)
    WriteLock.withLock(spark, dir, s"toSql($how)") {
      val exists = TableMeta.exists(spark, dir)

      if (!exists) {
        val f0 = fs(spark, dir)
        val dp = new Path(dir)
        if (f0.exists(dp) && f0.listStatus(dp).exists(c => c.isDirectory &&
            f0.exists(new Path(c.getPath, TableMeta.FileName))))
          throw new StoreException(
            s"cannot create table '$tableName': $dir is a SCHEMA namespace " +
            "(contains tables); schema and table names must not collide")
        if (branchName.isDefined)
          throw new StoreException(
            s"branch $tableName does not exist; branches FORK from a " +
            "table snapshot (Branches.create), they are not created " +
            "like tables")
        if (!autoIndex && pkClean.isEmpty)
          throw new StoreException("pk columns required unless autoIndex=true (reference: sql.py:117)")
        create(cleaned, wh, tableName, pkClean, autoIndex, buckets,
          validate, inferBool, txn)
      } else {
        how match {
          case WriteMode.CreateOnly =>
            throw new StoreException(
              s"Table $tableName already exists; how=CreateOnly (reference: sql.py:171)")
          case WriteMode.Append =>
            append(cleaned, wh, tableName, addNewColumns, validate, changelog,
              txn)
          case WriteMode.Upsert =>
            upsert(cleaned, wh, tableName, addNewColumns, validate, changelog)
            ()
        }
      }
    }
  }

  /** PK validation (optional) and the touched-bucket id set in ONE
    * aggregation job over the (persisted) incoming frame: collect_set
    * over the bucket column is bounded by meta.buckets, and fusing it
    * with the PK counters means append/upsert scan their delta once for
    * both answers instead of twice. */
  private def validateAndTouched(df: DataFrame, pk: Seq[String],
                                 wantPk: Boolean): Seq[Int] = {
    val bucketSet = collect_set(col(BucketCol))
    if (!wantPk)
      return df.agg(bucketSet).head().getSeq[Int](0).toSeq
    val keyNullCond = pk.map(col(_).isNull).reduce(_ || _)
    val r = df.agg(
      coalesce(sum(when(keyNullCond, 1L).otherwise(0L)), lit(0L)).as("nulls"),
      count(lit(1)).as("total"),
      count_distinct(struct(pk.map(col): _*)).as("distinct"),
      bucketSet).head()
    val (nulls, total, distinct) = (r.getLong(0), r.getLong(1), r.getLong(2))
    if (nulls > 0)
      throw new StoreException(s"PK has $nulls NULL values and cannot be used (reference: sql.py:119)")
    if (distinct != total)
      throw new StoreException(
        s"PK is not unique: $total rows, $distinct distinct keys (reference: sql.py:97)")
    r.getSeq[Int](3).toSeq
  }

  /** Label the Spark jobs `body` launches (UI/listener observability —
    * a multi-action store verb is unreadable as anonymous job ids).
    * Thread-local, restored after, so concurrent writers keep their own
    * labels. */
  private[store] def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Run two INDEPENDENT pieces of driver code — each typically one
    * Spark action — concurrently (optimization guide §2.6: a verb's
    * sequential actions leave the cluster idle through each job's tail
    * and each scheduling wave; overlapping them hides both). A fresh
    * thread per call so Spark's inheritable thread-locals (job
    * description/group) propagate. Error precedence matches the old
    * sequential order: `a`'s failure wins when both fail. */
  private def inParallel[A, B](a: => A, b: => B): (A, B) = {
    @volatile var ra: Either[Throwable, A] = null
    val t = new Thread(() => {
      ra = try Right(a) catch { case e: Throwable => Left(e) }
    }, "graft-parallel-action")
    t.setDaemon(true)
    t.start()
    val rb = try Right(b) catch { case e: Throwable => Left(e) }
    t.join()
    (ra, rb) match {
      case (Right(x), Right(y)) => (x, y)
      case (Left(ea), Left(eb)) => ea.addSuppressed(eb); throw ea
      case (Left(ea), _) => throw ea
      case (_, Left(eb)) => throw eb
    }
  }

  private def create(df0: DataFrame, warehouse: String, tableName: String,
                     pk: Seq[String], autoIndex: Boolean, buckets: Int,
                     validate: Boolean, inferBool: Boolean = false,
                     txn: Option[(String, Long)] = None): Unit = {
    val spark = df0.sparkSession
    val (df1, pkCols, maxIdx) =
      if (autoIndex) {
        val (d, n) = assignAutoIndex(df0, 0L)
        (d, Seq(Names.AutoIndex), Some(n - 1L))
      } else (df0, pk, None)
    // reference requires datetimes to be UTC (sql.py:100,133-136); the
    // Spark mirror: naive (NTZ) timestamps are pinned to UTC instants on
    // write — the session TZ is UTC, so the wall-clock is unchanged
    val df = df1.schema.fields.foldLeft(df1) { (d, f) =>
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
    // PK columns first
    val order = pkCols ++ df.columns.filterNot(pkCols.contains)
    val ordered = df.select(order.map(col): _*)

    val dir = tableDir(warehouse, tableName)
    val data = new Path(dataDir(warehouse, tableName))
    val f = fs(spark, dir)
    if (f.exists(data))
      throw new StoreException(s"Table data already exists at $data")
    // the dir may be a recycled name (drop via an out-of-band delete):
    // stale parsed manifests at identical v<N> paths must never
    // resolve this NEW table's reads to the old table's files
    Manifest.invalidate(dir)

    // The input may be an arbitrarily expensive pipeline, so it runs
    // exactly ONCE: one bucket-partitioned staging write. PK validation
    // and {0,1}→bool inference (reference helpers.py:35, applied on
    // create) ride the SAME job as observe() metrics — zero extra
    // scheduling waves and zero re-reads of the staged parquet.
    // Uniqueness without count_distinct (observe() rejects DISTINCT
    // aggregates): clusterByBucket already hash-partitions by bucket
    // and sorts by (bucket, pk) — equal PKs are ADJACENT — so a
    // lag()-window duplicate flag over the very same exchange+sort
    // (no new Exchange, no new Sort) gives distinct = total − dups
    // exactly.
    val staging = s"$dir/.staging-create-${UUID.randomUUID()}"
    try {
      val wantPk = validate && !autoIndex
      val boolSchema = StructType(ordered.schema.fields)
      val boolAggs = if (inferBool) BoolInference.aggColumns(boolSchema) else Nil
      val clustered = clusterByBucket(withBucket(ordered, pkCols, buckets), buckets, pkCols)
      val flagged =
        if (!wantPk) clustered
        else {
          val pkStruct = struct(pkCols.map(col): _*)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(BucketCol)).orderBy(pkCols.map(col): _*)
          clustered.withColumn(PkDupCol, pkStruct <=> lag(pkStruct, 1).over(w))
        }
      val pkAggs: Seq[Column] =
        if (!wantPk) Nil
        else {
          val keyNullCond = pkCols.map(col(_).isNull).reduce(_ || _)
          Seq(
            coalesce(sum(when(keyNullCond, 1L).otherwise(0L)), lit(0L)).as("pk!nulls"),
            count(lit(1)).as("pk!total"),
            coalesce(sum(when(col(PkDupCol), 1L).otherwise(0L)), lit(0L)).as("pk!dups"))
        }
      val allAggs = pkAggs ++ boolAggs
      val obs = if (allAggs.isEmpty) None
                else Some(org.apache.spark.sql.Observation())
      val toWrite = {
        val o = obs.map(ob => flagged.observe(ob, allAggs.head, allAggs.tail.toIndexedSeq: _*))
          .getOrElse(flagged)
        if (wantPk) o.drop(PkDupCol) else o
      }
      labeled(spark, s"graft-create $tableName: staging write + validation") {
        toWrite.write.partitionBy(BucketCol).parquet(staging)
      }
      val toBool: Set[String] = obs match {
        case None => Set.empty
        case Some(ob) =>
          val m = ob.get
          if (wantPk) {
            val nulls = m("pk!nulls").asInstanceOf[Long]
            val total = m("pk!total").asInstanceOf[Long]
            val distinct = total - m("pk!dups").asInstanceOf[Long]
            if (nulls > 0)
              throw new StoreException(s"PK has $nulls NULL values and cannot be used (reference: sql.py:119)")
            if (distinct != total)
              throw new StoreException(
                s"PK is not unique: $total rows, $distinct distinct keys (reference: sql.py:97)")
          }
          if (inferBool)
            BoolInference.decodeMap(boolSchema, m).collect {
              case (c, Some(true)) if !pkCols.contains(c) &&
                ordered.schema(c).dataType != BooleanType => c
            }.toSet
          else Set.empty
      }
      val schema = StructType(ordered.schema.fields.map { fl =>
        val dt = if (toBool.contains(fl.name)) BooleanType else fl.dataType
        if (pkCols.contains(fl.name)) fl.copy(dataType = dt, nullable = false)
        else fl.copy(dataType = dt)
      })
      if (toBool.isEmpty) {
        // common case: staging IS the final layout — pure rename commit
        if (!f.rename(new Path(staging), data))
          throw new StoreException(s"Could not commit $staging -> $data")
      } else {
        // bool columns flip type: one columnar rewrite of the staged
        // files (still cheaper than re-running the input pipeline)
        val staged = spark.read.schema(
            StructType(ordered.schema.fields :+
              StructField(BucketCol, IntegerType, nullable = true)))
          .parquet(staging)
        val casted = toBool.foldLeft(staged)((d, c) => d.withColumn(c, col(c) =!= 0))
        casted.repartition(buckets, col(BucketCol))
          .write.partitionBy(BucketCol).parquet(data.toString)
      }
      // version-0 snapshot: every table is manifest-native from birth,
      // row counts and leading-PK stats included (O(buckets) pooled
      // footer opens over files this create just wrote)
      val conf = spark.sparkContext.hadoopConfiguration
      val listed = listLiveFiles(f, data)
      val footer = pkFileStatsAll(conf,
        listed.toSeq.flatMap { case (b, fls) =>
          fls.map(mfF => new Path(data, s"$BucketCol=$b/${mfF.name}"))
        }, Seq(pkCols.head -> schema(pkCols.head).dataType))
      val v0Files = listed.map { case (b, fls) =>
        b -> fls.map { mfF =>
          val fstat = footer(new Path(data, s"$BucketCol=$b/${mfF.name}"))
          mfF.copy(rows = fstat.rows, stats = fstat.cols.get(pkCols.head))
        }
      }
      Manifest.commit(spark, dir,
        // a creating how=Append with a txn token records it on v0, so
        // a retry of a create-if-missing ingest job no-ops too
        Manifest(0L, buckets, v0Files, op = Some("create"),
          streams = txn.toList.toMap))
      TableMeta.write(spark, dir, TableMeta(pkCols, buckets, autoIndex, schema, maxIdx))
    } finally f.delete(new Path(staging), true)
  }

  /** Contiguous integer ids in current row order (deterministic iff the
    * input ordering is — e.g. after orderBy). Mirrors auto_index
    * (reference: sql.py:122-128).
    *
    * CONTIGUOUS ids need a global row numbering, which no single narrow
    * columnar construct provides: monotonically_increasing_id alone
    * leaves gaps between partitions, and a global row_number window
    * coalesces to one task. This is the partition-offset form, fully in
    * Tungsten (no RDD round-trip): job 1 collects one row-count PER
    * PARTITION (bounded: numPartitions rows); job 2 computes
    * `offset + partitionStart + localRowNumber`, where the local row
    * number is the low 33 bits of monotonically_increasing_id (its
    * documented layout: partitionId << 33 | consecutive local count) —
    * so the id pass is narrow, codegen'd, and shuffle-free. Both jobs
    * assume the input recomputes deterministically (same assumption
    * zipWithIndex made). Paid only on autoIndex writes. */
  private[store] def assignAutoIndex(df: DataFrame, offset: Long,
                                     name: String = Names.AutoIndex): (DataFrame, Long) = {
    val counts = df.select(spark_partition_id().as("p")).groupBy("p").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val starts = pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)).init).toMap
    val partitionStart =
      if (starts.isEmpty) lit(0L)
      else element_at(typedlit(starts), spark_partition_id())
    val localRow = monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
    val id = (lit(offset) + partitionStart + localRow).as(name)
    (df.select(id +: df.columns.map(col).toIndexedSeq: _*), counts.values.sum)
  }

  /** Recover the auto-index high-water mark for a pre-`maxAutoIndex`
    * meta file: MAX over the id column answered from parquet FOOTER
    * stats (same isolated V2 + aggregate-pushdown child session
    * Catalog.describe uses — the caller's session confs are never
    * touched, so concurrent queries can't plan inside a mutated-conf
    * window) — O(files), not O(rows). Taken together with the meta
    * field this is the documented recovery rule: effective max = the
    * meta value when present (written before data, so never too low),
    * else the footer max. */
  private def footerMaxAutoIndex(spark: SparkSession, warehouse: String,
                                 table: String, meta: TableMeta): Long = {
    // the keyed source's own footer aggregate pushdown answers this
    // from metadata (LocalScan — no tasks); non-stat types fall back
    // to a real scan with the same value
    val m = KeyedTableSource.read(spark, warehouse, table)
      .agg(max(col(Names.AutoIndex))).head()
    if (m.isNullAt(0)) -1L else m.getLong(0)
  }

  /** Coerce `df` toward the table's logical schema; returns the aligned
    * frame (all table columns, table types, missing → NULL) plus the
    * possibly-evolved schema when `addNewColumns` is set. */
  /** `passthrough`: internal marker columns (e.g. merge's tombstone)
    * carried alongside the aligned data — never schema-evolved, never
    * coerced, excluded from the unknown-column check. */
  private def align(df: DataFrame, meta: TableMeta, addNewColumns: Boolean,
                    passthrough: Set[String] = Set.empty)
      : (DataFrame, StructType) = {
    val tableTypes = meta.schema.fields.map(f => f.name -> f).toMap
    val newCols = df.schema.fields.filterNot(f =>
      tableTypes.contains(f.name) || passthrough.contains(f.name))
    if (newCols.nonEmpty && !addNewColumns)
      throw new StoreException(
        s"New data has columns not in table: ${newCols.map(_.name).mkString(", ")}. " +
        "Set addNewColumns=true to evolve the schema (reference: sql.py:196)")
    // a DROPPED name cannot come back while pre-drop files may be live:
    // the evolved column would read the OLD physical values instead of
    // NULL (see dropColumns) — a full rewrite (rebucket/zorder) clears it
    val resurrected = newCols.map(_.name).filter(meta.dropped.contains)
    if (resurrected.nonEmpty)
      throw new StoreException(
        s"column(s) ${resurrected.mkString(", ")} were dropped and their " +
        "physical data may still be live; rebucket or zorderCompact the " +
        "table first to re-add the name safely")
    val physTaken = meta.renames.collect {
      case (l, p) if newCols.exists(_.name == p) => s"$p (renamed to $l)"
    }
    if (physTaken.nonEmpty)
      throw new StoreException(
        s"column name(s) ${physTaken.mkString(", ")} are the PHYSICAL " +
        "names of renamed columns — live files carry their bytes under " +
        "that name; pick a different name")
    val evolved = StructType(meta.schema.fields ++ newCols.map(_.copy(nullable = true)))

    val dfTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aligned = evolved.fields.map { f =>
      dfTypes.get(f.name) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt) if coercible(dt, f.dataType) => col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) =>
          throw new TypeMismatchException(
            s"Inconsistent type for column ${f.name}: table=${f.dataType} df=$dt (reference: sql.py:250)")
      }
    } ++ passthrough.toSeq.sorted.filter(dfTypes.contains).map(col)
    (df.select(aligned.toIndexedSeq: _*), evolved)
  }

  /** Numeric/boolean coercions the reference allows (sql.py:230-248). */
  private def coercible(from: DataType, to: DataType): Boolean = {
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def fractional(t: DataType) = t == DoubleType || t == FloatType
    (integral(from) && integral(to)) ||
    (integral(from) && fractional(to)) || (fractional(from) && integral(to)) ||
    (fractional(from) && fractional(to)) ||
    (from == BooleanType && (integral(to) || fractional(to))) ||
    (integral(from) && to == BooleanType) ||
    // naive timestamps pin to the table's UTC instants (create does the
    // same normalization; session TZ is UTC so wall-clock is preserved)
    (from == TimestampNTZType && to == TimestampType)
  }

  /** Live-file map from a directory listing — the adoption baseline for
    * a table written before manifests existed (and create's way of
    * enumerating its own fresh output). One listing per bucket dir. */
  private def listLiveFiles(f: FileSystem, data: Path): Map[Int, Seq[ManifestFile]] =
    if (!f.exists(data)) Map.empty
    else f.listStatus(data)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
      .map { d =>
        val b = d.getPath.getName.stripPrefix(s"$BucketCol=").toInt
        b -> f.listStatus(d.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
            // a delete-vector sidecar must never be adopted as DATA
            // (only reachable if a vacuumed-away manifest chain left
            // orphans; tables with DVs always have manifests)
            !st.getPath.getName.contains("-dv-"))
          .sortBy(_.getPath.getName)
          .map(st => ManifestFile(st.getPath.getName, st.getLen))
      }.filter(_._2.nonEmpty).toMap

  /** The snapshot a WRITER mutates against (caller holds the write
    * lock): the current manifest, or — for a legacy table with none —
    * the directory listing adopted as a version "-1" baseline so the
    * first manifest this mutation commits is version 0. */
  private def snapshotForWrite(spark: SparkSession, dir: String,
                               data: String, meta: TableMeta): Manifest =
    Manifest.current(spark, dir).getOrElse(
      Manifest(-1L, meta.buckets, listLiveFiles(fs(spark, dir), new Path(data))))

  /** Driver-side pool for commit-time footer reads: a create/commit
    * touching B buckets would otherwise pay B SERIAL footer opens
    * (~10-30 ms each — at thousands of buckets, minutes of driver
    * latency per commit for what is embarrassingly parallel IO). */
  private lazy val statsPool = java.util.concurrent.Executors.newFixedThreadPool(
    8, (r: Runnable) => {
      val t = new Thread(r, "graft-footer-stats"); t.setDaemon(true); t
    })

  /** One parquet footer's recorded numbers: row count, per-column
    * min/max bounds, per-column NULL counts — everything one block walk
    * yields, carried together so every commit path records the full
    * [[ManifestFile]] statistics from the same single footer open. */
  private[store] final case class FileFooter(
      rows: Option[Long],
      cols: Map[String, ColStats],
      nulls: Map[String, Long])

  /** [[pkFileStats]] over many files on [[statsPool]]. */
  private def pkFileStatsAll(conf: org.apache.hadoop.conf.Configuration,
                             files: Seq[Path], cols: Seq[(String, DataType)])
      : Map[Path, FileFooter] = {
    import scala.jdk.CollectionConverters._
    val tasks = files.map { p =>
      new java.util.concurrent.Callable[(Path, FileFooter)] {
        override def call() = p -> pkFileStats(conf, p, cols)
      }
    }
    statsPool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
  }

  /** The columns a commit records per-file stats for: leading PK plus
    * the configured [[TableMeta.statsCols]], schema-present only.
    * Emitted under PHYSICAL names — that is what staged parquet footers
    * carry and what manifest stat entries are keyed by (scan pruning
    * translates its pushed logical columns the same way). ORDER
    * CONTRACT: the leading element is the PK when present —
    * [[pkFileStats]] records NULL counts for every element AFTER it
    * (the PK is non-null by construction; a count of zero per file
    * forever would be manifest bytes buying nothing). */
  private def statColsTypedOf(meta: TableMeta): Seq[(String, DataType)] =
    (meta.pk.headOption.toSeq ++ meta.statsCols).distinct
      .filter(meta.schema.fieldNames.contains)
      .map(c => meta.physName(c) -> meta.schema(c).dataType)

  /** Footer stats of every staged parquet file under `staging`,
    * collected OUTSIDE the lock — the rename into the live bucket dirs
    * preserves content, so [[commitStaged]] applies these verbatim via
    * its `preStats` hook instead of re-opening O(staged files) footers
    * inside the flip. Keyed by (bucket, staged file name). The
    * optimistic maintenance paths (compact / zorder / rebucket) stage
    * the WHOLE table at worst, which is exactly where in-lock footer
    * IO would re-create the writer outage this round removed; the
    * row verbs' flips shrink by their delta's footer IO too. Stats
    * columns are pinned at STAGE time: a stat column registered
    * mid-window simply has no bounds on this commit's files (the
    * standard files-before-the-column-joined contract — they are
    * never pruned on it). */
  private def stageFileStats(spark: SparkSession, f: FileSystem,
                             staging: String,
                             cols: Seq[(String, DataType)])
      : Map[(Int, String), FileFooter] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(staging)
    if (!f.exists(root)) Map.empty
    else {
      val byPath: Seq[((Int, String), Path)] = f.listStatus(root).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(s"$BucketCol="))
        .flatMap { d =>
          val b = d.getPath.getName.stripPrefix(s"$BucketCol=").toInt
          f.listStatus(d.getPath).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(st => ((b, st.getPath.getName), st.getPath))
        }
      val stats = pkFileStatsAll(conf, byPath.map(_._2), cols)
      byPath.map { case (k, p) => k -> stats(p) }.toMap
    }
  }

  /** A column type whose min/max the manifest can store and compare
    * (Long / Double / String — the [[ColStats]] value domain). */
  private[store] def statStorable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType => true
    case StringType => true
    case _ => false
  }

  /** Row count + per-column min/max + per-column NULL counts of one
    * just-written parquet file, from ONE footer read — the leading PK
    * plus every configured [[TableMeta.statsCols]] column, all from the
    * same block walk. Stats are normalized to the manifest's storable
    * types (Long / Double / String); a column with a non-stat-friendly
    * type or any missing block statistic is simply absent from the
    * result — pruning then keeps the file. Strings are safe here
    * (unlike the footer AGGREGATE pushdown) because a truncated parquet
    * string bound is still a valid BOUND — file skipping needs
    * containment, not exact extrema. NULL counts are summed across
    * blocks for the non-leading columns ([[statColsTypedOf]]'s order
    * contract) and recorded only when every block sets them — an ALL-
    * NULL file thus still gets its count (it has no min/max at all),
    * which is precisely what lets a pushed `IS NOT NULL` skip it. */
  private def pkFileStats(conf: org.apache.hadoop.conf.Configuration,
                          file: Path, cols: Seq[(String, DataType)])
      : FileFooter = {
    val tracked = cols.collect { case (c, t) if statStorable(t) => c }
    val nullTracked = cols.drop(1).collect {
      case (c, t) if statStorable(t) => c
    }
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        def norm(v: Any): Any = v match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long => l.longValue()
          case f: java.lang.Float => f.doubleValue()
          case d: java.lang.Double => d.doubleValue()
          case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
          case o => throw new IllegalStateException(s"unexpected stat $o")
        }
        def le(a: Any, b: Any): Boolean = (a, b) match {
          case (x: Long, y: Long) => x <= y
          case (x: Double, y: Double) => x <= y
          // unsigned UTF-8 byte order, matching parquet stat semantics
          case (x: String, y: String) => Manifest.utf8Le(x, y)
          case _ => throw new IllegalStateException("mixed stat types")
        }
        val mn = scala.collection.mutable.Map.empty[String, Any]
        val mx = scala.collection.mutable.Map.empty[String, Any]
        val ok = scala.collection.mutable.Map.from(tracked.map(_ -> true))
        val nulls = scala.collection.mutable.Map.from(nullTracked.map(_ -> 0L))
        val nullsOk = scala.collection.mutable.Map.from(nullTracked.map(_ -> true))
        var rows = 0L
        reader.getFooter.getBlocks.forEach { bl =>
          rows += bl.getRowCount
          if (ok.valuesIterator.exists(identity) ||
              nullsOk.valuesIterator.exists(identity)) {
            val chunks = scala.collection.mutable.Map
              .empty[String, org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
            bl.getColumns.forEach { c =>
              val n = c.getPath.toDotString
              if (ok.getOrElse(n, false) || nullsOk.getOrElse(n, false))
                chunks(n) = c
            }
            tracked.foreach { c =>
              if (ok(c)) {
                val s = chunks.get(c).map(_.getStatistics).orNull
                if (s == null || !s.hasNonNullValue) ok(c) = false
                else {
                  val bmn = norm(s.genericGetMin)
                  val bmx = norm(s.genericGetMax)
                  if (!mn.contains(c) || le(bmn, mn(c))) mn(c) = bmn
                  if (!mx.contains(c) || le(mx(c), bmx)) mx(c) = bmx
                }
              }
            }
            // null counts are INDEPENDENT of min/max validity: an
            // all-null chunk has no bounds but a definite count
            nullTracked.foreach { c =>
              if (nullsOk(c)) {
                val s = chunks.get(c).map(_.getStatistics).orNull
                if (s == null || !s.isNumNullsSet) nullsOk(c) = false
                else nulls(c) += s.getNumNulls
              }
            }
          }
        }
        FileFooter(Some(rows),
          tracked.collect {
            case c if ok(c) && mn.contains(c) => c -> ColStats(mn(c), mx(c))
          }.toMap,
          nullTracked.collect {
            case c if nullsOk(c) => c -> nulls(c)
          }.toMap)
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        FileFooter(None, Map.empty, Map.empty)
    }
  }

  /** Materialize a changelog batch to `.staging-changelog-*` (the
    * classification must run while the pre-image is still the live
    * snapshot) and return (staging, committed-batch-dir). The caller
    * renames staging into place via [[commitChangelogBatch]] only AFTER
    * its data commit — a mutation that fails mid-commit leaves no batch
    * claiming changes that never landed — and deletes staging in a
    * `finally` (a no-op once renamed). Batch numbers are monotonic
    * under the write lock. */
  private def stageChangelogBatch(spark: SparkSession, dir: String,
                                  changes: DataFrame): (Path, Path) = {
    val clStaging = new Path(dir, s".staging-changelog-${UUID.randomUUID()}")
    changes.write.parquet(clStaging.toString)
    (clStaging, nextChangelogDst(fs(spark, dir), dir))
  }

  /** Next `_changelog/batch=<n>` target. Batch numbers are monotonic
    * UNDER THE WRITE LOCK — the optimistic paths (appendConcurrent,
    * stream epochs) stage their images unlocked but must compute the
    * destination inside the lock, or two committers would claim the
    * same number. */
  private def nextChangelogDst(f: FileSystem, dir: String): Path = {
    val clRoot = new Path(dir, ChangelogDir)
    val next =
      if (!f.exists(clRoot)) 0L
      else f.listStatus(clRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .map(_.getPath.getName.stripPrefix("batch=").toLong)
        .foldLeft(-1L)(math.max) + 1L
    new Path(clRoot, s"batch=$next")
  }

  private def commitChangelogBatch(f: FileSystem, op: String,
                                   src: Path, dst: Path): Unit = {
    f.mkdirs(dst.getParent)
    if (!f.rename(src, dst))
      throw new StoreException(
        s"$op: data committed but changelog rename $src -> $dst failed")
  }

  /** Commit a mutation's staged output as manifest version N+1 (see
    * [[Manifest]] for the isolation argument). Staged files are renamed
    * INTO their live bucket dirs under commit-unique names — additive
    * and invisible, since no manifest references them — then the new
    * manifest (untouched buckets carried over; touched buckets replaced
    * by, or with `add` extended by, their staged files) is published in
    * one atomic file rename, which IS the commit. Every rename is
    * checked; any failure deletes the unreferenced moved-in files and
    * aborts with the current snapshot — and every live file — untouched.
    * Superseded files are left for [[vacuum]], so concurrent readers of
    * the previous snapshot are never disturbed.
    *
    * `removeMissing`: when true (predicate delete, rebucket), a touched
    * bucket with no staged output is REMOVED from the new snapshot;
    * when false, it is carried over unchanged.
    *
    * `preStats`: footer stats PRE-COLLECTED from the staging files
    * OUTSIDE the lock, keyed by (bucket, staged file name) — see
    * [[stageFileStats]]. Rename never changes content, so they apply
    * verbatim to the moved files. The optimistic MAINTENANCE paths
    * must pass this: a zorder/rebucket stages the WHOLE table, and
    * paying O(table) footer opens inside the flip would turn the
    * "brief" lock hold back into a writer outage. Any file the map
    * misses (raced staging edits — never happens from this code) is
    * read at commit as before.
    *
    * GUARD RAIL for new mutation verbs: commitStaged runs INSIDE the
    * locked flip — keep it metadata arithmetic plus renames. Collect
    * footer stats before the lock via [[stageFileStats]]/`preStats`
    * hooks; never re-open parquet footers in here. */
  private def commitStaged(spark: SparkSession, f: FileSystem, dir: String,
                           data: String, staging: String, touched: Seq[Int],
                           op: String, base: Manifest, newBuckets: Int,
                           meta: TableMeta,
                           add: Boolean = false,
                           removeMissing: Boolean = false,
                           streamEpoch: Option[(String, Long)] = None,
                           preStats: Option[Map[(Int, String),
                             FileFooter]] = None)
      : Manifest = {
    val conf = spark.sparkContext.hadoopConfiguration
    val statCol = meta.pk.headOption
    // leading PK first, then the configured extra stat columns — ONE
    // footer block walk collects them all
    val statColsTyped: Seq[(String, DataType)] = statColsTypedOf(meta)
    val commitId = UUID.randomUUID().toString.take(8)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    def abort(msg: String): Nothing = {
      moved.foreach(p => f.delete(p, false))
      throw new StoreException(msg)
    }
    val movedByBucket: Map[Int, Seq[(Path, Long)]] = touched.flatMap { b =>
      val sdir = new Path(staging, s"$BucketCol=$b")
      if (!f.exists(sdir)) None
      else {
        val files = f.listStatus(sdir)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
        val tdir = new Path(data, s"$BucketCol=$b")
        if (!f.mkdirs(tdir))
          abort(s"$op: could not create bucket dir $tdir; " +
            "commit aborted, current snapshot unchanged")
        Some(b -> files.toSeq.map { st =>
          val dst = new Path(tdir, s"$commitId-${st.getPath.getName}")
          if (!f.rename(st.getPath, dst))
            abort(s"$op: could not move staged file ${st.getPath} -> $dst; " +
              "commit aborted, current snapshot unchanged")
          moved += dst
          (dst, st.getLen)
        })
      }
    }.toMap
    // ONE footer open per new file per commit — pooled, not serial —
    // buys both the row count (COUNT(*)/row estimates become driver
    // arithmetic) and the file-skipping stats range reads plan against.
    // `preStats` entries (collected unlocked from the staging paths —
    // renames preserve content) skip the in-lock read entirely.
    def stagedNameOf(dst: Path): String =
      dst.getName.stripPrefix(s"$commitId-")
    val pre: Map[Path, FileFooter] =
      preStats.fold(Map.empty[Path, FileFooter]) {
        ps =>
          movedByBucket.iterator.flatMap { case (b, fls) =>
            fls.flatMap { case (dst, _) =>
              ps.get((b, stagedNameOf(dst))).map(dst -> _)
            }
          }.toMap
      }
    val footer = pre ++ pkFileStatsAll(conf,
      movedByBucket.valuesIterator.flatten.map(_._1)
        .filterNot(pre.contains).toSeq, statColsTyped)
    val staged: Map[Int, Seq[ManifestFile]] = movedByBucket.map {
      case (b, fls) => b -> fls.map { case (dst, len) =>
        val fstat = footer(dst)
        ManifestFile(dst.getName, len, fstat.rows,
          statCol.flatMap(fstat.cols.get),
          statCol.fold(fstat.cols)(fstat.cols - _),
          fstat.nulls)
      }
    }
    val newFiles: Map[Int, Seq[ManifestFile]] =
      (base.files -- touched) ++ touched.flatMap { b =>
        staged.get(b) match {
          case Some(fls) =>
            Some(b -> (if (add) base.files.getOrElse(b, Nil) ++ fls else fls))
          case None =>
            if (removeMissing) None else base.files.get(b).map(b -> _)
        }
      }.toMap
    // Delete vectors ride along per bucket — EXCEPT where this commit
    // REPLACED the bucket's files (non-additive staging: upsert /
    // update / CoW delete / compact / zorder / rebucket). Those
    // rewrites read through the DV mask, so their output already
    // excludes the tombstoned rows — dropping the DVs here IS the
    // materialization step. Additive commits (append) keep them: the
    // old files, and the tombstones against them, are still live.
    val newDvs: Map[Int, Seq[ManifestFile]] =
      base.dvs.filter { case (b, _) =>
        val replaced = staged.contains(b) && !add
        !replaced && newFiles.contains(b)
      }
    val mf = Manifest(base.version + 1, newBuckets, newFiles,
      op = Some(op), dvs = newDvs,
      // the streaming sink's epoch ledger rides in the SAME atomic
      // flip as its data — exactly-once by construction
      streams = base.streams ++ streamEpoch)
    try Manifest.commit(spark, dir, mf)
    catch { case e: Throwable => moved.foreach(p => f.delete(p, false)); throw e }
  }

  /** Commit a MoR delete's staged DELETE-VECTOR files as manifest
    * version N+1: the dual of [[commitStaged]] for tombstone sidecars.
    * Staged DV parquet (rows `(file, pos)`, partitioned by bucket) is
    * renamed INTO the live bucket dirs under commit-unique `-dv-`
    * names — additive and invisible until the manifest flip, exactly
    * the data-file protocol — and the new snapshot carries the SAME
    * data files with the bucket's DV list extended. One footer open
    * per DV file records its position count, keeping live-row
    * arithmetic (COUNT(*), statistics, history) pure driver math.
    * Any rename failure deletes the moved-in files and aborts with the
    * current snapshot untouched (CommitFaultSpec contract). */
  private def commitStagedDvs(spark: SparkSession, f: FileSystem, dir: String,
                              data: String, staging: String,
                              touched: Seq[Int], base: Manifest,
                              op: String = "delete"): Manifest = {
    val conf = spark.sparkContext.hadoopConfiguration
    val commitId = UUID.randomUUID().toString.take(8)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    def abort(msg: String): Nothing = {
      moved.foreach(p => f.delete(p, false))
      throw new StoreException(msg)
    }
    val movedByBucket: Map[Int, Seq[(Path, Long)]] = touched.flatMap { b =>
      val sdir = new Path(staging, s"$BucketCol=$b")
      if (!f.exists(sdir)) None
      else {
        val files = f.listStatus(sdir)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
        val tdir = new Path(data, s"$BucketCol=$b")
        if (!f.exists(tdir))
          abort(s"$op(mor): bucket dir $tdir vanished mid-commit; " +
            "commit aborted, current snapshot unchanged")
        Some(b -> files.toSeq.map { st =>
          val dst = new Path(tdir, s"$commitId-dv-${st.getPath.getName}")
          if (!f.rename(st.getPath, dst))
            abort(s"$op(mor): could not move staged DV ${st.getPath} -> " +
              s"$dst; commit aborted, current snapshot unchanged")
          moved += dst
          (dst, st.getLen)
        })
      }
    }.toMap
    val footer = pkFileStatsAll(conf,
      movedByBucket.valuesIterator.flatten.map(_._1).toSeq, Nil)
    val newDvs: Map[Int, Seq[ManifestFile]] =
      base.dvs ++ movedByBucket.map { case (b, fls) =>
        b -> (base.dvs.getOrElse(b, Nil) ++ fls.map { case (dst, len) =>
          ManifestFile(dst.getName, len, footer(dst).rows)
        })
      }
    val mf = Manifest(base.version + 1, base.buckets, base.files,
      op = Some(op), dvs = newDvs, streams = base.streams)
    try Manifest.commit(spark, dir, mf)
    catch { case e: Throwable => moved.foreach(p => f.delete(p, false)); throw e }
  }

  /** Commit ONE streaming-sink epoch (see [[KeyedStreamingWrite]]) —
    * OPTIMISTICALLY, the [[appendConcurrent]] protocol: every
    * delta-bounded validation job (intra-epoch PK dups, overlap vs
    * stored keys, CHECK constraints, the upsert decomposition's
    * pre-image join) runs against the epoch-START snapshot OUTSIDE the
    * write lock, so a table fed by a sink and concurrent batch writers
    * never serializes behind an epoch's validation; the LOCKED section
    * re-validates only what its window ADDED (usually nothing ⇒ zero
    * IO) and holds for the manifest flip. An epoch at or below the
    * query's recorded high-water mark is a NO-OP (exactly-once over
    * replay — the ledger lives in the manifest, same atomic flip as
    * the data, and is MONOTONIC, so the unlocked fast-exit is sound);
    * zombie-task leftovers are dropped (only files named by successful
    * commit messages move in); the staged files commit with
    * `streams(queryId) = epochId`. */
  /** `upsertMode` (sink option `sink_mode=upsert`): instead of the
    * append contract, the epoch UPSERTS by PK — matched stored rows'
    * positions tombstone via delete vectors and the staged files land
    * as their post-images (the merge-on-read decomposition, so every
    * epoch writes ∝ |epoch| bytes however large the table). The shape
    * `outputMode(Update)` windowed aggregates and CDC folds need from
    * a native sink; replays stay no-ops through the same ledger. The
    * tombstoned positions must reference the COMMIT-TIME snapshot, so
    * if the lock window changed a touched bucket's live set the
    * decomposition re-derives inside the lock (still delta-bounded,
    * and only in that rare race). */
  private[store] def commitStreamEpoch(spark: SparkSession, tblDir: String,
                                       data: String, queryId: String,
                                       epochId: Long, staging: String,
                                       writerBuckets: Int,
                                       allowedFiles: Set[String],
                                       upsertMode: Boolean = false,
                                       commitWaitMs: Long = 60000L): Unit = {
    val f = fs(spark, tblDir)
    val stagingPath = new Path(staging)
    val cleanups = scala.collection.mutable.ArrayBuffer.empty[Path]
    def rebucketError(buckets: Int): Nothing =
      throw new ConcurrentWriteException(
        s"stream sink epoch $epochId of $tblDir: table rebucketed " +
        s"$writerBuckets -> $buckets mid-stream; epoch " +
        "aborted (table unchanged) — restart the streaming query " +
        "so its writers pick up the new layout")
    try {
      // ------- UNLOCKED: sweep, validate, derive (vs snapshot-at-start)
      val meta0 = TableMeta.read(spark, tblDir)
      val base0 = snapshotForWrite(spark, tblDir, data, meta0)
      if (base0.streams.get(queryId).exists(_ >= epochId)) return
      if (base0.buckets != writerBuckets) rebucketError(base0.buckets)
      // sweep staging: keep only successful tasks' files; collect the
      // touched buckets from what actually staged (the staging dir is
      // private to this query, so no lock is needed)
      val touched: Seq[Int] =
        if (!f.exists(stagingPath)) Nil
        else f.listStatus(stagingPath).filter(_.isDirectory).toSeq.flatMap { d =>
          val bName = d.getPath.getName
          var live = 0
          f.listStatus(d.getPath).foreach { st =>
            val rel = s"$bName/${st.getPath.getName}"
            if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
                allowedFiles.contains(rel)) live += 1
            else f.delete(st.getPath, false)
          }
          bName.stripPrefix(s"$BucketCol=").toIntOption.filter(_ => live > 0)
        }
      // empty epoch: nothing to commit — a replay re-stages the same
      // rows and exits at the ledger check again harmlessly
      if (touched.isEmpty) return
      val (wh, ref) = refOf(tblDir)
      // executors staged under PHYSICAL names (KeyedStreamingWrite's
      // fileSchema); alias back to the logical schema for the driver-
      // side joins and checks
      val withBucketField = StructType(meta0.physSchema.fields :+
        StructField(BucketCol, IntegerType, nullable = true))
      val staged = toLogical(spark.read.option("basePath", staging)
        .schema(withBucketField).parquet(staging), meta0)
      val dups = staged.groupBy(meta0.pk.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .limit(5).select(meta0.pk.map(col): _*).collect()
      if (dups.nonEmpty)
        throw new StoreException(
          s"stream sink epoch $epochId: duplicate PKs within the " +
          s"batch, e.g. ${dups.mkString(", ")} — deduplicate the " +
          "stream (dropDuplicates on the PK) before the sink")
      enforceChecks(staged, meta0.checks, "stream-sink")
      val nonPk = meta0.schema.fieldNames.filterNot(meta0.pk.contains).toSeq

      def stageImages(changes: DataFrame): Path = {
        val p = new Path(tblDir, s".staging-changelog-${UUID.randomUUID()}")
        changes.write.parquet(p.toString)
        cleanups += p
        p
      }
      // append mode: the epoch's rows as ONE insert-image batch (no
      // pre-image join — base-independent, so never re-derived)
      def stageInsertImages(): Path = {
        val images = nonPk.flatMap { c =>
          Seq(lit(null).cast(meta0.schema(c).dataType).as(s"old_$c"),
            col(c).as(s"new_$c"))
        }
        stageImages(staged.select(
          meta0.pk.map(col) ++ (lit("insert").as("op") +: images): _*))
      }
      // upsert mode: the merge-on-read decomposition against a given
      // base — pre-image join classifies CDC images and collects the
      // matched rows' (bucket, file, pos) tombstones. A function of the
      // base manifest: derived against base0 here, re-derived inside
      // the lock only if its window changed a touched bucket.
      def deriveUpsert(baseM: Manifest, metaM: TableMeta)
          : (Option[Path], String) = {
        val oldPos = readRawPos(spark, wh, ref, metaM,
            manifestOf(baseM), withPos = true)
          .filter(col(BucketCol).isin(touched: _*))
        val j = staged.as("n")
          .join(oldPos.as("o"), metaM.pk.toIndexedSeq, "left")
        val presentOld = col(s"o.$BucketCol").isNotNull
        val clSrc: Option[Path] = if (metaM.changelog) {
          val changedCond = nonPk
            .map(c => !(col(s"n.$c") <=> col(s"o.$c")))
            .foldLeft(lit(false))(_ || _)
          val images = nonPk.flatMap { c =>
            Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))
          }
          Some(stageImages(j.select(
            metaM.pk.map(col) ++ (
              when(!presentOld, lit("insert"))
                .when(changedCond, lit("update"))
                .otherwise(lit("unchanged")).as("op") +: images): _*)))
        } else None
        val dvStaging = s"$tblDir/.staging-stream-dv-${UUID.randomUUID()}"
        cleanups += new Path(dvStaging)
        j.filter(presentOld)
          .select(col(s"o.$BucketCol").as(BucketCol),
            col(s"o.$FileCol").as("file"), col(s"o.$PosCol").as("pos"))
          .repartition(touched.size, col(BucketCol))
          .sortWithinPartitions(col(BucketCol), col("file"), col("pos"))
          .write.partitionBy(BucketCol).parquet(dvStaging)
        (clSrc, dvStaging)
      }
      var clSrc0: Option[Path] = None
      var dvStaging0: String = null
      if (!upsertMode) {
        // overlap pre-check vs the snapshot-at-start (the locked
        // re-check below covers files added since, so together they
        // cover the commit-time snapshot exactly)
        val old = readRawWith(spark, wh, ref, meta0, manifestOf(base0))
          .filter(col(BucketCol).isin(touched: _*))
        val overlap = staged.join(old, meta0.pk.toIndexedSeq, "left_semi")
          .limit(5).select(meta0.pk.map(col): _*).collect()
        if (overlap.nonEmpty)
          throw new StoreException(
            s"stream sink epoch $epochId would overwrite existing PKs, " +
            s"e.g. ${overlap.mkString(", ")} (the sink appends; " +
            "replays are handled by the epoch ledger, not upserts — " +
            "for update-by-key semantics set option sink_mode=upsert)")
        if (meta0.changelog) clSrc0 = Some(stageInsertImages())
      } else {
        val (c, d) = deriveUpsert(base0, meta0)
        clSrc0 = c; dvStaging0 = d
      }

      // the epoch's footer stats, collected OUTSIDE the lock (the
      // sink is the highest-frequency committer — its flip must stay
      // a flip however large the epoch)
      val preStats = stageFileStats(spark, f, staging,
        statColsTypedOf(meta0))

      StreamEpochHooks.betweenPhases()

      // ------- LOCKED (briefly — queue behind other committers rather
      // than fail the query; the section is a flip plus rare re-checks)
      WriteLock.withLockWait(spark, tblDir, "stream-sink", commitWaitMs) {
        val metaL = TableMeta.read(spark, tblDir)
        val baseL = snapshotForWrite(spark, tblDir, data, metaL)
        // authoritative replay re-check (another instance of the same
        // query may have committed this epoch while we staged)
        if (!baseL.streams.get(queryId).exists(_ >= epochId)) {
          if (baseL.buckets != writerBuckets) rebucketError(baseL.buckets)
          if (metaL.schema.json != meta0.schema.json)
            throw new ConcurrentWriteException(
              s"stream sink epoch $epochId of $tblDir: table schema " +
              "changed while the epoch staged; epoch aborted (table " +
              "unchanged) — restart the streaming query so its writers " +
              "pick up the new schema")
          // a CHECK registered since we staged was validated against a
          // snapshot excluding our rows — enforce only the new ones
          enforceChecks(staged, metaL.checks -- meta0.checks.keySet,
            "stream-sink(commit)")
          val windowMoved = baseL.version != base0.version
          if (!upsertMode) {
            if (windowMoved) {
              // re-check overlap against only the files ADDED since our
              // snapshot in the buckets we touch — usually none ⇒ no IO
              val addedByBucket = touched.flatMap { b =>
                val before = base0.files.getOrElse(b, Nil).map(_.name).toSet
                val now = baseL.files.getOrElse(b, Nil)
                  .filterNot(x => before.contains(x.name))
                if (now.isEmpty) None else Some(b -> now)
              }.toMap
              if (addedByBucket.nonEmpty) {
                val addedDf = readRawWith(spark, wh, ref, metaL,
                  Some(baseL.copy(files = addedByBucket)))
                val clash = staged.join(addedDf, meta0.pk.toIndexedSeq,
                    "left_semi")
                  .limit(5).select(meta0.pk.map(col): _*).collect()
                if (clash.nonEmpty)
                  throw new StoreException(
                    s"stream sink epoch $epochId would overwrite PK(s) " +
                    s"${clash.mkString(", ")} written by a concurrent " +
                    "mutation while the epoch staged (the sink appends — " +
                    "for update-by-key semantics set option " +
                    "sink_mode=upsert)")
              }
            }
            // changelog enabled mid-window: this epoch must still land
            // its batch (readChangelog's every-mutation invariant)
            val clSrc =
              clSrc0 orElse (if (metaL.changelog) Some(stageInsertImages())
                             else None)
            commitStaged(spark, f, tblDir, data, staging, touched,
              "stream", baseL, baseL.buckets, metaL, add = true,
              streamEpoch = Some(queryId -> epochId),
              preStats = Some(preStats))
            clSrc.foreach(src =>
              commitChangelogBatch(f, "stream", src,
                nextChangelogDst(f, tblDir)))
          } else {
            // the DVs must tombstone COMMIT-TIME positions: re-derive
            // iff the lock window changed a touched bucket's live set
            // (files added/removed or DVs added — e.g. a concurrent
            // batch upsert of the same keys), or CDC flipped on since
            // we staged without images
            val liveSetMoved = windowMoved && touched.exists { b =>
              base0.files.getOrElse(b, Nil).map(_.name).toSet !=
                baseL.files.getOrElse(b, Nil).map(_.name).toSet ||
              base0.dvs.getOrElse(b, Nil).map(_.name).toSet !=
                baseL.dvs.getOrElse(b, Nil).map(_.name).toSet
            }
            val (clSrc, dvStaging) =
              if (liveSetMoved || (metaL.changelog && clSrc0.isEmpty))
                deriveUpsert(baseL, metaL)
              else (clSrc0, dvStaging0)
            commitStagedMorMut(spark, f, tblDir, data, staging, dvStaging,
              touched, "stream-upsert", baseL, metaL,
              streamEpoch = Some(queryId -> epochId),
              preStats = Some(preStats))
            clSrc.foreach(src =>
              commitChangelogBatch(f, "stream-upsert", src,
                nextChangelogDst(f, tblDir)))
          }
        }
      }
    } finally {
      f.delete(stagingPath, true)
      cleanups.foreach(p => f.delete(p, true))
    }
  }

  /** Test-only interleave seam: invoked between [[commitStreamEpoch]]'s
    * unlocked validation phase and its locked commit, so a spec can
    * land an interfering mutation deterministically inside the window
    * the optimistic protocol must re-validate. A no-op in production
    * (same-JVM static, like the spec gates it mirrors). */
  private[store] object StreamEpochHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** Drop a RETIRED streaming query's epoch-ledger entry — one metadata
    * flip committing the current manifest minus `streams(queryId)`
    * (the SQL surface is `CALL graft.system.drop_stream_ledger`; the
    * ledger is readable as the `t$streams` metadata table). Without
    * this, every entry rides EVERY future commit of the table forever.
    *
    * Only for queries that will never run again: the entry is exactly
    * what makes an epoch replay a no-op ([[commitStreamEpoch]]), so
    * dropping a LIVE query's entry lets its replayed epochs re-apply.
    * It also releases the query's `.staging-stream-<queryId>` root to
    * [[vacuum]] (which skips roots holding a ledger entry). Returns
    * false when the query holds no entry. Branch refs address their
    * own chain's ledger. */
  def dropStreamLedger(spark: SparkSession, warehouse0: String,
                       tableName: String, queryId: String,
                       schema: Option[String] = None): Boolean = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    WriteLock.withLock(spark, dir, s"dropStreamLedger($queryId)") {
      Manifest.current(spark, dir) match {
        case Some(m) if m.streams.contains(queryId) =>
          Manifest.commit(spark, dir, m.copy(version = m.version + 1,
            op = Some(s"dropStreamLedger($queryId)"), tsMs = None,
            streams = m.streams - queryId))
          true
        case _ => false
      }
    }
  }

  /** Shared Auto/CoW/MoR strategy decision for every row-mutating
    * commit (delete, update, merge) — pure manifest arithmetic, zero
    * IO: MoR needs a manifest (positions resolve against its file
    * set); Auto takes MoR while the matched row count stays within
    * [[MorMaxFraction]] of the touched buckets' live rows (past that,
    * most of the touched data is changing and the CoW rewrite — which
    * also re-compacts — wins). An EXPLICIT MergeOnRead request on a
    * pre-manifest table fails with the remedy rather than silently
    * degrading into a full bucket rewrite. */
  private def morDecision(baseM: Option[Manifest], mode: DeleteMode,
                          touched: Seq[Int], matched: Long,
                          what: String, tableName: String): Boolean =
    baseM match {
      case None =>
        if (mode == DeleteMode.MergeOnRead)
          throw new StoreException(
            s"$what(mode=MergeOnRead) on $tableName: the table predates " +
            "manifest snapshots, so positional delete vectors cannot " +
            "resolve. Run any rewriting mutation (or use mode=Auto) " +
            "once to adopt a manifest baseline, then retry")
        false
      case Some(m) => mode match {
        case DeleteMode.CopyOnWrite => false
        case DeleteMode.MergeOnRead => true
        case DeleteMode.Auto =>
          val touchedSet = touched.toSet
          val fls = m.files.filter(kv => touchedSet(kv._1))
            .valuesIterator.flatten.toSeq
          val dvDead = m.dvs.filter(kv => touchedSet(kv._1))
            .valuesIterator.flatten.flatMap(_.rows).sum
          if (!fls.forall(_.rows.isDefined)) false // unknown sizes: CoW
          else {
            val live = fls.flatMap(_.rows).sum - dvDead
            matched <= (live * MorMaxFraction).toLong
          }
      }
    }

  /** Commit a merge-on-read UPDATE/MERGE: the staged POST-IMAGE data
    * files EXTEND the touched buckets' file lists (additive, the
    * append protocol) while the staged DELETE-VECTOR sidecars
    * tombstone the matched rows' old positions — both in ONE manifest
    * flip, so a reader sees either the full old state or the full new
    * state. This is the Iceberg-v2 decomposition of UPDATE/MERGE:
    * write cost ∝ |matched + inserted| rows, never the touched
    * buckets' bytes — the slope that makes a daily CDC feed over a
    * 100 TB table affordable. Any rename failure deletes the moved-in
    * files and aborts with the current snapshot untouched. */
  private def commitStagedMorMut(spark: SparkSession, f: FileSystem,
                                 dir: String, data: String,
                                 dataStaging: String, dvStaging: String,
                                 touched: Seq[Int], op: String,
                                 base: Manifest, meta: TableMeta,
                                 streamEpoch: Option[(String, Long)] = None,
                                 preStats: Option[Map[(Int, String),
                                   FileFooter]] = None)
      : Manifest = {
    val conf = spark.sparkContext.hadoopConfiguration
    val statCol = meta.pk.headOption
    val statColsTyped: Seq[(String, DataType)] = statColsTypedOf(meta)
    val commitId = UUID.randomUUID().toString.take(8)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    def abort(msg: String): Nothing = {
      moved.foreach(p => f.delete(p, false))
      throw new StoreException(msg)
    }
    def moveIn(staging: String, pfx: String): Map[Int, Seq[(Path, Long)]] =
      touched.flatMap { b =>
        val sdir = new Path(staging, s"$BucketCol=$b")
        if (!f.exists(sdir)) None
        else {
          val files = f.listStatus(sdir)
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName)
          if (files.isEmpty) None
          else {
            val tdir = new Path(data, s"$BucketCol=$b")
            if (!f.mkdirs(tdir))
              abort(s"$op(mor): could not create bucket dir $tdir; " +
                "commit aborted, current snapshot unchanged")
            Some(b -> files.toSeq.map { st =>
              val dst = new Path(tdir, s"$commitId-$pfx${st.getPath.getName}")
              if (!f.rename(st.getPath, dst))
                abort(s"$op(mor): could not move staged file " +
                  s"${st.getPath} -> $dst; commit aborted, current " +
                  "snapshot unchanged")
              moved += dst
              (dst, st.getLen)
            })
          }
        }
      }.toMap
    val dataMoved = moveIn(dataStaging, "")
    val dvMoved = moveIn(dvStaging, "dv-")
    // post-image footer stats pre-collected OUTSIDE the lock when the
    // caller staged them (see [[stageFileStats]]); DV position files
    // stay in-lock — delta-sized, and the upsert-mode sink RE-DERIVES
    // them inside the lock on a window conflict
    val pre: Map[Path, FileFooter] =
      preStats.fold(Map.empty[Path, FileFooter]) {
        ps =>
          dataMoved.iterator.flatMap { case (b, fls) =>
            fls.flatMap { case (dst, _) =>
              ps.get((b, dst.getName.stripPrefix(s"$commitId-")))
                .map(dst -> _)
            }
          }.toMap
      }
    val footer = pre ++ pkFileStatsAll(conf,
      dataMoved.valuesIterator.flatten.map(_._1)
        .filterNot(pre.contains).toSeq, statColsTyped)
    val dvFooter = pkFileStatsAll(conf,
      dvMoved.valuesIterator.flatten.map(_._1).toSeq, Nil)
    val newFiles: Map[Int, Seq[ManifestFile]] =
      base.files ++ dataMoved.map { case (b, fls) =>
        b -> (base.files.getOrElse(b, Nil) ++ fls.map { case (dst, len) =>
          val fstat = footer(dst)
          ManifestFile(dst.getName, len, fstat.rows,
            statCol.flatMap(fstat.cols.get),
            statCol.fold(fstat.cols)(fstat.cols - _),
            fstat.nulls)
        })
      }
    val newDvs: Map[Int, Seq[ManifestFile]] =
      base.dvs ++ dvMoved.map { case (b, fls) =>
        b -> (base.dvs.getOrElse(b, Nil) ++ fls.map { case (dst, len) =>
          ManifestFile(dst.getName, len, dvFooter(dst).rows)
        })
      }
    val mf = Manifest(base.version + 1, base.buckets, newFiles,
      op = Some(op), dvs = newDvs, streams = base.streams ++ streamEpoch)
    try Manifest.commit(spark, dir, mf)
    catch { case e: Throwable => moved.foreach(p => f.delete(p, false)); throw e }
  }

  /** Raw bucket-partitioned read with the evolved logical schema (old
    * files lacking evolved columns yield NULLs). Resolves the file set
    * through the current manifest snapshot when one exists — never a
    * directory walk, and immune to in-flight commits. */
  private def readRaw(spark: SparkSession, warehouse: String, table: String,
                      meta: TableMeta): DataFrame =
    readRawWith(spark, warehouse, table, meta,
      Manifest.current(spark, tableDir(warehouse, table)))

  /** Internal (file, position) identity columns a position-exposing
    * read carries — what a MoR delete writes into its DV sidecars. */
  private[store] val FileCol = "_graft_file"
  private[store] val PosCol = "_graft_pos"

  /** DV mask join strategy: broadcast the tombstone set when its total
    * position count (recorded in the manifest — zero IO to decide) is
    * small enough that shipping it beats shuffling the DATA side.
    * Beyond the bound the mask joins sort-merge; the auto-compaction
    * policy exists precisely to keep tables out of that regime (a
    * bucket past `maxDeleteFraction` rewrites and its DVs drop). The
    * DSv2 scan path never shuffles at all — masks apply inside the
    * per-file readers. */
  private val DvBroadcastMaxRows = 1000000L

  /** Auto delete-mode threshold: MoR while matches ≤ this fraction of
    * the touched buckets' live rows; past it, most of the touched data
    * is dying and the CoW rewrite (which also SHRINKS the table) wins. */
  private val MorMaxFraction = 0.2

  private def readRawWith(spark: SparkSession, warehouse: String,
                          table: String, meta: TableMeta,
                          mf: Option[Manifest]): DataFrame =
    readRawPos(spark, warehouse, table, meta, mf, withPos = false)

  /** RENAME COLUMN boundary, write side: alias every renamed LOGICAL
    * column to its PHYSICAL file name just before a staged data write
    * — live files speak physical forever (see [[TableMeta.renames]]).
    * Identity (the same DataFrame, zero plan nodes) on tables without
    * renames, i.e. everywhere until the first rename. Columns outside
    * the map (pb_bucket, _graft_file/pos, changelog images) pass
    * through untouched. */
  private def toPhys(df: DataFrame, meta: TableMeta): DataFrame =
    if (meta.renames.isEmpty) df
    else df.select(df.columns.map(c =>
      col(c).as(meta.renames.getOrElse(c, c))).toIndexedSeq: _*)

  /** RENAME COLUMN boundary, read side: alias physical file names back
    * to the logical schema — the inverse of [[toPhys]], applied once
    * per raw read. */
  private def toLogical(df: DataFrame, meta: TableMeta): DataFrame =
    if (meta.renames.isEmpty) df
    else {
      val p2l = meta.renames.map(_.swap)
      df.select(df.columns.map(c =>
        col(c).as(p2l.getOrElse(c, c))).toIndexedSeq: _*)
    }

  /** The raw read, optionally exposing each row's physical identity
    * ([[FileCol]], [[PosCol]] — parquet file name + row ordinal via
    * `_metadata.row_index`), and ALWAYS applying the snapshot's delete
    * vectors: rows a DV tombstones are anti-joined out here, so every
    * v1 consumer (readSql, mutation pre-images, diff, restore, probes)
    * sees live rows only. The no-DV case adds zero plan nodes. */
  private def readRawPos(spark: SparkSession, warehouse: String,
                         table: String, meta: TableMeta,
                         mf: Option[Manifest],
                         withPos: Boolean): DataFrame = {
    // files carry PHYSICAL names: scan with the physical schema, then
    // toLogical (below) aliases the frame back — renames cost one
    // projection, and parquet row-group pruning keeps working
    val withBucketField = StructType(
      meta.physSchema.fields :+
        StructField(BucketCol, IntegerType, nullable = true))
    val data = dataDir(warehouse, table)
    toLogical(mf match {
      case Some(m) =>
        val paths = m.absolutePaths(data)
        val dvPaths = m.dvPaths(data)
        if (paths.isEmpty) {
          val s =
            if (!withPos) withBucketField
            else StructType(withBucketField.fields :+
              StructField(FileCol, StringType) :+ StructField(PosCol, LongType))
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
        } else {
          // basePath keeps pb_bucket recoverable from the dir names of
          // the explicitly listed files (partition-style read)
          val base = spark.read.option("basePath", data)
            .schema(withBucketField).parquet(paths: _*)
          if (dvPaths.isEmpty && !withPos) base
          else {
            val withId = base
              .withColumn(FileCol, col("_metadata.file_name"))
              .withColumn(PosCol, col("_metadata.row_index"))
            val masked =
              if (dvPaths.isEmpty) withId
              else {
                // a row's identity is (bucket, file, pos): one staging
                // TASK can write same-named part files into several
                // bucket dirs, so the file name alone is NOT globally
                // unique — the bucket term (recovered from the DV
                // sidecar's own directory via basePath) disambiguates
                val dv0 = spark.read.option("basePath", data)
                  .schema(StructType(Seq(StructField("file", StringType),
                    StructField("pos", LongType),
                    StructField(BucketCol, IntegerType))))
                  .parquet(dvPaths: _*)
                val dv =
                  if (m.dvRows.exists(_ <= DvBroadcastMaxRows)) broadcast(dv0)
                  else dv0
                withId.join(dv,
                  withId(BucketCol) === dv(BucketCol) &&
                    withId(FileCol) === dv("file") && withId(PosCol) === dv("pos"),
                  "left_anti")
              }
            if (withPos) masked else masked.drop(FileCol, PosCol)
          }
        }
      case None => // legacy pre-manifest table (never carries DVs)
        if (withPos)
          throw new StoreException(
            "position-exposing read requires a manifest snapshot")
        spark.read.schema(withBucketField).parquet(data)
    }, meta)
  }

  private def append(df: DataFrame, warehouse: String, table: String,
                     addNewColumns: Boolean, validate: Boolean,
                     changelog0: Boolean = false,
                     txn: Option[(String, Long)] = None): Unit = {
    val spark = df.sparkSession
    val dir = tableDir(warehouse, table)
    val meta0 = TableMeta.read(spark, dir)
    // idempotent-retry fast exit (see toSql's txn contract): the whole
    // mutation runs under the table lock, so one check here is
    // race-free — BEFORE the auto-index mark bumps or any job runs
    if (txn.exists { case (id, v) =>
          Manifest.current(spark, dir).exists(_.streams.get(id).exists(_ >= v))
        }) return
    // table-property CDC (see TableMeta.changelog): an append to a
    // changelog-maintained table logs its rows as `insert` ops — old_*
    // all NULL, new_* = the incoming values; no pre-image join needed
    // (appends are overlap-checked, every row is new by contract)
    val changelog = changelog0 || meta0.changelog

    val (aligned0, evolved, meta) =
      if (meta0.autoIndex) {
        // continue the synthetic PK from the stored high-water mark —
        // no table scan; pre-field tables recover via footer stats
        val cur = meta0.maxAutoIndex
          .getOrElse(footerMaxAutoIndex(spark, warehouse, table, meta0))
        val (withIds, n) = assignAutoIndex(df, cur + 1L)
        val m = meta0.copy(maxAutoIndex = Some(cur + n))
        // the mark commits BEFORE the data write: a crash between the
        // two leaves it too high (harmless id gap), never too low
        // (duplicate ids on the next append)
        TableMeta.write(spark, dir, m)
        val (a, e) = align(withIds, m, addNewColumns)
        (a, e, m)
      } else {
        val (a, e) = align(df, meta0, addNewColumns)
        (a, e, meta0)
      }

    val data = dataDir(warehouse, table)
    val base = snapshotForWrite(spark, dir, data, meta)
    val newB = withBucket(aligned0, meta.pk, base.buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      enforceChecks(newB, meta.checks, "append")
      // validate AFTER persist so the (possibly expensive) incoming
      // pipeline is computed once; one fused job answers the PK check
      // and the touched-bucket set off the cache
      val touched = validateAndTouched(newB, meta.pk, validate && !meta.autoIndex)
      // staged write + ADDITIVE manifest commit: the new files extend
      // the touched buckets' lists; nothing live is replaced.
      // The PK-overlap probe and the (optional) changelog batch read
      // only the live snapshot + the cached delta — independent of the
      // staging write, so the three jobs overlap (guide §2.6); any
      // failure aborts before the commit flips anything, exactly as
      // the sequential order did.
      val staging = s"$dir/.staging-append-${UUID.randomUUID()}"
      val f = fs(spark, dir)
      var clCommit: Option[(Path, Path)] = None
      try {
        try {
          inParallel(
            {
              if (!meta.autoIndex) {
                val old = readRawWith(spark, warehouse, table, meta, manifestOf(base))
                  .filter(col(BucketCol).isin(touched: _*))
                val overlap = newB.join(old, meta.pk, "left_semi").limit(5)
                  .select(meta.pk.map(col): _*).collect()
                if (overlap.nonEmpty)
                  throw new StoreException(
                    s"Append would overwrite existing PKs, e.g. ${overlap.mkString(", ")} " +
                    "(reference: sql.py:264 append raises on repeated index)")
              }
              // Changelog batch: all inserts (every row is new by the
              // overlap contract); staged before the data commit,
              // renamed in only after it — same ordering as upsert's
              if (changelog) {
                val nonPk = evolved.fieldNames.filterNot(meta.pk.contains).toSeq
                val images = nonPk.flatMap { c =>
                  Seq(lit(null).cast(evolved(c).dataType).as(s"old_$c"),
                    col(c).as(s"new_$c"))
                }
                val changes = newB
                  .select(meta.pk.map(col) ++ (lit("insert").as("op") +: images): _*)
                clCommit = Some(stageChangelogBatch(spark, dir, changes))
              }
            },
            toPhys(clusterByBucket(newB, base.buckets, meta.pk), meta)
              .write.partitionBy(BucketCol).parquet(staging))
          commitStaged(spark, f, dir, data, staging, touched, "append",
            base, base.buckets, meta, add = true, streamEpoch = txn)
        } finally f.delete(new Path(staging), true)
        clCommit.foreach { case (src, dst) =>
          commitChangelogBatch(f, "append", src, dst)
        }
      } finally clCommit.foreach { case (src, _) => f.delete(src, true) }
      val meta2 = meta.copy(schema = evolved, changelog = changelog)
      if (meta2 != meta) TableMeta.write(spark, dir, meta2)
    } finally newB.unpersist()
  }

  /** A writer baseline as a reader manifest: the adopted version "-1"
    * baseline of a legacy table means "no manifest — read the dirs". */
  private def manifestOf(base: Manifest): Option[Manifest] =
    if (base.version >= 0) Some(base) else None

  /** OPTIMISTIC append: the Delta/Iceberg commit model for the one
    * mutation shape that composes — appends add uniquely-named files,
    * so two appends to the same table (even the same buckets) never
    * physically conflict; only the manifest flip must serialize.
    *
    * [[toSql]]'s append holds the write lock for the WHOLE mutation —
    * planning, validation, and the (possibly huge) staged write job —
    * so N ingest jobs into one table serialize end-to-end: at 1000
    * executors the cluster runs one append's tasks while N−1 drivers
    * wait. This path instead:
    *
    *  1. UNLOCKED: reads the current snapshot, buckets + validates the
    *     delta, pre-checks PK overlap against the snapshot-at-start
    *     (delta-bounded), and runs the staged write job;
    *  2. LOCKED (briefly, queuing up to `commitWaitMs` behind other
    *     committers — the section is a manifest flip, not a write job):
    *     re-validates against the LATEST state and commits.
    *
    * Commit-time conflict rules (all throw [[ConcurrentWriteException]]
    * with the table unchanged and staging cleaned; retry the call):
    *  - bucket count changed (a rebucket won the race) — staged files
    *    are bucketed under the old layout;
    *  - schema conflict: a column now typed differently than our staged
    *    files wrote it, or since dropped (writing it would silently
    *    discard or later resurrect data);
    *  - PK overlap with rows committed since our snapshot — checked
    *    against only the files ADDED between snapshot-at-start and
    *    latest (usually none ⇒ zero IO): a key live at commit time is
    *    either in a start-snapshot file (pre-checked) or in an added
    *    file (re-checked), so the two checks together cover the latest
    *    snapshot exactly. (A key DELETED since the start may fail the
    *    pre-check spuriously; the retry then succeeds — conservative,
    *    never unsound.)
    *
    * Auto-index tables reserve their id range under a short lock before
    * staging (the high-water mark is the one piece of append state that
    * cannot be merged after the fact); a crash after reserving leaves
    * an id gap, never a duplicate — same rule as [[append]].
    * A pre-manifest legacy table (no snapshot isolation to commit
    * against) falls back to the classic locked append, waiting up to
    * `commitWaitMs` for the lock. */
  def appendConcurrent(df: DataFrame, warehouse0: String, tableName: String,
                       addNewColumns: Boolean = false,
                       validate: Boolean = true,
                       schema: Option[String] = None,
                       changelog: Boolean = false,
                       commitWaitMs: Long = 60000L,
                       txn: Option[(String, Long)] = None): Unit = {
    val spark = df.sparkSession
    val wh = schemaDir(warehouse0, schema)
    val dir = tableDir(wh, tableName)
    if (!TableMeta.exists(spark, dir))
      throw new StoreException(
        s"appendConcurrent: table $tableName does not exist " +
        "(create it with toSql first — creation must arbitrate under the lock)")
    val naive = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (naive.nonEmpty)
      throw new StoreException(
        s"Column(s) ${naive.map(_.name).mkString(", ")} timezone must be set " +
        "(naive TimestampNTZ rejected, as in toSql strictUtc)")
    val cleaned = df.columns.foldLeft(df) { (d, c) =>
      val cc = Names.cleanName(c)
      if (cc == c) d else d.withColumnRenamed(c, cc)
    }
    val data = dataDir(wh, tableName)
    val meta0 = TableMeta.read(spark, dir)
    val base0 = Manifest.current(spark, dir).getOrElse {
      // legacy table: no snapshot to diff against — classic locked
      // append (which adopts a manifest, so the NEXT call is optimistic)
      WriteLock.withLockWait(spark, dir, "appendConcurrent(legacy)",
        commitWaitMs) {
        append(cleaned, wh, tableName, addNewColumns, validate, changelog,
          txn)
      }
      return
    }
    // idempotent-retry fast exit against the snapshot-at-start (cheap,
    // unlocked); the LOCKED commit below re-checks against the latest
    // snapshot, which is what makes two racing attempts with the same
    // token commit exactly once
    if (txn.exists { case (id, v) =>
          base0.streams.get(id).exists(_ >= v) }) return
    val wantChangelog = changelog || meta0.changelog

    // ---------------- UNLOCKED: plan, validate, stage ----------------
    val (aligned0, evolved, metaUsed) =
      if (meta0.autoIndex) {
        val n = cleaned.count()
        // short lock: reserve [cur+1, cur+n]; mark-before-data as in
        // append (crash ⇒ id gap, never a duplicate). Assignment and
        // alignment run AFTER release — only the high-water-mark bump
        // needs exclusion.
        val (start, m) = WriteLock.withLockWait(spark, dir,
            "appendConcurrent(reserve-ids)", commitWaitMs) {
          val m0 = TableMeta.read(spark, dir)
          val cur = m0.maxAutoIndex
            .getOrElse(footerMaxAutoIndex(spark, wh, tableName, m0))
          val m1 = m0.copy(maxAutoIndex = Some(cur + n))
          TableMeta.write(spark, dir, m1)
          (cur + 1L, m1)
        }
        val (withIds, n2) = assignAutoIndex(cleaned, start)
        if (n2 != n)
          throw new StoreException(
            s"appendConcurrent: incoming frame is non-deterministic " +
            s"($n rows at reservation, $n2 at assignment); ids would " +
            "escape the reserved range — materialize the input first")
        val (a, e) = align(withIds, m, addNewColumns)
        (a, e, m)
      } else {
        val (a, e) = align(cleaned, meta0, addNewColumns)
        (a, e, meta0)
      }
    val newB = withBucket(aligned0, metaUsed.pk, base0.buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = fs(spark, dir)
    try {
      enforceChecks(newB, metaUsed.checks, "appendConcurrent")
      val touched = validateAndTouched(newB, metaUsed.pk,
        validate && !metaUsed.autoIndex)
      if (!metaUsed.autoIndex) {
        // provisional overlap pre-check against the snapshot-at-start
        // (unlocked; the locked re-check below covers everything added
        // since, so together they cover the commit-time snapshot)
        val old = readRawWith(spark, wh, tableName, metaUsed, Some(base0))
          .filter(col(BucketCol).isin(touched: _*))
        val overlap = newB.join(old, metaUsed.pk, "left_semi").limit(5)
          .select(metaUsed.pk.map(col): _*).collect()
        if (overlap.nonEmpty)
          throw new StoreException(
            s"Append would overwrite existing PKs, e.g. ${overlap.mkString(", ")} " +
            "(reference: sql.py:264 append raises on repeated index)")
      }
      // changelog images staged UNLOCKED (append images need no
      // pre-image join); batch number + rename happen inside the lock.
      // The same staging runs INSIDE the lock if a concurrent writer
      // enabled the changelog property while we staged without one —
      // every mutation on a CDC table must land a batch (the invariant
      // readChangelog documents), and newB is persisted, so the
      // lock-time job is one cached-scan write, not a recompute.
      def stageInsertImages(): Path = {
        val nonPk = evolved.fieldNames.filterNot(metaUsed.pk.contains).toSeq
        val images = nonPk.flatMap { c =>
          Seq(lit(null).cast(evolved(c).dataType).as(s"old_$c"),
            col(c).as(s"new_$c"))
        }
        val changes = newB
          .select(metaUsed.pk.map(col) ++ (lit("insert").as("op") +: images): _*)
        val p = new Path(dir, s".staging-changelog-${UUID.randomUUID()}")
        changes.write.parquet(p.toString)
        p
      }
      val clStaging: Option[Path] =
        if (wantChangelog) Some(stageInsertImages()) else None
      var clLate: Option[Path] = None
      val staging = s"$dir/.staging-append-${UUID.randomUUID()}"
      try {
        // the expensive job — OUTSIDE the lock
        toPhys(clusterByBucket(newB, base0.buckets, metaUsed.pk), metaUsed)
          .write.partitionBy(BucketCol).parquet(staging)
        val preStats = stageFileStats(spark, f, staging,
          statColsTypedOf(metaUsed))

        // ---------------- LOCKED: re-validate, commit ----------------
        WriteLock.withLockWait(spark, dir, "appendConcurrent(commit)",
            commitWaitMs) {
          val metaLatest = TableMeta.read(spark, dir)
          val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
          // a racing attempt with the same txn token committed while
          // this one staged: no-op (staging cleaned by the finally) —
          // checked FIRST so a replay never trips the conflict guards
          if (txn.exists { case (id, v) =>
                baseLatest.streams.get(id).exists(_ >= v) }) return
          // a CHECK constraint registered since this append staged was
          // validated against a snapshot that excludes our rows — the
          // commit must enforce the NEW constraints itself (the common
          // case pays nothing: no new checks, no job)
          enforceChecks(newB,
            metaLatest.checks -- metaUsed.checks.keySet,
            "appendConcurrent(commit)")
          if (baseLatest.buckets != base0.buckets)
            throw new ConcurrentWriteException(
              s"bucket count changed ${base0.buckets} -> " +
              s"${baseLatest.buckets} (concurrent rebucket); staged files " +
              "use the old layout — retry the append")
          val mergedSchema = mergeEvolved(evolved, metaUsed, metaLatest)
          if (!metaUsed.autoIndex && baseLatest.version != base0.version) {
            // re-check overlap against only the files ADDED since our
            // snapshot in the buckets we touch — usually none ⇒ no IO
            val addedByBucket = touched.flatMap { b =>
              val before = base0.files.getOrElse(b, Nil).map(_.name).toSet
              val now = baseLatest.files.getOrElse(b, Nil)
                .filterNot(x => before.contains(x.name))
              if (now.isEmpty) None else Some(b -> now)
            }.toMap
            if (addedByBucket.nonEmpty) {
              val addedDf = readRawWith(spark, wh, tableName, metaLatest,
                Some(baseLatest.copy(files = addedByBucket)))
              val clash = newB.join(addedDf, metaUsed.pk, "left_semi")
                .limit(5).select(metaUsed.pk.map(col): _*).collect()
              if (clash.nonEmpty)
                throw new ConcurrentWriteException(
                  s"PK(s) ${clash.mkString(", ")} were written by a " +
                  "concurrent mutation after this append staged; retry " +
                  "(or use upsert semantics if overwrite is intended)")
            }
          }
          // a concurrent writer may have ENABLED the changelog property
          // since this append staged without one — commit must still
          // land this append's batch or downstream log consumers would
          // silently miss these rows (see readChangelog's invariant)
          if (metaLatest.changelog && clStaging.isEmpty)
            clLate = Some(stageInsertImages())
          commitStaged(spark, f, dir, data, staging, touched,
            "appendConcurrent", baseLatest, baseLatest.buckets,
            metaLatest.copy(schema = mergedSchema), add = true,
            streamEpoch = txn, preStats = Some(preStats))
          (clStaging orElse clLate).foreach { src =>
            commitChangelogBatch(f, "appendConcurrent", src,
              nextChangelogDst(f, dir))
          }
          val metaFinal = metaLatest.copy(schema = mergedSchema,
            changelog = wantChangelog || metaLatest.changelog)
          if (metaFinal != metaLatest) TableMeta.write(spark, dir, metaFinal)
        }
      } finally {
        f.delete(new Path(staging), true)
        (clStaging.toSeq ++ clLate.toSeq).foreach(p => f.delete(p, true))
      }
    } finally newB.unpersist()
  }

  /** Merge this append's (possibly evolved) schema into the table's
    * COMMIT-TIME schema, detecting concurrent-evolution conflicts:
    * columns another writer added meanwhile are kept (our files read
    * NULL for them); columns we add are appended; a type mismatch or a
    * since-dropped column aborts ([[ConcurrentWriteException]]). */
  private def mergeEvolved(evolved: StructType, metaUsed: TableMeta,
                           metaLatest: TableMeta): StructType = {
    if (metaLatest.schema == metaUsed.schema) return evolved
    val latestTypes = metaLatest.schema.fields.map(x => x.name -> x.dataType).toMap
    evolved.fields.foreach { fld =>
      latestTypes.get(fld.name).foreach { t =>
        if (t != fld.dataType)
          throw new ConcurrentWriteException(
            s"column ${fld.name} is now ${t.catalogString} but this " +
            s"append staged ${fld.dataType.catalogString} " +
            "(concurrent schema change); retry the append")
      }
      if (metaLatest.dropped.contains(fld.name) &&
          !latestTypes.contains(fld.name))
        throw new ConcurrentWriteException(
          s"column ${fld.name} was dropped by a concurrent mutation; " +
          "its staged values would be silently discarded — retry the " +
          "append against the current schema")
    }
    val extra = evolved.fields.filterNot(x => latestTypes.contains(x.name))
    StructType(metaLatest.schema.fields ++ extra)
  }

  /** Upsert WITHOUT holding the write lock for the merge job — the
    * [[appendConcurrent]] protocol extended to a REPLACE-shaped
    * mutation via a BUCKET-LEVEL conflict window (the Delta/Iceberg
    * multi-writer story): two upserts into DISJOINT bucket sets both
    * commit; overlapping ones abort-and-retry instead of corrupting
    * each other's pre-image.
    *
    *  1. UNLOCKED: snapshot-at-start, bucket + validate the delta,
    *     full-outer-merge it against the snapshot's TOUCHED buckets,
    *     stage the replacement bucket files (CoW) and the changelog
    *     images (classified against the same pre-image);
    *  2. LOCKED (briefly — a manifest flip, not a write job):
    *     re-validate against the LATEST state and commit.
    *
    * Commit-time conflict rules (all throw [[ConcurrentWriteException]]
    * with the table unchanged and staging cleaned; retry the call):
    *  - bucket count changed (a rebucket won the race);
    *  - schema conflict (a staged column re-typed or dropped since);
    *  - TOUCHED-BUCKET overlap: any touched bucket whose manifest
    *    window (file set OR delete-vector set) changed since the start
    *    snapshot — the staged merge read a pre-image that is no longer
    *    the truth. Disjoint-bucket writers never trip this: their
    *    buckets carry over untouched through each other's commits, so
    *    N upsert jobs into N key ranges overlap their merge work and
    *    serialize only on the flip.
    *
    * Versus [[appendConcurrent]] the window is per-BUCKET, not per-KEY:
    * an upsert rewrites whole buckets, so a same-bucket concurrent
    * write invalidates the staged output even when the KEYS are
    * disjoint — the bucket window is exactly the granularity the
    * commit replaces. Plain upserts only (partial-column semantics
    * included); merge feeds and deletes keep the locked path.
    * Auto-index tables refuse (same contract as [[upsert]]); a
    * pre-manifest legacy table falls back to the classic locked
    * upsert. */
  def upsertConcurrent(df: DataFrame, warehouse0: String, tableName: String,
                       addNewColumns: Boolean = false,
                       validate: Boolean = true,
                       schema: Option[String] = None,
                       changelog: Boolean = false,
                       commitWaitMs: Long = 60000L): Unit = {
    val spark = df.sparkSession
    val wh = schemaDir(warehouse0, schema)
    val dir = tableDir(wh, tableName)
    if (!TableMeta.exists(spark, dir))
      throw new StoreException(
        s"upsertConcurrent: table $tableName does not exist " +
        "(create it with toSql first — creation must arbitrate under the lock)")
    val naive = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (naive.nonEmpty)
      throw new StoreException(
        s"Column(s) ${naive.map(_.name).mkString(", ")} timezone must be set " +
        "(naive TimestampNTZ rejected, as in toSql strictUtc)")
    val cleaned = df.columns.foldLeft(df) { (d, c) =>
      val cc = Names.cleanName(c)
      if (cc == c) d else d.withColumnRenamed(c, cc)
    }
    val data = dataDir(wh, tableName)
    val meta0 = TableMeta.read(spark, dir)
    if (meta0.autoIndex)
      throw new StoreException(
        "Cannot upsert into a table with an automatically generated index (reference: sql.py:177)")
    val base0 = Manifest.current(spark, dir).getOrElse {
      // legacy table: no snapshot to window against — classic locked
      // upsert (which adopts a manifest, so the NEXT call is optimistic)
      WriteLock.withLockWait(spark, dir, "upsertConcurrent(legacy)",
        commitWaitMs) {
        upsert(cleaned, wh, tableName, addNewColumns, validate, changelog)
      }
      return
    }
    val wantChangelog = changelog || meta0.changelog
    // partial-column contract: only columns PRESENT in the incoming
    // frame overwrite; the rest keep stored values (reference
    // sql.py:299) — captured before align pads the schema
    val incomingCols = cleaned.columns.toSet
    val (aligned, evolved) = align(cleaned, meta0, addNewColumns)
    val newB = withBucket(aligned, meta0.pk, base0.buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = fs(spark, dir)
    try {
      enforceChecks(newB, meta0.checks, "upsertConcurrent")
      val touched = validateAndTouched(newB, meta0.pk, validate)
      val oldTouched = readRawWith(spark, wh, tableName,
          meta0.copy(schema = evolved), Some(base0))
        .filter(col(BucketCol).isin(touched: _*))
      val marked = newB.withColumn("_graft_new", lit(true))
      val nonPk = evolved.fieldNames.filterNot(meta0.pk.contains)
      val out = oldTouched.as("o")
        .join(marked.as("n"), meta0.pk.toIndexedSeq, "full_outer")
        .select(meta0.pk.map(col) ++ nonPk.map { c =>
          val merged =
            if (incomingCols.contains(c))
              when(col("n._graft_new").isNotNull, col(s"n.$c"))
                .otherwise(col(s"o.$c"))
            else col(s"o.$c")
          merged.as(c)
        } :+ coalesce(col(s"n.$BucketCol"), col(s"o.$BucketCol"))
          .as(BucketCol): _*)
      // changelog images classified against the snapshot-at-start
      // pre-image — valid at commit BECAUSE the touched-bucket window
      // check proves that pre-image is still the live truth
      def stageImages(): Path = {
        val presentOld = col(s"o.$BucketCol").isNotNull
        val valueCols = incomingCols.toSeq
          .filterNot(meta0.pk.contains).filter(nonPk.contains).sorted
        val changedCond = valueCols
          .map(c => !(col(s"n.$c") <=> col(s"o.$c")))
          .reduceOption(_ || _).getOrElse(lit(false))
        val images = nonPk.toSeq.flatMap { c =>
          val post =
            if (incomingCols.contains(c)) col(s"n.$c") else col(s"o.$c")
          Seq(col(s"o.$c").as(s"old_$c"), post.as(s"new_$c"))
        }
        val changes = marked.as("n")
          .join(oldTouched.as("o"), meta0.pk.toIndexedSeq, "left")
          .select(meta0.pk.map(col) ++ (
            when(!presentOld, lit("insert"))
              .when(changedCond, lit("update"))
              .otherwise(lit("unchanged")).as("op") +: images): _*)
        val p = new Path(dir, s".staging-changelog-${UUID.randomUUID()}")
        changes.write.parquet(p.toString)
        p
      }
      val clStaging: Option[Path] =
        if (wantChangelog) Some(stageImages()) else None
      var clLate: Option[Path] = None
      val staging = s"$dir/.staging-upsertc-${UUID.randomUUID()}"
      try {
        // the expensive merge job — OUTSIDE the lock
        toPhys(clusterByBucket(out, base0.buckets, meta0.pk), meta0)
          .write.partitionBy(BucketCol).parquet(staging)
        val preStats = stageFileStats(spark, f, staging,
          statColsTypedOf(meta0))
        UpsertConcurrentHooks.betweenPhases()

        // ---------------- LOCKED: re-validate, commit ----------------
        WriteLock.withLockWait(spark, dir, "upsertConcurrent(commit)",
            commitWaitMs) {
          val metaLatest = TableMeta.read(spark, dir)
          val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
          enforceChecks(newB,
            metaLatest.checks -- meta0.checks.keySet,
            "upsertConcurrent(commit)")
          if (baseLatest.buckets != base0.buckets)
            throw new ConcurrentWriteException(
              s"bucket count changed ${base0.buckets} -> " +
              s"${baseLatest.buckets} (concurrent rebucket); staged files " +
              "use the old layout — retry the upsert")
          val mergedSchema = mergeEvolved(evolved, meta0, metaLatest)
          if (baseLatest.version != base0.version) {
            def window(m: Manifest, b: Int): (Set[String], Set[String]) =
              (m.files.getOrElse(b, Nil).map(_.name).toSet,
                m.dvs.getOrElse(b, Nil).map(_.name).toSet)
            val dirty = touched
              .filter(b => window(base0, b) != window(baseLatest, b))
            if (dirty.nonEmpty)
              throw new ConcurrentWriteException(
                s"bucket(s) ${dirty.sorted.take(5).mkString(", ")} changed " +
                "since this upsert staged (concurrent mutation with an " +
                "overlapping touched-bucket set); the staged merge read a " +
                "stale pre-image — retry the upsert")
          }
          if (metaLatest.changelog && clStaging.isEmpty)
            clLate = Some(stageImages())
          commitStaged(spark, f, dir, data, staging, touched,
            "upsertConcurrent", baseLatest, baseLatest.buckets,
            metaLatest.copy(schema = mergedSchema),
            preStats = Some(preStats))
          (clStaging orElse clLate).foreach { src =>
            commitChangelogBatch(f, "upsertConcurrent", src,
              nextChangelogDst(f, dir))
          }
          val metaFinal = metaLatest.copy(schema = mergedSchema,
            changelog = wantChangelog || metaLatest.changelog)
          if (metaFinal != metaLatest) TableMeta.write(spark, dir, metaFinal)
        }
      } finally {
        f.delete(new Path(staging), true)
        (clStaging.toSeq ++ clLate.toSeq).foreach(p => f.delete(p, true))
      }
    } finally newB.unpersist()
  }

  /** Test-only interleave seam: invoked between [[upsertConcurrent]]'s
    * unlocked stage phase and its locked commit, so a spec can land an
    * interfering mutation deterministically inside the window the
    * bucket-level conflict check must catch (or, for a disjoint-bucket
    * writer, must NOT catch). A no-op in production. */
  private[store] object UpsertConcurrentHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** [[UpsertConcurrentHooks]]'s twin for [[deleteConcurrent]] (its own
    * object, so concurrently-running suites never share a seam). */
  private[store] object DeleteConcurrentHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** [[UpsertConcurrentHooks]]'s twin for [[mergeConcurrent]]. */
  private[store] object MergeConcurrentHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** [[UpsertConcurrentHooks]]'s twin for [[updateConcurrent]]. */
  private[store] object UpdateConcurrentHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** Predicate UPDATE without holding the write lock for the rewrite —
    * the fourth face of the bucket-level optimistic protocol
    * ([[upsertConcurrent]] / [[deleteConcurrent]] / [[mergeConcurrent]]):
    * every row-mutating verb now has an optimistic twin. Same contract
    * as [[update]]: `set` maps existing NON-PK columns to expressions
    * over the row's CURRENT values (cast to the stored type), only
    * matching buckets rewrite (CoW) or tombstone + re-append (MoR,
    * [[DeleteMode]].Auto deciding from the same manifest arithmetic),
    * CHECKs see the post-images, CDC logs update/unchanged rows with
    * exact before/after images. Returns the matched-row count.
    *
    * The probe, the staged rewrite (or DV positions + post-image
    * files), and the CDC images run against the snapshot-at-start
    * OUTSIDE the lock; the locked flip aborts on rebucket, ANY schema
    * change, or a touched bucket whose file/DV window moved — the
    * staged bucket images (and MoR position ordinals) are only valid
    * against the exact pre-image they read. A backfill sweep
    * partitioned by key range runs N update jobs that serialize only
    * on manifest flips. */
  def updateConcurrent(spark: SparkSession, warehouse0: String,
                       tableName: String, where: Column,
                       set: Map[String, Column],
                       schema: Option[String] = None,
                       changelog: Boolean = false,
                       mode: DeleteMode = DeleteMode.Auto,
                       commitWaitMs: Long = 60000L): Long = {
    require(set.nonEmpty, "update needs at least one SET column")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (!TableMeta.exists(spark, dir))
      throw new StoreException(
        s"updateConcurrent: table $tableName does not exist")
    val meta0 = TableMeta.read(spark, dir)
    set.keys.foreach { c =>
      if (!meta0.schema.fieldNames.contains(c))
        throw new StoreException(
          s"update SET column $c not in table schema ${meta0.schema.fieldNames.toSeq}")
      if (meta0.pk.contains(c))
        throw new StoreException(
          s"update cannot SET primary-key column $c (a key move is a " +
          "delete + insert; use merge or delete/append)")
    }
    val base0 = Manifest.current(spark, dir).getOrElse {
      // legacy table: classic locked update
      return WriteLock.withLockWait(spark, dir, "updateConcurrent(legacy)",
        commitWaitMs) {
        update(spark, warehouse0, tableName, where, set, schema,
          changelog, mode)
      }
    }
    val cdc = changelog || meta0.changelog
    val data = dataDir(warehouse, tableName)
    val raw = readRawWith(spark, warehouse, tableName, meta0, Some(base0))
    val matched = coalesce(where, lit(false))
    val probe = raw.filter(matched).groupBy(col(BucketCol))
      .agg(count(lit(1)).as("n")).collect()
    val touched = probe.map(_.getInt(0)).toSeq
    val nMatched = probe.map(_.getLong(1)).sum
    if (touched.isEmpty) {
      if (cdc && !meta0.changelog)
        WriteLock.withLockWait(spark, dir, "updateConcurrent(cdc-flag)",
            commitWaitMs) {
          val m = TableMeta.read(spark, dir)
          if (!m.changelog) TableMeta.write(spark, dir, m.copy(changelog = true))
        }
      return 0L
    }
    val f = fs(spark, dir)
    def newVal(c: String): Column =
      set.get(c).map(_.cast(meta0.schema(c).dataType)).getOrElse(col(c))
    // the check sees the POST-image of every matched row, before staging
    enforceChecks(
      raw.filter(matched).select(meta0.schema.fieldNames.toSeq
        .map(c => newVal(c).as(c)): _*),
      meta0.checks, "updateConcurrent")
    def stageImages(): Path = {
      val nonPk = meta0.schema.fieldNames.filterNot(meta0.pk.contains).toSeq
      val changedCond = set.keys.toSeq.sorted
        .map(c => !(newVal(c) <=> col(c)))
        .reduceOption(_ || _).getOrElse(lit(false))
      val images = nonPk.flatMap { c =>
        Seq(col(c).as(s"old_$c"), newVal(c).as(s"new_$c"))
      }
      val changes = raw.filter(matched)
        .select(meta0.pk.map(col) ++ (
          when(changedCond, lit("update"))
            .otherwise(lit("unchanged")).as("op") +: images): _*)
      val p = new Path(dir, s".staging-changelog-${UUID.randomUUID()}")
      changes.write.parquet(p.toString)
      p
    }
    val clStaging: Option[Path] = if (cdc) Some(stageImages()) else None
    var clLate: Option[Path] = None
    val mor = morDecision(Some(base0), mode, touched, nMatched,
      "update", tableName)
    val staging = s"$dir/.staging-updatec-${UUID.randomUUID()}"
    val dvStaging = s"$dir/.staging-updatec-dv-${UUID.randomUUID()}"
    try {
      // the expensive rewrite job(s) — OUTSIDE the lock
      if (mor) {
        val posFrame = readRawPos(spark, warehouse, tableName, meta0,
            Some(base0), withPos = true)
          .filter(matched)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          posFrame
            .select(col(BucketCol), col(FileCol).as("file"),
              col(PosCol).as("pos"))
            .repartition(touched.size, col(BucketCol))
            .sortWithinPartitions(col(BucketCol), col("file"), col("pos"))
            .write.partitionBy(BucketCol).parquet(dvStaging)
          toPhys(posFrame
            .select(meta0.schema.fieldNames.toSeq
              .map(c => newVal(c).as(c)) :+ col(BucketCol): _*)
            .repartition(touched.size, col(BucketCol))
            .sortWithinPartitions((BucketCol +: meta0.pk).map(col): _*),
            meta0)
            .write.partitionBy(BucketCol).parquet(staging)
        } finally posFrame.unpersist()
      } else {
        val rewritten = meta0.schema.fieldNames.toSeq.map { c =>
          (if (set.contains(c)) when(matched, newVal(c)).otherwise(col(c))
           else col(c)).as(c)
        } :+ col(BucketCol)
        toPhys(raw.filter(col(BucketCol).isin(touched: _*))
          .select(rewritten: _*)
          .repartition(touched.size, col(BucketCol))
          .sortWithinPartitions((BucketCol +: meta0.pk).map(col): _*),
          meta0)
          .write.partitionBy(BucketCol).parquet(staging)
      }
      // post-image staging has the same bucket layout in BOTH modes —
      // pre-collect its footer stats outside the lock either way
      val preStats = stageFileStats(spark, f, staging,
        statColsTypedOf(meta0))
      UpdateConcurrentHooks.betweenPhases()

      // ---------------- LOCKED: re-validate, commit ----------------
      WriteLock.withLockWait(spark, dir, "updateConcurrent(commit)",
          commitWaitMs) {
        val metaLatest = TableMeta.read(spark, dir)
        val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
        if (baseLatest.buckets != base0.buckets)
          throw new ConcurrentWriteException(
            s"bucket count changed ${base0.buckets} -> " +
            s"${baseLatest.buckets} (concurrent rebucket); staged files " +
            "use the old layout — retry the update")
        if (metaLatest.schema != meta0.schema)
          throw new ConcurrentWriteException(
            "table schema changed while this update staged (the rewrite " +
            "republished bucket images under the old schema); retry the " +
            "update")
        def window(m: Manifest, b: Int): (Set[String], Set[String]) =
          (m.files.getOrElse(b, Nil).map(_.name).toSet,
            m.dvs.getOrElse(b, Nil).map(_.name).toSet)
        if (baseLatest.version != base0.version) {
          val dirty = touched
            .filter(b => window(base0, b) != window(baseLatest, b))
          if (dirty.nonEmpty)
            throw new ConcurrentWriteException(
              s"bucket(s) ${dirty.sorted.take(5).mkString(", ")} changed " +
              "since this update staged (concurrent mutation with an " +
              "overlapping touched-bucket set); the staged rewrite read " +
              "a stale pre-image — retry the update")
        }
        // a CHECK registered while this update staged lives in
        // TableMeta, so neither the manifest window nor the schema
        // check above would catch it — re-enforce the delta against
        // the matched rows' POST-images. Runs AFTER the window/schema
        // validation: with the schema proven unchanged, a new check can
        // only reference columns this frame carries, so a clean
        // constraint error (never a raw AnalysisException about a
        // concurrently-added column) is what surfaces inside the lock.
        enforceChecks(
          raw.filter(matched).select(meta0.schema.fieldNames.toSeq
            .map(c => newVal(c).as(c)): _*),
          metaLatest.checks -- meta0.checks.keySet,
          "updateConcurrent(commit)")
        if (metaLatest.changelog && clStaging.isEmpty)
          clLate = Some(stageImages())
        if (mor)
          commitStagedMorMut(spark, f, dir, data, staging, dvStaging,
            touched, "updateConcurrent", baseLatest, metaLatest,
            preStats = Some(preStats))
        else
          commitStaged(spark, f, dir, data, staging, touched,
            "updateConcurrent", baseLatest, baseLatest.buckets, metaLatest,
            preStats = Some(preStats))
        (clStaging orElse clLate).foreach { src =>
          commitChangelogBatch(f, "updateConcurrent", src,
            nextChangelogDst(f, dir))
        }
        if (cdc && !metaLatest.changelog)
          TableMeta.write(spark, dir, metaLatest.copy(changelog = true))
      }
      nMatched
    } finally {
      f.delete(new Path(staging), true)
      f.delete(new Path(dvStaging), true)
      (clStaging.toSeq ++ clLate.toSeq).foreach(p => f.delete(p, true))
    }
  }

  /** MERGE (mixed insert/update/delete change feed) WITHOUT holding the
    * write lock for the merge job — the third face of the bucket-level
    * optimistic protocol ([[upsertConcurrent]], [[deleteConcurrent]]).
    * Same contract as [[merge]]: `deleteWhen` rows tombstone their
    * stored match (under `deleteOnlyMatched`, SQL MERGE semantics — an
    * unmatched tombstone inserts instead of no-op'ing); everything
    * else upserts with partial-column semantics. Returns (inserted,
    * updated, deleted).
    *
    * The full-outer merge, the stats job, the CDC images, and the CoW
    * rewrite all run against the snapshot-at-start OUTSIDE the lock;
    * the locked flip re-validates the same window as
    * [[upsertConcurrent]] (bucket count, schema, touched buckets'
    * file+DV sets) and commits. CoW only: the MoR decomposition's
    * position ordinals would also survive the window, but a change
    * feed large enough to want the optimistic path is usually past
    * [[MorMaxFraction]] anyway — explicit `DeleteMode` dialing stays
    * on the locked [[merge]]. N change feeds into N key ranges overlap
    * their merge work and serialize only on manifest flips. */
  def mergeConcurrent(df: DataFrame, warehouse0: String, tableName: String,
                      deleteWhen: Column,
                      schema: Option[String] = None,
                      addNewColumns: Boolean = false,
                      validate: Boolean = true,
                      changelog: Boolean = false,
                      strictUtc: Boolean = true,
                      deleteOnlyMatched: Boolean = false,
                      commitWaitMs: Long = 60000L,
                      expectedVersion: Option[Long] = None,
                      strictVersion: Boolean = false): (Long, Long, Long) = {
    val spark = df.sparkSession
    val wh = schemaDir(warehouse0, schema)
    val dir = tableDir(wh, tableName)
    if (strictUtc) {
      val naive = df.schema.fields.filter(_.dataType == TimestampNTZType)
      if (naive.nonEmpty)
        throw new StoreException(
          s"Column(s) ${naive.map(_.name).mkString(", ")} timezone must be set " +
          "(naive TimestampNTZ rejected, as in toSql strictUtc)")
    }
    if (!TableMeta.exists(spark, dir))
      throw new StoreException(
        s"mergeConcurrent target $tableName does not exist (create it with toSql first)")
    // tombstone flag FIRST (over the raw delta columns), then the same
    // identifier cleaning as merge; feed-only columns drop after
    val flagged = df.withColumn(MergeDelCol, coalesce(deleteWhen, lit(false)))
    val cleaned0 = df.columns.foldLeft(flagged) { (d, c) =>
      val cc = Names.cleanName(c)
      if (cc == c) d else d.withColumnRenamed(c, cc)
    }
    val meta0 = TableMeta.read(spark, dir)
    if (meta0.autoIndex)
      throw new StoreException(
        "Cannot upsert into a table with an automatically generated index (reference: sql.py:177)")
    val keep = cleaned0.columns.filter(c =>
      c == MergeDelCol || addNewColumns || meta0.schema.fieldNames.contains(c))
    val cleaned = cleaned0.select(keep.map(col).toIndexedSeq: _*)
    val base0 = Manifest.current(spark, dir).getOrElse {
      // legacy table: classic locked merge
      return WriteLock.withLockWait(spark, dir, "mergeConcurrent(legacy)",
        commitWaitMs) {
        upsert(cleaned, wh, tableName, addNewColumns, validate, changelog,
          tombstoned = true, deleteOnlyMatched = deleteOnlyMatched)
      }
    }
    // SQL MERGE routing guard: a partial clause shape pre-filters the
    // feed against a PINNED snapshot's key set before reaching here —
    // if the table moved past that version before this call captured
    // its own snapshot, the routing is stale and must abort (once
    // base0 == pinned, the touched-bucket window check at the flip
    // covers every later movement: feed rows route by their own PK,
    // whose bucket is by construction in the touched set)
    expectedVersion.foreach { v =>
      if (base0.version != v)
        throw new ConcurrentWriteException(
          s"mergeConcurrent into $tableName planned against snapshot $v " +
          s"but the table is now at ${base0.version} (concurrent commit " +
          "since the routing read); table unchanged — retry the merge")
    }
    val wantChangelog = changelog || meta0.changelog
    val incomingCols = cleaned.columns.toSet - MergeDelCol
    val (aligned, evolved) = align(cleaned, meta0, addNewColumns,
      passthrough = Set(MergeDelCol))
    val data = dataDir(wh, tableName)
    val newB = withBucket(aligned, meta0.pk, base0.buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = fs(spark, dir)
    try {
      val touched = validateAndTouched(newB, meta0.pk, validate)
      val oldTouched = readRawWith(spark, wh, tableName,
          meta0.copy(schema = evolved), Some(base0))
        .filter(col(BucketCol).isin(touched: _*))
      val marked = newB.withColumn("_graft_new", lit(true))
      val presentOld = col(s"o.$BucketCol").isNotNull
      val del: Column = {
        val flag = coalesce(col(s"n.$MergeDelCol"), lit(false))
        if (deleteOnlyMatched) flag && presentOld else flag
      }
      // checks see the incoming images; tombstones are deletes, exempt
      // — except an UNMATCHED tombstone under deleteOnlyMatched, which
      // is an insert candidate (same contract as [[upsert]]). ONE
      // construction, reused verbatim by the commit-time re-enforcement
      // of concurrently-added checks below — filtering out ALL
      // tombstones there would let an unmatched-tombstone INSERT bypass
      // a check registered while this merge staged.
      def checkRows: DataFrame = {
        val keepRows = newB.filter(!coalesce(col(MergeDelCol), lit(false)))
        if (!deleteOnlyMatched) keepRows
        else keepRows.unionByName(
          newB.filter(coalesce(col(MergeDelCol), lit(false)))
            .join(oldTouched.select(meta0.pk.map(col): _*),
              meta0.pk.toIndexedSeq, "left_anti"))
      }
      enforceChecks(checkRows, meta0.checks, "mergeConcurrent")
      val nonPk = evolved.fieldNames.filterNot(meta0.pk.contains)
      val out = oldTouched.as("o")
        .join(marked.as("n"), meta0.pk.toIndexedSeq, "full_outer")
        .filter(!del)
        .select(meta0.pk.map(col) ++ nonPk.map { c =>
          val merged =
            if (incomingCols.contains(c))
              when(col("n._graft_new").isNotNull, col(s"n.$c"))
                .otherwise(col(s"o.$c"))
            else col(s"o.$c")
          merged.as(c)
        } :+ coalesce(col(s"n.$BucketCol"), col(s"o.$BucketCol"))
          .as(BucketCol): _*)
      def stageImages(): Path = {
        val valueCols = incomingCols.toSeq
          .filterNot(meta0.pk.contains).filter(nonPk.contains).sorted
        val changedCond = valueCols
          .map(c => !(col(s"n.$c") <=> col(s"o.$c")))
          .reduceOption(_ || _).getOrElse(lit(false))
        val images = nonPk.toSeq.flatMap { c =>
          val post =
            if (incomingCols.contains(c)) col(s"n.$c") else col(s"o.$c")
          Seq(col(s"o.$c").as(s"old_$c"),
            when(del, lit(null)).otherwise(post).as(s"new_$c"))
        }
        val changes = marked.as("n")
          .join(oldTouched.as("o"), meta0.pk.toIndexedSeq, "left")
          // a tombstone for an ABSENT key changed nothing — no log row
          .filter(!(del && !presentOld))
          .select(meta0.pk.map(col) ++ (
            when(del, lit("delete"))
              .when(!presentOld, lit("insert"))
              .when(changedCond, lit("update"))
              .otherwise(lit("unchanged")).as("op") +: images): _*)
        val p = new Path(dir, s".staging-changelog-${UUID.randomUUID()}")
        changes.write.parquet(p.toString)
        p
      }
      val clStaging: Option[Path] =
        if (wantChangelog) Some(stageImages()) else None
      var clLate: Option[Path] = None
      // merge reports what it did (one delta-sized job)
      val stats: (Long, Long, Long) = {
        val r = marked.as("n")
          .join(oldTouched.as("o"), meta0.pk.toIndexedSeq, "left")
          .agg(
            coalesce(sum(when(!del && !presentOld, 1L).otherwise(0L)), lit(0L)),
            coalesce(sum(when(!del && presentOld, 1L).otherwise(0L)), lit(0L)),
            coalesce(sum(when(del && presentOld, 1L).otherwise(0L)), lit(0L)))
          .head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val staging = s"$dir/.staging-mergec-${UUID.randomUUID()}"
      try {
        // the expensive merge job — OUTSIDE the lock
        toPhys(clusterByBucket(out, base0.buckets, meta0.pk), meta0)
          .write.partitionBy(BucketCol).parquet(staging)
        val preStats = stageFileStats(spark, f, staging,
          statColsTypedOf(meta0))
        MergeConcurrentHooks.betweenPhases()

        // ---------------- LOCKED: re-validate, commit ----------------
        WriteLock.withLockWait(spark, dir, "mergeConcurrent(commit)",
            commitWaitMs) {
          val metaLatest = TableMeta.read(spark, dir)
          val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
          // strictVersion: ANY movement aborts (the locked path's
          // contract) — for shapes whose semantics read the WHOLE
          // snapshot (SQL `WHEN NOT MATCHED BY SOURCE` sync), where the
          // touched-bucket window alone would let a concurrent insert
          // into an untouched bucket survive a full-table sync
          // (write-serializable, Delta's WriteSerializable anomaly)
          if (strictVersion && baseLatest.version != base0.version)
            throw new ConcurrentWriteException(
              s"table moved ${base0.version} -> ${baseLatest.version} " +
              "while this merge staged and strict version enforcement is " +
              "on (full-snapshot-sync merge); retry the merge")
          if (baseLatest.buckets != base0.buckets)
            throw new ConcurrentWriteException(
              s"bucket count changed ${base0.buckets} -> " +
              s"${baseLatest.buckets} (concurrent rebucket); staged files " +
              "use the old layout — retry the merge")
          val mergedSchema = mergeEvolved(evolved, meta0, metaLatest)
          if (baseLatest.version != base0.version) {
            def window(m: Manifest, b: Int): (Set[String], Set[String]) =
              (m.files.getOrElse(b, Nil).map(_.name).toSet,
                m.dvs.getOrElse(b, Nil).map(_.name).toSet)
            val dirty = touched
              .filter(b => window(base0, b) != window(baseLatest, b))
            if (dirty.nonEmpty)
              throw new ConcurrentWriteException(
                s"bucket(s) ${dirty.sorted.take(5).mkString(", ")} changed " +
                "since this merge staged (concurrent mutation with an " +
                "overlapping touched-bucket set); the staged merge read a " +
                "stale pre-image — retry the merge")
          }
          // re-enforce checks added while this merge staged, AFTER the
          // window validation. Merge legally evolves schema, so a new
          // check may reference a column this feed does not carry —
          // that surfaces as a clean conflict (retry re-stages against
          // the evolved schema), never a raw AnalysisException.
          try enforceChecks(checkRows,
            metaLatest.checks -- meta0.checks.keySet,
            "mergeConcurrent(commit)")
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new ConcurrentWriteException(
                "a CHECK constraint added while this merge staged " +
                "references column(s) this merge's frame does not carry " +
                s"(concurrent schema change): ${e.getMessage}; retry the " +
                "merge")
          }
          if (metaLatest.changelog && clStaging.isEmpty)
            clLate = Some(stageImages())
          // removeMissing: a touched bucket whose rows ALL tombstoned
          // has no staged replacement and leaves the snapshot
          commitStaged(spark, f, dir, data, staging, touched,
            "mergeConcurrent", baseLatest, baseLatest.buckets,
            metaLatest.copy(schema = mergedSchema), removeMissing = true,
            preStats = Some(preStats))
          (clStaging orElse clLate).foreach { src =>
            commitChangelogBatch(f, "mergeConcurrent", src,
              nextChangelogDst(f, dir))
          }
          val metaFinal = metaLatest.copy(schema = mergedSchema,
            changelog = wantChangelog || metaLatest.changelog)
          if (metaFinal != metaLatest) TableMeta.write(spark, dir, metaFinal)
        }
        stats
      } finally {
        f.delete(new Path(staging), true)
        (clStaging.toSeq ++ clLate.toSeq).foreach(p => f.delete(p, true))
      }
    } finally newB.unpersist()
  }

  /** Predicate delete WITHOUT holding the write lock for the rewrite —
    * [[upsertConcurrent]]'s bucket-level optimistic protocol applied
    * to [[delete]]: the matched-bucket probe, the CoW survivor rewrite
    * (or the MoR delete-vector staging — [[DeleteMode]].Auto decides
    * from the same manifest arithmetic), and the CDC delete images all
    * run against the snapshot-at-start OUTSIDE the lock; a brief
    * locked flip re-validates and commits. Abort-and-retry
    * ([[ConcurrentWriteException]], table unchanged, staging cleaned)
    * when the manifest window shows a rebucket, ANY schema change (a
    * full-bucket rewrite staged under the old schema must not publish
    * over a new one), or a TOUCHED bucket whose file/delete-vector set
    * changed — the staged survivors (or staged positions: MoR DV
    * ordinals are only valid against the exact files they indexed)
    * read a pre-image that is no longer the truth. Disjoint-bucket
    * deletes and upserts interleave freely: a GDPR erasure sweep
    * partitioned by key range runs N jobs that serialize only on
    * manifest flips. Returns the number of deleted rows. */
  def deleteConcurrent(spark: SparkSession, warehouse0: String,
                       tableName: String, where: Column,
                       schema: Option[String] = None,
                       changelog: Boolean = false,
                       mode: DeleteMode = DeleteMode.Auto,
                       commitWaitMs: Long = 60000L): Long = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (!TableMeta.exists(spark, dir))
      throw new StoreException(
        s"deleteConcurrent: table $tableName does not exist")
    val meta0 = TableMeta.read(spark, dir)
    val base0 = Manifest.current(spark, dir).getOrElse {
      // legacy table: no snapshot to window against — classic locked
      // delete (which adopts a manifest, so the NEXT call is optimistic)
      return WriteLock.withLockWait(spark, dir, "deleteConcurrent(legacy)",
        commitWaitMs) {
        delete(spark, warehouse0, tableName, where, schema, changelog, mode)
      }
    }
    val cdc = changelog || meta0.changelog
    val data = dataDir(warehouse, tableName)
    val raw = readRawWith(spark, warehouse, tableName, meta0, Some(base0))
    val probe = raw.filter(where).groupBy(col(BucketCol))
      .agg(count(lit(1)).as("n")).collect()
    val touched = probe.map(_.getInt(0)).toSeq
    val deleted = probe.map(_.getLong(1)).sum
    if (touched.isEmpty) {
      // parity with [[delete]]: an explicit changelog request on a
      // no-match delete still arms table-property CDC for later writers
      if (cdc && !meta0.changelog)
        WriteLock.withLockWait(spark, dir, "deleteConcurrent(cdc-flag)",
            commitWaitMs) {
          val m = TableMeta.read(spark, dir)
          if (!m.changelog) TableMeta.write(spark, dir, m.copy(changelog = true))
        }
      return 0L
    }
    val f = fs(spark, dir)
    val mor = morDecision(Some(base0), mode, touched, deleted,
      "delete", tableName)
    // CDC delete images against the snapshot-at-start pre-image —
    // valid at commit BECAUSE the window check proves that pre-image
    // is still the live truth
    def stageImages(): Path = {
      val nonPk = meta0.schema.fieldNames.filterNot(meta0.pk.contains)
      val images = nonPk.toSeq.flatMap { c =>
        Seq(col(c).as(s"old_$c"),
          lit(null).cast(meta0.schema(c).dataType).as(s"new_$c"))
      }
      val changes = raw.filter(where)
        .select(meta0.pk.map(col) ++ (lit("delete").as("op") +: images): _*)
      val p = new Path(dir, s".staging-changelog-${UUID.randomUUID()}")
      changes.write.parquet(p.toString)
      p
    }
    val clStaging: Option[Path] = if (cdc) Some(stageImages()) else None
    var clLate: Option[Path] = None
    val staging = s"$dir/.staging-deletec-${UUID.randomUUID()}"
    try {
      // the expensive rewrite/position job — OUTSIDE the lock
      if (mor) {
        readRawPos(spark, warehouse, tableName, meta0, Some(base0),
            withPos = true)
          .filter(coalesce(where, lit(false)))
          .select(col(BucketCol), col(FileCol).as("file"),
            col(PosCol).as("pos"))
          .repartition(touched.size, col(BucketCol))
          .sortWithinPartitions(col(BucketCol), col("file"), col("pos"))
          .write.partitionBy(BucketCol).parquet(staging)
      } else {
        toPhys(raw.filter(col(BucketCol).isin(touched: _*))
          .filter(!coalesce(where, lit(false)))
          .repartition(touched.size, col(BucketCol))
          .sortWithinPartitions((BucketCol +: meta0.pk).map(col): _*),
          meta0)
          .write.partitionBy(BucketCol).parquet(staging)
      }
      val preStats =
        if (mor) Map.empty[(Int, String), FileFooter]
        else stageFileStats(spark, f, staging, statColsTypedOf(meta0))
      DeleteConcurrentHooks.betweenPhases()

      // ---------------- LOCKED: re-validate, commit ----------------
      WriteLock.withLockWait(spark, dir, "deleteConcurrent(commit)",
          commitWaitMs) {
        val metaLatest = TableMeta.read(spark, dir)
        val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
        if (baseLatest.buckets != base0.buckets)
          throw new ConcurrentWriteException(
            s"bucket count changed ${base0.buckets} -> " +
            s"${baseLatest.buckets} (concurrent rebucket); staged files " +
            "use the old layout — retry the delete")
        if (metaLatest.schema != meta0.schema)
          throw new ConcurrentWriteException(
            "table schema changed while this delete staged (the CoW " +
            "rewrite republished whole buckets under the old schema); " +
            "retry the delete")
        def window(m: Manifest, b: Int): (Set[String], Set[String]) =
          (m.files.getOrElse(b, Nil).map(_.name).toSet,
            m.dvs.getOrElse(b, Nil).map(_.name).toSet)
        if (baseLatest.version != base0.version) {
          val dirty = touched
            .filter(b => window(base0, b) != window(baseLatest, b))
          if (dirty.nonEmpty)
            throw new ConcurrentWriteException(
              s"bucket(s) ${dirty.sorted.take(5).mkString(", ")} changed " +
              "since this delete staged (concurrent mutation with an " +
              "overlapping touched-bucket set); the staged rewrite read " +
              "a stale pre-image — retry the delete")
        }
        if (metaLatest.changelog && clStaging.isEmpty)
          clLate = Some(stageImages())
        if (mor)
          commitStagedDvs(spark, f, dir, data, staging, touched, baseLatest,
            op = "deleteConcurrent")
        else
          commitStaged(spark, f, dir, data, staging, touched,
            "deleteConcurrent", baseLatest, baseLatest.buckets, metaLatest,
            removeMissing = true, preStats = Some(preStats))
        (clStaging orElse clLate).foreach { src =>
          commitChangelogBatch(f, "deleteConcurrent", src,
            nextChangelogDst(f, dir))
        }
        if (cdc && !metaLatest.changelog)
          TableMeta.write(spark, dir, metaLatest.copy(changelog = true))
      }
      deleted
    } finally {
      f.delete(new Path(staging), true)
      (clStaging.toSeq ++ clLate.toSeq).foreach(p => f.delete(p, true))
    }
  }

  /** Change-data-capture: with `changelog = true` an upsert also writes,
    * per incoming row, one (pk…, op, old_<c>…, new_<c>…) record —
    * op ∈ insert (key absent before) / update (key present, some
    * INCOMING column's value changed, null-safe) / unchanged — plus,
    * for every non-PK column `c` of the (evolved) table schema, the
    * pre-image value `old_<c>` (NULL for inserts) and the post-image
    * value `new_<c>` (the merged result: incoming value when `c` was
    * present in the delta, stored value otherwise). The before/after
    * images are what make the log CONSUMABLE: an incremental aggregate
    * applies `f(new) − f(old)` per changed row without ever reading the
    * table (see [[graft.operators.CdcConsumer]]).
    *
    * Commit protocol: the batch is MATERIALIZED to a `.staging-changelog-*`
    * dir before the bucket swap (the classification must join the
    * pre-image while it still exists) but only RENAMED into
    * `_changelog/batch=<n>` after the swap commits — a failed upsert
    * leaves no committed-looking batch recording changes that never
    * landed. Batch numbers are monotonic under the write lock;
    * [[readChangelog]] reads them back with the batch column.
    * Cost: one extra join of the delta against the touched buckets —
    * proportional to the delta, never the table. Downstream incremental
    * pipelines (index maintenance, cache invalidation, derived-table
    * refresh) consume the log instead of diffing 100 TB snapshots. */
  /** Marker column carried through a merge's delta: TRUE = this key's
    * stored row is tombstoned (deleted if present, ignored if absent). */
  private val MergeDelCol = "_graft_merge_del"

  /** `tombstoned = true` (the [[merge]] path): `df` carries
    * [[MergeDelCol]]; marked rows DELETE their stored match instead of
    * upserting. Returns (inserted, updated, deleted) — computed only on
    * the merge path (one extra delta-sized job); (0,0,0) otherwise. */
  /** `deleteOnlyMatched` (merge path only): SQL MERGE semantics for
    * tombstones — a WHEN MATCHED DELETE can only ever apply to MATCHED
    * rows, so an unmatched tombstone row is an ordinary insert
    * candidate (it reached this commit because an INSERT clause
    * selected it). The default (false) keeps the programmatic change-
    * feed contract: an unmatched tombstone is a no-op. */
  private def upsert(df: DataFrame, warehouse: String, table: String,
                     addNewColumns: Boolean, validate: Boolean,
                     changelog0: Boolean = false,
                     tombstoned: Boolean = false,
                     deleteOnlyMatched: Boolean = false,
                     mode: DeleteMode = DeleteMode.CopyOnWrite): (Long, Long, Long) = {
    val spark = df.sparkSession
    val dir = tableDir(warehouse, table)
    val meta = TableMeta.read(spark, dir)
    // table-property semantics: once ANY mutation has captured CDC the
    // meta flag is set and every later mutation captures it too — a
    // consumer folding the log never misses a write that forgot the flag
    val changelog = changelog0 || meta.changelog
    if (meta.autoIndex)
      throw new StoreException(
        "Cannot upsert into a table with an automatically generated index (reference: sql.py:177)")

    // Reference upsert overwrites ONLY the columns present in the
    // incoming frame (including with NULLs/NaNs); columns absent from it
    // keep their stored values (sql.py:299 "overwrites ALL VALUES that
    // are present in source DataFrame"; tests/test_sql.py:533
    // test_upsert_individual_values2 upserts a single column).
    val incomingCols = df.columns.toSet - MergeDelCol
    val (aligned, evolved) = align(df, meta, addNewColumns,
      passthrough = if (tombstoned) Set(MergeDelCol) else Set.empty)

    val data = dataDir(warehouse, table)
    val base = snapshotForWrite(spark, dir, data, meta)
    val newB = withBucket(aligned, meta.pk, base.buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // validate off the cache — one computation of the delta pipeline;
      // the same fused job returns the touched buckets (only those are
      // read or rewritten)
      val touched = validateAndTouched(newB, meta.pk, validate)
      // read with the evolved schema: old files yield NULL for new columns
      val oldTouched = readRawWith(spark, warehouse, table,
          meta.copy(schema = evolved), manifestOf(base))
        .filter(col(BucketCol).isin(touched: _*))
      // checks see the incoming images; merge tombstones are DELETES,
      // exempt by construction (they remove rows, not write them) —
      // except under deleteOnlyMatched, where an UNMATCHED tombstone is
      // an insert candidate and must pass like any other written row
      enforceChecks(
        if (!tombstoned) newB
        else {
          val keep = newB.filter(!coalesce(col(MergeDelCol), lit(false)))
          if (!deleteOnlyMatched) keep
          else keep.unionByName(
            newB.filter(coalesce(col(MergeDelCol), lit(false)))
              .join(oldTouched.select(meta.pk.map(col): _*),
                meta.pk.toIndexedSeq, "left_anti"))
        },
        meta.checks, if (tombstoned) "merge" else "upsert")
      // One full-outer merge per touched bucket: survivors keep old rows,
      // matches take incoming values for incoming columns (old otherwise),
      // inserts take incoming values; merge's tombstoned matches drop
      // out. Single shuffle, no union.
      val marked = newB.withColumn("_graft_new", lit(true))
      // the target row exists (both join shapes below alias it "o")
      val presentOld = col(s"o.$BucketCol").isNotNull
      // incoming row is a tombstone (merge path; never-true otherwise);
      // under deleteOnlyMatched a tombstone acts only on a MATCHED key —
      // unmatched it degrades to an ordinary insert (SQL MERGE clauses)
      val del: Column = {
        val flag =
          if (tombstoned) coalesce(col(s"n.$MergeDelCol"), lit(false))
          else lit(false)
        if (deleteOnlyMatched) flag && presentOld else flag
      }
      val nonPk = evolved.fieldNames.filterNot(meta.pk.contains)
      val out = oldTouched.as("o")
        .join(marked.as("n"), meta.pk.toIndexedSeq, "full_outer")
        .filter(!del)
        .select(meta.pk.map(col) ++ nonPk.map { c =>
          val merged =
            if (incomingCols.contains(c))
              when(col("n._graft_new").isNotNull, col(s"n.$c")).otherwise(col(s"o.$c"))
            else col(s"o.$c")
          merged.as(c)
        } :+ coalesce(col(s"n.$BucketCol"), col(s"o.$BucketCol")).as(BucketCol): _*)

      // Changelog batch: materialized to staging BEFORE the swap (the
      // classification join needs the pre-image), committed by rename
      // only AFTER the swap — an upsert that fails mid-commit leaves no
      // batch directory claiming changes that never landed. The staging
      // job itself is INDEPENDENT of the data staging write (both read
      // the live snapshot + the cached delta), so the two writes run
      // concurrently below (guide §2.6).
      def stageChangelog(): Option[(Path, Path)] = if (!changelog) None else {
        val valueCols = incomingCols.toSeq.filterNot(meta.pk.contains).sorted
        val changedCond = valueCols
          .map(c => !(col(s"n.$c") <=> col(s"o.$c")))
          .reduceOption(_ || _).getOrElse(lit(false))
        val images = nonPk.toSeq.flatMap { c =>
          val post = if (incomingCols.contains(c)) col(s"n.$c") else col(s"o.$c")
          // a tombstoned match is a delete: post-image NULL
          Seq(col(s"o.$c").as(s"old_$c"),
            when(del, lit(null)).otherwise(post).as(s"new_$c"))
        }
        val changes = marked.as("n")
          .join(oldTouched.as("o"), meta.pk.toIndexedSeq, "left")
          // a tombstone for an ABSENT key changed nothing — no log row
          .filter(!(del && !presentOld))
          .select(meta.pk.map(col) ++ (
            when(del, lit("delete"))
              .when(!presentOld, lit("insert"))
              .when(changedCond, lit("update"))
              .otherwise(lit("unchanged")).as("op") +: images): _*)
        Some(stageChangelogBatch(spark, dir, changes))
      }

      // merge reports what it did. A DEDICATED delta-sized join job is
      // paid only when the Auto merge-on-read decision needs the
      // matched count BEFORE the write path is chosen; under an
      // explicit mode the same three counters ride the staging write
      // as observe() metrics — one fewer join of the touched buckets.
      val newRow = col("n._graft_new").isNotNull
      val statsEarly: Option[(Long, Long, Long)] =
        if (tombstoned && mode == DeleteMode.Auto && manifestOf(base).isDefined) {
          val r = marked.as("n")
            .join(oldTouched.as("o"), meta.pk.toIndexedSeq, "left")
            .agg(
              coalesce(sum(when(!del && !presentOld, 1L).otherwise(0L)), lit(0L)),
              coalesce(sum(when(!del && presentOld, 1L).otherwise(0L)), lit(0L)),
              coalesce(sum(when(del && presentOld, 1L).otherwise(0L)), lit(0L)))
            .head()
          Some((r.getLong(0), r.getLong(1), r.getLong(2)))
        } else None
      val statsObs: Option[org.apache.spark.sql.Observation] =
        if (tombstoned && statsEarly.isEmpty)
          Some(org.apache.spark.sql.Observation())
        else None
      def observeStats(j: DataFrame): DataFrame = statsObs match {
        case None => j
        case Some(ob) => j.observe(ob,
          coalesce(sum(when(newRow && !del && !presentOld, 1L).otherwise(0L)), lit(0L)).as("ins"),
          coalesce(sum(when(newRow && !del && presentOld, 1L).otherwise(0L)), lit(0L)).as("upd"),
          coalesce(sum(when(del && presentOld, 1L).otherwise(0L)), lit(0L)).as("del"))
      }

      // merge-on-read eligibility (merge path only): the matched rows
      // — updates and tombstones — decompose into position deletes +
      // a delta-sized appended file; inserts are additive anyway. The
      // shared Auto arithmetic compares |updated + deleted| against
      // the touched buckets' live rows.
      val mor = tombstoned && morDecision(manifestOf(base), mode, touched,
        statsEarly.map(s => s._2 + s._3).getOrElse(0L), "merge", table)

      // Commit: write to staging, move the staged files in, flip the
      // manifest — one atomic snapshot publish; readers of the
      // previous snapshot are undisturbed.
      val f = fs(spark, dir)
      var clCommit: Option[(Path, Path)] = None
      try {
        if (mor) {
          // delta-driven: one LEFT join of the (delta-sized) change
          // feed against the touched buckets' position-exposing read —
          // every matched old row's position tombstones; every
          // surviving delta row (update post-image or insert) lands in
          // a NEW file of its bucket. Untouched rows never move.
          // The join output is delta-sized — persisted, so the DV and
          // post-image writes both consume ONE compute of it instead
          // of re-running the join per write (§5 reuse).
          val oldPos = readRawPos(spark, warehouse, table,
              meta.copy(schema = evolved), manifestOf(base), withPos = true)
            .filter(col(BucketCol).isin(touched: _*))
          val j = marked.as("n")
            .join(oldPos.as("o"), meta.pk.toIndexedSeq, "left")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val dvStaging = s"$dir/.staging-merge-dv-${UUID.randomUUID()}"
          val dataStaging = s"$dir/.staging-merge-${UUID.randomUUID()}"
          try {
            inParallel(
              { clCommit = stageChangelog() },
              {
                observeStats(j).filter(presentOld)
                  .select(col(s"o.$BucketCol").as(BucketCol),
                    col(s"o.$FileCol").as("file"), col(s"o.$PosCol").as("pos"))
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions(col(BucketCol), col("file"), col("pos"))
                  .write.partitionBy(BucketCol).parquet(dvStaging)
                toPhys(j.filter(!del)
                  .select(meta.pk.map(col) ++ nonPk.toSeq.map { c =>
                    (if (incomingCols.contains(c)) col(s"n.$c")
                     else col(s"o.$c")).as(c)
                  } :+ col(s"n.$BucketCol").as(BucketCol): _*)
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions((BucketCol +: meta.pk).map(col): _*),
                  meta)
                  .write.partitionBy(BucketCol).parquet(dataStaging)
              })
            commitStagedMorMut(spark, f, dir, data, dataStaging,
              dvStaging, touched, "upsert", base, meta)
          } finally {
            j.unpersist()
            f.delete(new Path(dvStaging), true)
            f.delete(new Path(dataStaging), true)
          }
        } else {
          val outObs =
            if (statsObs.isEmpty) out
            else {
              // same projection/filter as `out`, with the observe node
              // between the join and the tombstone filter so all three
              // counters see every joined row
              val joined = observeStats(
                oldTouched.as("o").join(marked.as("n"), meta.pk.toIndexedSeq, "full_outer"))
              joined.filter(!del)
                .select(meta.pk.map(col) ++ nonPk.map { c =>
                  val merged =
                    if (incomingCols.contains(c))
                      when(col("n._graft_new").isNotNull, col(s"n.$c")).otherwise(col(s"o.$c"))
                    else col(s"o.$c")
                  merged.as(c)
                } :+ coalesce(col(s"n.$BucketCol"), col(s"o.$BucketCol")).as(BucketCol): _*)
            }
          val staging = s"$dir/.staging-${UUID.randomUUID()}"
          try {
            inParallel(
              { clCommit = stageChangelog() },
              toPhys(clusterByBucket(outObs, base.buckets, meta.pk), meta)
                .write.partitionBy(BucketCol).mode(SaveMode.Overwrite).parquet(staging))
            // removeMissing on the merge path: a touched bucket whose rows
            // ALL tombstoned has no staged replacement and leaves the
            // snapshot (the delete semantics); plain upserts always stage
            // every touched bucket
            commitStaged(spark, f, dir, data, staging, touched, "upsert",
              base, base.buckets, meta, removeMissing = tombstoned)
          } finally f.delete(new Path(staging), true)
        }
        // data swap done — the changelog batch may now claim it happened
        clCommit.foreach { case (src, dst) =>
          commitChangelogBatch(f, "upsert", src, dst)
        }
      } finally
        // no-op when the rename above committed it; removes the phantom
        // batch when the staging write or the swap threw
        clCommit.foreach { case (src, _) => f.delete(src, true) }
      val meta2 = meta.copy(schema = evolved, changelog = changelog)
      if (meta2 != meta) TableMeta.write(spark, dir, meta2)
      val stats: (Long, Long, Long) =
        if (!tombstoned) (0L, 0L, 0L)
        else statsEarly.getOrElse {
          val m = statsObs.get.get
          (m("ins").asInstanceOf[Long], m("upd").asInstanceOf[Long],
            m("del").asInstanceOf[Long])
        }
      stats
    } finally newB.unpersist()
  }

  /** Compact buckets that have accumulated many small files (each
    * append adds one file per touched bucket — the small-files problem
    * at 100 TB). Buckets with at least `minFiles` parquet files are
    * rewritten to a single file via staging + per-bucket swap (same
    * commit protocol as upsert, so readers never see a half state);
    * buckets below the threshold are untouched. Returns the number of
    * buckets compacted. */
  /** Per-bucket layout health from FOOTER metadata only — (bucket,
    * n_files, n_rows, n_row_groups, bytes): the report that drives
    * compaction policy ("which buckets accumulated small files from
    * appends", "is the row-group geometry still scan-friendly") as an
    * O(files) driver metadata pass with zero data bytes read — the
    * same listing discipline as the scan (bucket dirs only, *.parquet
    * only), so the numbers describe exactly what a query would read.
    * Missing buckets report a zero row so the frame always has
    * `meta.buckets` rows. */
  def bucketStats(spark: SparkSession, warehouse0: String, tableName: String,
                  schema: Option[String] = None): DataFrame = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    val rows = bucketHealthRows(spark, dir, dataDir(warehouse, tableName))
      .map { case (b, nf, nr, ng, bytes, _, _) => (b, nf, nr, ng, bytes) }
    import spark.implicits._
    rows.toDF("bucket", "n_files", "n_rows", "n_row_groups", "bytes")
  }

  /** The bucket-health numbers behind [[bucketStats]] AND the
    * `t$buckets` metadata table — one tuple per bucket:
    * (bucket, n_files, n_rows, n_row_groups, bytes, dv_files, dv_rows).
    * `n_rows` counts DATA-file rows (live rows = n_rows − dv_rows;
    * both are surfaced so a dashboard can compute either). Manifest
    * n_files/bytes/dv arithmetic is zero-IO; row/row-group geometry
    * reads exactly the LIVE files' footers on the driver stats pool —
    * never superseded files awaiting vacuum, never data bytes. */
  private[store] def bucketHealthRows(spark: SparkSession, dir: String,
                                      data0: String)
      : Seq[(Int, Long, Long, Long, Long, Long, Long)] = {
    val meta = TableMeta.read(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val data = new Path(data0)
    val f = fs(spark, dir)
    def footersOf(ps: Seq[Path]): (Long, Long) = { // (rows, rowGroups)
      import scala.jdk.CollectionConverters._
      val tasks = ps.map { p =>
        new java.util.concurrent.Callable[(Long, Long)] {
          override def call() = {
            val in =
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
            val reader =
              org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try {
              val blocks = reader.getFooter.getBlocks
              var rows = 0L
              blocks.forEach(bl => rows += bl.getRowCount)
              (rows, blocks.size().toLong)
            } finally reader.close()
          }
        }
      }
      statsPool.invokeAll(tasks.asJava).asScala.map(_.get())
        .foldLeft((0L, 0L)) { case ((r, g), (r2, g2)) => (r + r2, g + g2) }
    }
    val mf = Manifest.current(spark, dir)
    val (nBuckets, byBucket)
        : (Int, Map[Int, (Long, Long, Long, Long, Long, Long)]) =
      mf match {
        case Some(m) =>
          // n_files/bytes/DV arithmetic straight from the snapshot
          // (zero listings); row-group geometry from pooled footer reads
          (m.buckets, m.files.map { case (b, fls) =>
            val (rows, groups) = footersOf(
              fls.map(mfF => new Path(data, s"$BucketCol=$b/${mfF.name}")))
            val dvl = if (fls.isEmpty) Nil else m.dvs.getOrElse(b, Nil)
            b -> ((fls.size.toLong, rows, groups, fls.map(_.len).sum,
              dvl.size.toLong, dvl.flatMap(_.rows).sum))
          })
        case None =>
          (meta.buckets,
            if (!f.exists(data))
              Map.empty[Int, (Long, Long, Long, Long, Long, Long)]
            else f.listStatus(data)
              .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
              .map { d =>
                val b = d.getPath.getName.stripPrefix(s"$BucketCol=").toInt
                val files = f.listStatus(d.getPath)
                  .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
                val (rows, groups) = footersOf(files.toSeq.map(_.getPath))
                b -> ((files.length.toLong, rows, groups,
                  files.map(_.getLen).sum, 0L, 0L))
              }.toMap)
      }
    (0 until nBuckets).map { b =>
      val (nf, nr, ng, bytes, dvf, dvr) =
        byBucket.getOrElse(b, (0L, 0L, 0L, 0L, 0L, 0L))
      (b, nf, nr, ng, bytes, dvf, dvr)
    }
  }

  /** Test-only interleave seam for [[vacuum]]: invoked between the
    * UNLOCKED liveness pre-walk and the locked reap, so a spec can
    * land a commit / tag deterministically inside the window the
    * locked delta re-protection must cover. A no-op in production. */
  private[store] object VacuumHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** Test-only interleave seam for the OPTIMISTIC maintenance paths
    * (compact / compactIfNeeded / zorderCompact / rebucket), invoked
    * between the unlocked rewrite and the locked flip — a spec lands an
    * interfering mutation deterministically inside the window the
    * conflict check must catch (or, for a disjoint-bucket writer, must
    * NOT catch). A no-op in production. */
  private[store] object MaintenanceHooks {
    @volatile var betweenPhases: () => Unit = () => ()
  }

  /** Retry driver for optimistic LAYOUT MAINTENANCE: a layout rewrite
    * has no logical change, so on a window conflict it is always the
    * MAINTENANCE job that re-stages against the fresh snapshot —
    * ingest writers never wait behind it and never abort for it (the
    * inversion of the old full-lock design, where a nightly Z-order
    * was an hours-long writer outage at 100 TB). Bounded attempts: a
    * table too hot for maintenance to ever win surfaces loudly
    * instead of spinning. */
  private def retryMaintenance[A](op: String, maxAttempts: Int = 5)
                                 (body: => A): A = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: ConcurrentWriteException =>
          if (attempt >= maxAttempts)
            throw new ConcurrentWriteException(
              s"$op: gave up after $maxAttempts attempts, each aborted " +
              s"by a concurrent writer (last: ${e.getMessage}); the " +
              "table is unchanged — rerun when write traffic quiets")
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bounded statement-level AUTO-RETRY for SQL DML lowered onto the
    * optimistic verbs (`commit_mode=optimistic`): a window conflict
    * aborts an attempt with [[ConcurrentWriteException]], which a
    * programmatic caller handles in its own loop — but a
    * Spark-SQL-only orchestrator would see a statement failure Delta
    * would have absorbed, converting the multi-writer win back into
    * orchestrator-side retry boilerplate. Each attempt re-runs the
    * WHOLE lowering body (MERGE re-pins its routing snapshot, the
    * rewrite re-stages against the fresh table), so retrying is always
    * correct: the failed attempt committed nothing. Bounded by
    * [[SqlMaxRetriesConf]] — a statement that cannot win against
    * sustained write traffic surfaces loudly, naming the dial. */
  val SqlMaxRetriesConf = "spark.graft.sql.maxRetries"
  val SqlMaxRetriesDefault = 5

  private[graft] def retryOptimisticSql[A](spark: SparkSession,
                                           op: String)(body: => A): A = {
    val raw = spark.conf.get(SqlMaxRetriesConf,
      SqlMaxRetriesDefault.toString)
    val max = raw.trim.toIntOption.filter(_ >= 1).getOrElse(
      throw new StoreException(
        s"$SqlMaxRetriesConf must be a positive integer, got '$raw'"))
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: ConcurrentWriteException =>
          if (attempt >= max)
            throw new ConcurrentWriteException(
              s"$op: gave up after $max attempts, each aborted by a " +
              s"concurrent writer (last: ${e.getMessage}); the statement " +
              s"committed nothing — raise $SqlMaxRetriesConf or rerun " +
              "when write traffic quiets")
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The locked-flip conflict rules every optimistic maintenance
    * rewrite shares ([[ConcurrentWriteException]] → the RETRY loop in
    * [[retryMaintenance]] re-stages; the table is never corrupted and
    * ingest never aborts):
    *  - bucket count changed (a rebucket won the race — staged files
    *    use the old layout);
    *  - ANY schema change (the rewrite republished whole buckets under
    *    the old schema);
    *  - a TOUCHED bucket whose live file or delete-vector set moved
    *    since the start snapshot (the staged rewrite read — and its
    *    commit would drop the DVs of — a pre-image that is no longer
    *    the truth). Buckets OUTSIDE the touched set carry over
    *    untouched, so disjoint-bucket ingest and maintenance both
    *    commit. */
  private def maintenanceWindowCheck(base0: Manifest, baseLatest: Manifest,
                                     meta0: TableMeta, metaLatest: TableMeta,
                                     touched: Seq[Int], op: String): Unit = {
    if (baseLatest.buckets != base0.buckets)
      throw new ConcurrentWriteException(
        s"bucket count changed ${base0.buckets} -> ${baseLatest.buckets} " +
        s"(concurrent rebucket); $op staged files under the old layout — " +
        "re-staging")
    if (metaLatest.schema != meta0.schema)
      throw new ConcurrentWriteException(
        s"table schema changed while $op staged (the rewrite republished " +
        "whole buckets under the old schema) — re-staging")
    if (baseLatest.version != base0.version) {
      def window(m: Manifest, b: Int): (Set[String], Set[String]) =
        (m.files.getOrElse(b, Nil).map(_.name).toSet,
          m.dvs.getOrElse(b, Nil).map(_.name).toSet)
      val dirty = touched
        .filter(b => window(base0, b) != window(baseLatest, b))
      if (dirty.nonEmpty)
        throw new ConcurrentWriteException(
          s"bucket(s) ${dirty.sorted.take(5).mkString(", ")} changed " +
          s"since $op staged (concurrent mutation with an overlapping " +
          "touched-bucket set) — re-staging")
    }
  }

  def compact(spark: SparkSession, warehouse0: String, tableName: String,
              minFiles: Int = 4, schema: Option[String] = None,
              commitWaitMs: Long = 60000L): Int = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (Manifest.current(spark, dir).isEmpty)
      // legacy table: no snapshot to window against — classic locked
      // compact (which adopts a manifest, so the NEXT call is optimistic)
      WriteLock.withLock(spark, dir, "compact") {
        val meta = TableMeta.read(spark, dir)
        val base = snapshotForWrite(spark, dir, dataDir(warehouse, tableName), meta)
        val crowded = (0 until base.buckets).filter(b =>
          base.files.getOrElse(b, Nil).size >= minFiles)
        compactBuckets(spark, warehouse, tableName, dir, meta, base, crowded)
      }
    else retryMaintenance("compact") {
      val meta0 = TableMeta.read(spark, dir)
      val base0 = Manifest.current(spark, dir).get
      val crowded = (0 until base0.buckets).filter(b =>
        base0.files.getOrElse(b, Nil).size >= minFiles)
      compactBucketsConcurrent(spark, warehouse, tableName, dir, meta0,
        base0, crowded, commitWaitMs)
    }
  }

  /** Rewrite exactly `crowded` buckets to one file each via staging +
    * per-bucket swap (the upsert commit protocol — readers never see a
    * half state). Caller holds the write lock (the LEGACY pre-manifest
    * path; manifested tables go through
    * [[compactBucketsConcurrent]]). Returns #rewritten. */
  private def compactBuckets(spark: SparkSession, warehouse: String,
                             tableName: String, dir: String, meta: TableMeta,
                             base: Manifest, crowded: Seq[Int]): Int = {
    if (crowded.isEmpty) 0
    else {
      val data = dataDir(warehouse, tableName)
      val f = fs(spark, dir)
      val staging = s"$dir/.staging-compact-${UUID.randomUUID()}"
      try {
        toPhys(readRawWith(spark, warehouse, tableName, meta, manifestOf(base))
          .filter(col(BucketCol).isin(crowded: _*))
          .repartition(crowded.size, col(BucketCol))
          .sortWithinPartitions((BucketCol +: meta.pk).map(col): _*),
          meta)
          .write.partitionBy(BucketCol).parquet(staging)
        commitStaged(spark, f, dir, data, staging, crowded, "compact",
          base, base.buckets, meta)
      } finally f.delete(new Path(staging), true)
      crowded.size
    }
  }

  /** [[compactBuckets]] WITHOUT holding the write lock for the rewrite
    * — the [[upsertConcurrent]] bucket-window protocol applied to
    * layout maintenance (its easiest client: no logical change, so the
    * only conflict is a touched bucket's file/DV window moving). The
    * crowded-bucket rewrite (reading THROUGH the buckets' delete
    * vectors — the commit drops them, materializing the tombstones)
    * stages against the snapshot-at-start outside the lock; a brief
    * locked flip re-validates [[maintenanceWindowCheck]] and commits.
    * Ingest writers racing this compact serialize only on the flip;
    * on conflict the MAINTENANCE re-stages ([[retryMaintenance]]),
    * never the ingest. Returns #rewritten. */
  private def compactBucketsConcurrent(spark: SparkSession, warehouse: String,
                                       tableName: String, dir: String,
                                       meta0: TableMeta, base0: Manifest,
                                       crowded: Seq[Int],
                                       commitWaitMs: Long): Int = {
    if (crowded.isEmpty) 0
    else {
      val data = dataDir(warehouse, tableName)
      val f = fs(spark, dir)
      val staging = s"$dir/.staging-compact-${UUID.randomUUID()}"
      try {
        // the rewrite job — OUTSIDE the lock
        toPhys(readRawWith(spark, warehouse, tableName, meta0, manifestOf(base0))
          .filter(col(BucketCol).isin(crowded: _*))
          .repartition(crowded.size, col(BucketCol))
          .sortWithinPartitions((BucketCol +: meta0.pk).map(col): _*),
          meta0)
          .write.partitionBy(BucketCol).parquet(staging)
        // footer stats of the staged files too — the flip must stay a
        // flip even when every bucket was crowded
        val preStats = stageFileStats(spark, f, staging,
          statColsTypedOf(meta0))
        MaintenanceHooks.betweenPhases()
        // ---------------- LOCKED: re-validate, commit ----------------
        WriteLock.withLockWait(spark, dir, "compact(commit)", commitWaitMs) {
          val metaLatest = TableMeta.read(spark, dir)
          val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
          maintenanceWindowCheck(base0, baseLatest, meta0, metaLatest,
            crowded, "compact")
          commitStaged(spark, f, dir, data, staging, crowded, "compact",
            baseLatest, baseLatest.buckets, metaLatest,
            preStats = Some(preStats))
        }
      } finally f.delete(new Path(staging), true)
      crowded.size
    }
  }

  /** #11p auto-compaction policy: the consumer of [[bucketStats]]'s
    * footer-only layout report. Decides per bucket, from metadata alone
    * (zero data bytes read when nothing is crowded), whether the bucket
    * breaches either health threshold:
    *  - `maxFilesPerBucket` — append small-files accumulation, and/or
    *  - `minAvgRowsPerFile` — fragmentation into scan-hostile slivers
    *    (only when the bucket has > 1 file; one small file IS compact),
    * and rewrites ONLY the breaching buckets (same staging + swap
    * protocol as upsert). The maintenance loop at 100 TB: appends land
    * as cheap per-bucket file adds, and this policy pays the rewrite
    * only where, and only when, the layout actually degraded — a
    * scheduled `compactIfNeeded` per table replaces any full-table
    * rewrite cadence. Returns the bucket ids it compacted. */
  def compactIfNeeded(spark: SparkSession, warehouse0: String,
                      tableName: String, maxFilesPerBucket: Int = 4,
                      minAvgRowsPerFile: Long = 0,
                      schema: Option[String] = None,
                      maxDeleteFraction: Double = 0.2,
                      commitWaitMs: Long = 60000L): Seq[Int] = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (Manifest.current(spark, dir).isEmpty)
      // legacy table: classic locked policy pass (adopts a manifest, so
      // the NEXT call is optimistic) — breach decision from the
      // footer-only bucketStats report (no manifest row counts yet)
      return WriteLock.withLock(spark, dir, "compactIfNeeded") {
        val meta = TableMeta.read(spark, dir)
        val base = snapshotForWrite(spark, dir, dataDir(warehouse, tableName), meta)
        val crowded = bucketStats(spark, warehouse0, tableName, schema)
          .collect().toSeq
          .filter { r =>
            val (nf, nr) = (r.getLong(1), r.getLong(2))
            nf > maxFilesPerBucket ||
              (nf > 1 && minAvgRowsPerFile > 0 && nr / nf < minAvgRowsPerFile)
          }
          .map(_.getInt(0)).sorted
        compactBuckets(spark, warehouse, tableName, dir, meta, base, crowded)
        crowded
      }
    // OPTIMISTIC policy pass: the breach decision AND the rewrite both
    // run against the current snapshot outside the lock — the healthy
    // steady state (nothing crowded) now costs one manifest read and
    // ZERO lock traffic, which is what lets this ride every streaming
    // sink epoch without contending with the sink's own committers.
    retryMaintenance("compactIfNeeded") {
      val meta = TableMeta.read(spark, dir)
      val base = Manifest.current(spark, dir).get
      // delete-vector density straight from the manifest (zero IO): a
      // bucket whose tombstoned fraction breaches the bound rewrites —
      // the read-side anti-join cost is bounded BY POLICY, and the
      // rewrite both materializes the DVs and reclaims the dead bytes
      val dvCrowded: Seq[Int] = base.dvs.toSeq.collect {
        case (b, dvFls)
          if {
            val dead = dvFls.flatMap(_.rows).sum
            val fls = base.files.getOrElse(b, Nil)
            dead > 0 && fls.forall(_.rows.isDefined) && {
              val total = fls.flatMap(_.rows).sum
              total > 0 && dead.toDouble / total > maxDeleteFraction
            }
          } => b
      }
      // layout health from the MANIFEST alone whenever it carries row
      // counts (every file this code writes does): the no-op case then
      // costs one manifest read — which is what lets maintenance ride
      // every upsert-mode (and opt-in append-mode, see auto_compact)
      // streaming-sink epoch. Tables with uncounted files
      // (legacy/adopted) fall back to the footer-only bucketStats
      // report (O(files) footer opens, still zero data pages).
      val crowded: Seq[Int] =
        if (base.version >= 0 &&
            base.files.valuesIterator.flatten.forall(_.rows.isDefined))
          base.files.toSeq.collect { case (b, fls)
            if fls.size > maxFilesPerBucket ||
              (fls.size > 1 && minAvgRowsPerFile > 0 &&
               fls.flatMap(_.rows).sum / fls.size < minAvgRowsPerFile) => b }
        else bucketStats(spark, warehouse0, tableName, schema)
          .collect().toSeq
          .filter { r =>
            val (nf, nr) = (r.getLong(1), r.getLong(2))
            nf > maxFilesPerBucket ||
              (nf > 1 && minAvgRowsPerFile > 0 && nr / nf < minAvgRowsPerFile)
          }
          .map(_.getInt(0))
      val all = (crowded ++ dvCrowded).distinct.sorted
      compactBucketsConcurrent(spark, warehouse, tableName, dir, meta,
        base, all, commitWaitMs)
      all
    }
  }

  /** Morton (Z-order) value of 2–4 numeric columns: values scale
    * affinely onto [0, 2^bits) against broadcast min/max scalars, then
    * bit-interleave via the classic per-stride mask-spread chains —
    * pure long arithmetic, codegen-friendly, no UDF. Bits per
    * dimension: 21 for 2 or 3 columns, 15 for 4 (the widest spread
    * whose top bit, shifted by the last column's lane offset, stays
    * below the sign bit — Morton order must compare as UNSIGNED, and
    * keeping every z value non-negative makes the signed long sort
    * agree). Constant and all-NULL columns map to 0 (any order is
    * clustered). */
  private def zValue(cols: Seq[Column],
                     mins: Seq[Option[Double]],
                     maxs: Seq[Option[Double]]): Column = {
    val n = cols.size
    val bits = if (n <= 3) 21 else 15
    def scaled(c: Column, mn: Option[Double], mx: Option[Double]): Column =
      if (mn.isEmpty || mx.isEmpty || mx == mn) lit(0L)
      else ((c.cast("double") - lit(mn.get)) / lit(mx.get - mn.get) *
        lit(((1L << bits) - 1).toDouble)).cast("long")
    // each chain doubles the gap between bit groups until single bits
    // sit `n` apart; the masks are the standard 2D/3D/4D Morton magic
    def spread2(x0: Column): Column = { // 21 bits, stride 2
      var v = x0.bitwiseAND(lit(0x1FFFFFL))
      v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
      v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    def spread3(x0: Column): Column = { // 21 bits, stride 3
      var v = x0.bitwiseAND(lit(0x1FFFFFL))
      v = v.bitwiseOR(shiftleft(v, 32)).bitwiseAND(lit(0x001F00000000FFFFL))
      v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x001F0000FF0000FFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
      v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x1249249249249249L))
    }
    def spread4(x0: Column): Column = { // 15 bits, stride 4
      var v = x0.bitwiseAND(lit(0x7FFFL))
      v = v.bitwiseOR(shiftleft(v, 24)).bitwiseAND(lit(0x000000FF000000FFL))
      v = v.bitwiseOR(shiftleft(v, 12)).bitwiseAND(lit(0x000F000F000F000FL))
      v = v.bitwiseOR(shiftleft(v, 6)).bitwiseAND(lit(0x0303030303030303L))
      v.bitwiseOR(shiftleft(v, 3)).bitwiseAND(lit(0x1111111111111111L))
    }
    val spread: Column => Column =
      n match { case 2 => spread2; case 3 => spread3; case _ => spread4 }
    cols.indices.map { i =>
      val s = spread(scaled(cols(i), mins(i), maxs(i)))
      if (i == 0) s else shiftleft(s, i)
    }.reduce(_ bitwiseOR _)
  }

  /** #11r Z-order clustering: rewrite every bucket with rows sorted by
    * the Morton interleave of 2–4 columns, so parquet row-group
    * min/max stats become tight on EVERY clustered dimension — a range
    * predicate on any of them (or several) prunes row groups, where a
    * PK-sorted layout prunes only on the leading key. This is the
    * standard multi-dimensional clustering move at 100 TB
    * (Delta/Iceberg Z-ORDER, which also accept n columns): the bucket
    * layout (PK hashing, co-partitioned joins, commit protocol) is
    * untouched — only the order WITHIN each bucket's files changes,
    * via the same staging + swap as compaction. Per-dimension
    * resolution is 21 bits for 2–3 columns, 15 for 4 ([[zValue]]) —
    * still far finer than any row-group boundary. More dimensions
    * dilute each one's clustering (the bits interleave), so 2–3 is
    * the sweet spot and 4 the ceiling, matching the engines above.
    * NULLs in a z column sort first (cast yields NULL → z NULL); an
    * all-NULL or constant column contributes 0 bits and the remaining
    * dimensions cluster as if it were absent.
    * `parquetBlockBytes` caps the row-group size so large buckets split
    * into several stat-pruned groups (None = parquet default, the right
    * choice at real scale).
    *
    * Scale shape: one footer-free min/max aggregate (2 scalars per
    * column), then exactly the compaction rewrite — one shuffle by
    * bucket, sort within, swap. Cost equals one compact; the payoff is
    * every subsequent selective scan on any z dimension. */
  def zorderCompact(spark: SparkSession, warehouse0: String,
                    tableName: String, zCols: Seq[String],
                    parquetBlockBytes: Option[Long] = None,
                    schema: Option[String] = None,
                    commitWaitMs: Long = 60000L): Unit = {
    require(zCols.size >= 2 && zCols.size <= 4,
      s"zorderCompact interleaves 2 to 4 columns, got ${zCols.size}")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    val data = dataDir(warehouse, tableName)
    if (Manifest.current(spark, dir).isEmpty) {
      // legacy table: adopt a manifest under the lock first (a trivial
      // zero-touched commit), then the optimistic pass below runs
      // against a real snapshot
      WriteLock.withLock(spark, dir, "zorder(adopt)") {
        val meta = TableMeta.read(spark, dir)
        val base = snapshotForWrite(spark, dir, data, meta)
        if (base.version < 0)
          Manifest.commit(spark, dir, base.copy(version = 0,
            op = Some("adopt"))): Unit
      }
    }
    // OPTIMISTIC rewrite ([[maintenanceWindowCheck]] + retry): the
    // min/max aggregate, the Morton sort, and the full bucket rewrite
    // all run against the snapshot-at-start OUTSIDE the lock — a
    // multi-hour Z-order of a 100 TB table is no longer a writer
    // outage. The touched set is every bucket holding live files;
    // ingest into a NEW bucket (keys hashing where no file lived yet)
    // is disjoint and commits right through the rewrite window.
    retryMaintenance("zorderCompact") {
      val meta0 = TableMeta.read(spark, dir)
      zCols.foreach { c =>
        if (!meta0.schema.fieldNames.contains(c))
          throw new StoreException(s"zorder column $c not in table schema")
      }
      val base0 = Manifest.current(spark, dir).get
      val touched = base0.files.keys.toSeq.sorted
      val raw = readRawWith(spark, warehouse, tableName, meta0, Some(base0))
      // 2 scalars per column from one aggregate — broadcast into the
      // sort key; a column whose min is NULL (all-NULL/empty) degrades
      // to a constant-0 lane in zValue
      val mmExprs = zCols.flatMap(c => Seq(
        min(col(c).cast("double")), max(col(c).cast("double"))))
      val mm = raw.agg(mmExprs.head, mmExprs.tail: _*).head()
      def at(i: Int): Option[Double] =
        if (mm.isNullAt(i)) None else Some(mm.getDouble(i))
      val mins = zCols.indices.map(i => at(2 * i))
      val maxs = zCols.indices.map(i => at(2 * i + 1))
      if (mins.exists(_.isDefined)) { // fully NULL/empty table: no-op
        val z = zValue(zCols.map(col), mins, maxs)
        val f = fs(spark, dir)
        val staging = s"$dir/.staging-zorder-${UUID.randomUUID()}"
        try {
          // the sort + rewrite job — OUTSIDE the lock
          val writer = toPhys(raw.withColumn("_z", z)
            .repartition(base0.buckets, col(BucketCol))
            .sortWithinPartitions(col(BucketCol), col("_z"))
            .drop("_z"), meta0)
            .write.partitionBy(BucketCol)
          parquetBlockBytes.fold(writer)(n =>
            writer.option("parquet.block.size", n.toString))
            .parquet(staging)
          // footer stats collected UNLOCKED, with the z columns already
          // in the tracked set (the flip registers them as statsCols,
          // so this commit's files must carry their bounds — that
          // tight-bounds payoff is the point of the Z-order)
          val zStats = (meta0.statsCols ++
            zCols.filter(c => statStorable(meta0.schema(c).dataType))
              .filterNot(meta0.pk.headOption.contains)).distinct
          val preStats = stageFileStats(spark, f, staging,
            statColsTypedOf(meta0.copy(statsCols = zStats)))
          MaintenanceHooks.betweenPhases()
          // -------------- LOCKED: re-validate, commit --------------
          WriteLock.withLockWait(spark, dir, "zorder(commit)",
              commitWaitMs) {
            val metaLatest = TableMeta.read(spark, dir)
            val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
            maintenanceWindowCheck(base0, baseLatest, meta0, metaLatest,
              touched, "zorderCompact")
            // Z-ordering makes per-file bounds on the clustered columns
            // tight — exactly when per-column manifest stats pay off.
            // Register them BEFORE the commit records footer stats, so
            // this commit's files carry the stats. (Crash between this
            // meta write and the flip: registered stats with the old
            // layout — harmless, future commits just record extras.)
            val newStats = (metaLatest.statsCols ++
              zCols.filter(c => statStorable(metaLatest.schema(c).dataType))
                .filterNot(metaLatest.pk.headOption.contains)).distinct
            val metaStat =
              if (newStats == metaLatest.statsCols) metaLatest
              else {
                val m = metaLatest.copy(statsCols = newStats)
                TableMeta.write(spark, dir, m)
                m
              }
            commitStaged(spark, f, dir, data, staging, touched,
              "zorder", baseLatest, baseLatest.buckets, metaStat,
              preStats = Some(preStats))
            // full rewrite of every base0 bucket — and any bucket born
            // AFTER the drop was already written post-drop — so dropped
            // names are re-addable again (see dropColumns)
            if (metaStat.dropped.nonEmpty)
              TableMeta.write(spark, dir, metaStat.copy(dropped = Nil))
          }
        } finally f.delete(new Path(staging), true)
      }
    }
  }

  /** #11q predicate delete: remove every row matching `where`, touching
    * ONLY the buckets that contain a match, under the write lock with
    * the manifest-flip commit protocol (readers never observe a half
    * state). Two physical strategies ([[DeleteMode]]):
    *
    *  - **merge-on-read** (the small-delete path, chosen by Auto when
    *    the matched set is ≤ [[MorMaxFraction]] of the touched buckets'
    *    live rows): the matched rows' positions — `(file, row ordinal)`
    *    via `_metadata.row_index` — are written as per-bucket DELETE
    *    VECTOR parquet sidecars and committed in the manifest
    *    ([[commitStagedDvs]]); no data file is rewritten, so a 1-row
    *    GDPR erasure in a crowded bucket moves kilobytes, not the
    *    bucket. Reads anti-join the DVs ([[readRawPos]] and the DSv2
    *    scan's in-reader mask); the next rewriting commit of the
    *    bucket (upsert/update/compact/zorder/rebucket/CoW delete)
    *    materializes and drops them.
    *  - **copy-on-write** (chosen by Auto for bulk deletes, or when
    *    the table predates manifests): rewrite the touched buckets
    *    without the matched rows — a bucket whose rows ALL match
    *    simply leaves the snapshot.
    *
    * The touched-bucket probe is one aggregation bounded by the bucket
    * count; when `where` pins the PK, stats prune its scan like a
    * range read. Returns the number of rows deleted. */
  def delete(spark: SparkSession, warehouse0: String, tableName: String,
             where: Column, schema: Option[String] = None,
             changelog: Boolean = false,
             mode: DeleteMode = DeleteMode.Auto): Long = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    WriteLock.withLock(spark, dir, "delete") {
      val meta = TableMeta.read(spark, dir)
      // meta.changelog (table-property CDC) covers the paths that cannot
      // express the flag — SQL `DELETE FROM graft.t` reaches here through
      // KeyedTableSource.deleteWhere with the default
      val cdc = changelog || meta.changelog
      val base = snapshotForWrite(spark, dir, dataDir(warehouse, tableName), meta)
      val raw = readRawWith(spark, warehouse, tableName, meta, manifestOf(base))
      // one job: matching-row count per touched bucket (≤ buckets rows)
      val probe = raw.filter(where).groupBy(col(BucketCol))
        .agg(count(lit(1)).as("n")).collect()
      val touched = probe.map(_.getInt(0)).toSeq
      val deleted = probe.map(_.getLong(1)).sum
      // strategy decision from manifest arithmetic alone (zero IO)
      val mor: Boolean =
        morDecision(manifestOf(base), mode, touched, deleted,
          "delete", tableName)
      if (touched.nonEmpty) {
        val data = dataDir(warehouse, tableName)
        val f = fs(spark, dir)
        // CDC: deletes are changes too — without them a derived
        // aggregate maintained from the log silently keeps vanished
        // rows. One `delete` row per removed row, pre-image in old_*,
        // new_* all NULL; same commit ordering as upsert's batches
        // (staged on the pre-image, renamed in only after the data
        // commit — a failed delete leaves no phantom batch).
        // the changelog batch reads the same live snapshot the staging
        // write does — the two jobs are independent and overlap (§2.6)
        var clCommit: Option[(Path, Path)] = None
        def stageCl(): Unit = if (cdc) {
          val nonPk = meta.schema.fieldNames.filterNot(meta.pk.contains)
          val images = nonPk.toSeq.flatMap { c =>
            Seq(col(c).as(s"old_$c"),
              lit(null).cast(meta.schema(c).dataType).as(s"new_$c"))
          }
          val changes = raw.filter(where)
            .select(meta.pk.map(col) ++ (lit("delete").as("op") +: images): _*)
          clCommit = Some(stageChangelogBatch(spark, dir, changes))
        }
        val staging = s"$dir/.staging-delete-${UUID.randomUUID()}"
        try {
          try {
            if (mor) {
              // merge-on-read: stage ONLY the matched rows' physical
              // positions — one DV parquet per touched bucket, sorted
              // by (file, pos) so the sidecar compresses and scans
              // well. The scan re-applies existing DVs (readRawPos),
              // so positions are never tombstoned twice.
              inParallel({ stageCl() },
                readRawPos(spark, warehouse, tableName, meta,
                    manifestOf(base), withPos = true)
                  .filter(coalesce(where, lit(false)))
                  .select(col(BucketCol), col(FileCol).as("file"),
                    col(PosCol).as("pos"))
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions(col(BucketCol), col("file"), col("pos"))
                  .write.partitionBy(BucketCol).parquet(staging))
              commitStagedDvs(spark, f, dir, data, staging, touched, base)
            } else {
              // copy-on-write: NULL predicate rows are NOT matches —
              // keep them (a bare !where would silently drop them)
              inParallel({ stageCl() },
                toPhys(raw.filter(col(BucketCol).isin(touched: _*))
                  .filter(!coalesce(where, lit(false)))
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions((BucketCol +: meta.pk).map(col): _*),
                  meta)
                  .write.partitionBy(BucketCol).parquet(staging))
              // removeMissing: a bucket whose rows ALL matched has no
              // staged replacement — it leaves the new snapshot entirely
              commitStaged(spark, f, dir, data, staging, touched, "delete",
                base, base.buckets, meta, removeMissing = true)
            }
          } finally f.delete(new Path(staging), true)
          clCommit.foreach { case (src, dst) =>
            commitChangelogBatch(f, "delete", src, dst)
          }
        } finally clCommit.foreach { case (src, _) => f.delete(src, true) }
      }
      if (cdc && !meta.changelog)
        TableMeta.write(spark, dir, meta.copy(changelog = true))
      deleted
    }
  }

  /** #11w predicate update: set value columns to new expressions on every
    * row matching `where`, rewriting ONLY the buckets that contain a
    * match (the delete commit pattern: staging + one manifest flip under
    * the write lock — readers of the previous snapshot are undisturbed).
    * `set` maps existing NON-PK column names to expressions over the
    * row's CURRENT values (`col("v") * 2` works); each is cast to the
    * column's stored type, so the schema never drifts. PK columns are
    * rejected — moving a key is a delete + insert (see [[merge]]).
    * CDC (explicit flag or the table property) logs one
    * `update`/`unchanged` row per MATCHED row with exact before/after
    * images. Returns the number of matched rows.
    *
    * The ops story at 100 TB: a backfill or correction pinned by a PK
    * range (or any predicate with a narrow bucket footprint) rewrites
    * only its share of buckets — never the table — and the touched-
    * bucket probe is one aggregation bounded by the bucket count.
    * Reference concept: `df.loc[mask, col] = expr` applied to the
    * stored table (pandabase's pandas-side mutation idiom made a store
    * commit). */
  /** `mode` ([[DeleteMode]], shared decision arithmetic with
    * [[delete]]): merge-on-read UPDATE decomposes into a positional
    * delete of the matched rows' OLD images plus an appended file of
    * their POST-images — write cost ∝ |matches|, not touched-bucket
    * bytes (the Iceberg-v2 model; Auto picks it while matches stay
    * under [[MorMaxFraction]] of the touched buckets' live rows). */
  def update(spark: SparkSession, warehouse0: String, tableName: String,
             where: Column, set: Map[String, Column],
             schema: Option[String] = None,
             changelog: Boolean = false,
             mode: DeleteMode = DeleteMode.Auto): Long = {
    require(set.nonEmpty, "update needs at least one SET column")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    WriteLock.withLock(spark, dir, "update") {
      val meta = TableMeta.read(spark, dir)
      set.keys.foreach { c =>
        if (!meta.schema.fieldNames.contains(c))
          throw new StoreException(
            s"update SET column $c not in table schema ${meta.schema.fieldNames.toSeq}")
        if (meta.pk.contains(c))
          throw new StoreException(
            s"update cannot SET primary-key column $c (a key move is a " +
            "delete + insert; use merge or delete/append)")
      }
      val cdc = changelog || meta.changelog
      val base = snapshotForWrite(spark, dir, dataDir(warehouse, tableName), meta)
      val raw = readRawWith(spark, warehouse, tableName, meta, manifestOf(base))
      // NULL predicate rows are NOT matches (kept unchanged)
      val matched = coalesce(where, lit(false))
      // one job: matching-row count per touched bucket (≤ buckets rows)
      val probe = raw.filter(matched).groupBy(col(BucketCol))
        .agg(count(lit(1)).as("n")).collect()
      val touched = probe.map(_.getInt(0)).toSeq
      val nMatched = probe.map(_.getLong(1)).sum
      if (touched.nonEmpty) {
        val data = dataDir(warehouse, tableName)
        val f = fs(spark, dir)
        // the typed post-image of column c on a matched row
        def newVal(c: String): Column =
          set.get(c).map(_.cast(meta.schema(c).dataType)).getOrElse(col(c))
        // the changelog batch reads the same live pre-image the staging
        // writes do — independent jobs, overlapped below (§2.6)
        var clCommit: Option[(Path, Path)] = None
        def stageCl(): Unit = if (cdc) {
          val nonPk = meta.schema.fieldNames.filterNot(meta.pk.contains).toSeq
          val changedCond = set.keys.toSeq.sorted
            .map(c => !(newVal(c) <=> col(c)))
            .reduceOption(_ || _).getOrElse(lit(false))
          val images = nonPk.flatMap { c =>
            Seq(col(c).as(s"old_$c"), newVal(c).as(s"new_$c"))
          }
          val changes = raw.filter(matched)
            .select(meta.pk.map(col) ++ (
              when(changedCond, lit("update"))
                .otherwise(lit("unchanged")).as("op") +: images): _*)
          clCommit = Some(stageChangelogBatch(spark, dir, changes))
        }
        // the check sees the POST-image of every matched row (one agg
        // job bounded by the matched set), before anything stages
        enforceChecks(
          raw.filter(matched).select(meta.schema.fieldNames.toSeq
            .map(c => newVal(c).as(c)): _*),
          meta.checks, "update")
        val mor = morDecision(manifestOf(base), mode, touched, nMatched,
          "update", tableName)
        try {
          if (mor) {
            // merge-on-read: tombstone the matched rows' positions and
            // append their post-images — moves |matches| rows, never
            // the buckets. One read of the matched set feeds both
            // staged writes (persisted: the filter job runs once).
            val posFrame = readRawPos(spark, warehouse, tableName, meta,
                manifestOf(base), withPos = true)
              .filter(matched)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val dvStaging = s"$dir/.staging-update-dv-${UUID.randomUUID()}"
            val dataStaging = s"$dir/.staging-update-${UUID.randomUUID()}"
            try {
              inParallel({ stageCl() }, {
                posFrame
                  .select(col(BucketCol), col(FileCol).as("file"),
                    col(PosCol).as("pos"))
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions(col(BucketCol), col("file"), col("pos"))
                  .write.partitionBy(BucketCol).parquet(dvStaging)
                toPhys(posFrame
                  .select(meta.schema.fieldNames.toSeq
                    .map(c => newVal(c).as(c)) :+ col(BucketCol): _*)
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions((BucketCol +: meta.pk).map(col): _*),
                  meta)
                  .write.partitionBy(BucketCol).parquet(dataStaging)
              })
              commitStagedMorMut(spark, f, dir, data, dataStaging,
                dvStaging, touched, "update", base, meta)
            } finally {
              posFrame.unpersist()
              f.delete(new Path(dvStaging), true)
              f.delete(new Path(dataStaging), true)
            }
          } else {
            val staging = s"$dir/.staging-update-${UUID.randomUUID()}"
            try {
              val rewritten = meta.schema.fieldNames.toSeq.map { c =>
                (if (set.contains(c)) when(matched, newVal(c)).otherwise(col(c))
                 else col(c)).as(c)
              } :+ col(BucketCol)
              inParallel({ stageCl() },
                toPhys(raw.filter(col(BucketCol).isin(touched: _*))
                  .select(rewritten: _*)
                  .repartition(touched.size, col(BucketCol))
                  .sortWithinPartitions((BucketCol +: meta.pk).map(col): _*),
                  meta)
                  .write.partitionBy(BucketCol).parquet(staging))
              commitStaged(spark, f, dir, data, staging, touched, "update",
                base, base.buckets, meta)
            } finally f.delete(new Path(staging), true)
          }
          clCommit.foreach { case (src, dst) =>
            commitChangelogBatch(f, "update", src, dst)
          }
        } finally clCommit.foreach { case (src, _) => f.delete(src, true) }
      }
      if (cdc && !meta.changelog)
        TableMeta.write(spark, dir, meta.copy(changelog = true))
      nMatched
    }
  }

  /** #11aa metadata-only column DROP — the inverse of `addNewColumns`
    * evolution: the column leaves the logical schema (reads project
    * `meta.schema`, so live files' physical data for it is simply never
    * read again) and every future write aligns to the reduced schema.
    * Zero data IO — at 100 TB, dropping a column is a metadata edit,
    * not a rewrite; the dead bytes go away as compaction/zorder/rebucket
    * naturally rewrite files.
    *
    * Safety: the name is remembered in [[TableMeta.dropped]] and schema
    * evolution REJECTS re-adding it while any pre-drop file could still
    * be live — old values would silently resurrect instead of reading
    * NULL (the hazard Iceberg solves with field IDs). A FULL rewrite
    * (rebucket, zorderCompact) replaces every live file with the
    * current schema and clears the list.
    *
    * PK columns cannot be dropped. Stats columns referencing the
    * dropped name are pruned. */
  def dropColumns(spark: SparkSession, warehouse0: String, tableName: String,
                  cols: Seq[String], schema: Option[String] = None): Unit = {
    require(cols.nonEmpty, "dropColumns needs at least one column")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    WriteLock.withLock(spark, dir, "dropColumns") {
      val meta = TableMeta.read(spark, dir)
      cols.foreach { c =>
        if (!meta.schema.fieldNames.contains(c))
          throw new StoreException(
            s"cannot drop $c: not in table schema ${meta.schema.fieldNames.toSeq}")
        if (meta.pk.contains(c))
          throw new StoreException(s"cannot drop primary-key column $c")
      }
      TableMeta.write(spark, dir, meta.copy(
        schema = StructType(meta.schema.fields.filterNot(f => cols.contains(f.name))),
        statsCols = meta.statsCols.filterNot(cols.contains),
        // tombstone the PHYSICAL name — that is what live files carry
        // (dropping a renamed column must block re-adding its physical
        // name, not its display name, which is safe to reuse)
        dropped = (meta.dropped ++ cols.map(meta.physName)).distinct,
        renames = meta.renames -- cols))
    }
  }

  /** Metadata-only column RENAME (`ALTER TABLE … RENAME COLUMN`): the
    * logical schema takes the new name, and [[TableMeta.renames]]
    * remembers the column's PHYSICAL name — fixed at creation, never
    * changed — so not one data byte moves and every snapshot (time
    * travel, incremental reads, branches sharing the data dir) keeps
    * resolving. Readers alias physical→logical in one projection;
    * writers alias back at staging; manifest stats and parquet
    * pushdown stay keyed physical throughout. The field-ID-free form
    * of Iceberg's rename.
    *
    * Refused shapes, each a real hazard:
    *  - PK columns: the bucket layout, manifest leading-PK stats, and
    *    every co-bucketed join key on them;
    *  - a target name already in the schema, or tombstoned in
    *    [[TableMeta.dropped]] (pre-drop physical bytes may be live), or
    *    serving as another column's physical name;
    *  - a column referenced by a CHECK constraint (the stored predicate
    *    SQL would silently stop resolving — drop and re-add the check
    *    with the new name);
    *  - a non-clean target name (same rule as every created column).
    *
    * Historical `t$changelog` batches keep their capture-time column
    * names (the change stream is immutable history); batches captured
    * after the rename use the new names. */
  def renameColumn(spark: SparkSession, warehouse0: String,
                   tableName: String, from: String, to: String,
                   schema: Option[String] = None): Unit = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (Names.cleanName(to) != to)
      throw new StoreException(
        s"bad column name '$to': renamed columns follow the same " +
        s"clean-name rule as created ones (try '${Names.cleanName(to)}')")
    WriteLock.withLock(spark, dir, s"renameColumn($from -> $to)") {
      val meta = TableMeta.read(spark, dir)
      if (!meta.schema.fieldNames.contains(from))
        throw new StoreException(
          s"cannot rename $from: not in table schema " +
          s"${meta.schema.fieldNames.toSeq}")
      if (meta.pk.contains(from))
        throw new StoreException(
          s"cannot rename primary-key column $from: the bucket layout, " +
          "manifest stats, and co-bucketed joins key on it — create a " +
          "new table (or add a renamed twin column) instead")
      if (from == to) return
      if (meta.schema.fieldNames.contains(to))
        throw new StoreException(s"cannot rename $from to $to: $to is " +
          "already in the table schema")
      if (meta.dropped.contains(to))
        throw new StoreException(
          s"cannot rename $from to $to: $to was dropped and its physical " +
          "data may still be live; rebucket or zorderCompact the table " +
          "first to reuse the name safely")
      meta.renames.find { case (l, p) => p == to && l != from }.foreach {
        case (l, p) => throw new StoreException(
          s"cannot rename $from to $to: $p is the physical name of " +
          s"renamed column $l — live files carry its bytes under it")
      }
      val referencing = meta.checks.filter { case (_, e) =>
        try spark.sessionState.sqlParser.parseExpression(e).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.head
        }.contains(from)
        catch { case scala.util.control.NonFatal(_) => true } // unparsable: be safe
      }
      if (referencing.nonEmpty)
        throw new StoreException(
          s"cannot rename $from: CHECK constraint(s) " +
          s"${referencing.keys.toSeq.sorted.mkString(", ")} reference it " +
          "— drop the check(s), rename, and re-add them with the new name")
      val phys = meta.physName(from)
      TableMeta.write(spark, dir, meta.copy(
        schema = StructType(meta.schema.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f)),
        statsCols = meta.statsCols.map(c => if (c == from) to else c),
        // identity entries never persist: renaming back to the physical
        // name leaves the table rename-free again
        renames = (meta.renames - from) ++
          (if (to == phys) Map.empty[String, String] else Map(to -> phys))))
    }
  }

  /** Metadata-only column ADD (the declarative half of #8's
    * write-driven evolution, and the path SQL `ALTER TABLE … ADD
    * COLUMNS` lowers onto): extend the logical schema without touching
    * a byte of data — every live file predates the column and reads
    * back NULL, exactly as toSql(addNewColumns = true) evolution
    * behaves. Columns are forced nullable (their history is NULL);
    * duplicate names and tombstoned dropped names are rejected (the
    * same resurrection hazard [[dropColumns]] documents). */
  def addColumns(spark: SparkSession, warehouse0: String, tableName: String,
                 cols: Seq[StructField], schema: Option[String] = None): Unit = {
    require(cols.nonEmpty, "addColumns needs at least one column")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    WriteLock.withLock(spark, dir, "addColumns") {
      val meta = TableMeta.read(spark, dir)
      cols.foreach { f =>
        if (meta.schema.fieldNames.contains(f.name))
          throw new StoreException(
            s"cannot add ${f.name}: already in table schema")
        if (meta.dropped.contains(f.name))
          throw new StoreException(
            s"column ${f.name} was dropped and its physical data may " +
            "still be live; rebucket or zorderCompact the table first " +
            "to re-add the name safely")
        meta.renames.find(_._2 == f.name).foreach { case (l, p) =>
          throw new StoreException(
            s"cannot add $p: it is the physical name of renamed " +
            s"column $l — live files carry its bytes under that name")
        }
      }
      TableMeta.write(spark, dir, meta.copy(
        schema = StructType(meta.schema.fields ++
          cols.map(_.copy(nullable = true)))))
    }
  }

  /** CHECK constraints (#11ai — the Delta/ANSI data-quality contract):
    * register a named SQL predicate that every row must satisfy; from
    * then on EVERY write path (append, appendConcurrent, upsert, merge
    * inserts/updates, predicate update, SQL INSERT/UPDATE/MERGE) rejects
    * the whole mutation — atomically, before any commit — if any
    * incoming row evaluates the predicate to FALSE. SQL semantics: NULL
    * passes (a constraint rejects provable violations, not unknowns —
    * the ANSI CHECK rule, also what partial-column upserts need: absent
    * columns arrive NULL and the stored value already passed when it
    * was written). Registration validates the predicate against all
    * EXISTING rows first, so a table with a constraint satisfies it in
    * every snapshot from that version on. The 100 TB story: ingest
    * contracts enforced at the one choke point every writer shares,
    * priced as one aggregate over each mutation's delta — never a
    * post-hoc table scan. */
  def addCheckConstraint(spark: SparkSession, warehouse0: String,
                         tableName: String, name: String, predicateSql: String,
                         schema: Option[String] = None): Unit = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (Names.cleanName(name) != name)
      throw new StoreException(s"bad constraint name '$name'")
    WriteLock.withLock(spark, dir, s"addCheck($name)") {
      val meta = TableMeta.read(spark, dir)
      if (meta.checks.contains(name))
        throw new StoreException(
          s"check constraint $name already exists " +
          s"(${meta.checks(name)}); drop it first to replace")
      val bad =
        try readRaw(spark, warehouse, tableName, meta)
          .filter(expr(predicateSql) <=> lit(false)).count()
        catch { case e: org.apache.spark.sql.AnalysisException =>
          throw new StoreException(
            s"check constraint $name does not resolve against the " +
            s"table schema: ${e.getMessage}")
        }
      if (bad > 0)
        throw new StoreException(
          s"cannot add check constraint $name ($predicateSql): " +
          s"$bad existing row(s) violate it")
      TableMeta.write(spark, dir,
        meta.copy(checks = meta.checks + (name -> predicateSql)))
    }
  }

  /** Drop a check constraint; false if the name is unknown. */
  def dropCheckConstraint(spark: SparkSession, warehouse0: String,
                          tableName: String, name: String,
                          schema: Option[String] = None): Boolean = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    WriteLock.withLock(spark, dir, s"dropCheck($name)") {
      val meta = TableMeta.read(spark, dir)
      if (!meta.checks.contains(name)) false
      else {
        TableMeta.write(spark, dir, meta.copy(checks = meta.checks - name))
        true
      }
    }
  }

  /** Enforce every registered check over a mutation's incoming rows —
    * ONE aggregate job for all constraints together, run before any
    * staging commit so a violation leaves the table untouched. FALSE
    * violates; NULL passes (see [[addCheckConstraint]]). */
  private def enforceChecks(df: DataFrame, checks: Map[String, String],
                            op: String): Unit = {
    if (checks.isEmpty) return
    val named = checks.toSeq.sortBy(_._1)
    val aggs = named.map { case (n, e) =>
      sum(when(expr(e) <=> lit(false), 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = named.zipWithIndex.collect {
      case ((n, e), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        s"$n ($e): ${row.getLong(i)} row(s)"
    }
    if (bad.nonEmpty)
      throw new StoreException(
        s"$op rejected by check constraint(s): ${bad.mkString("; ")} " +
        "(the table is unchanged)")
  }

  /** #11z per-column file statistics: register EXTRA columns (beyond the
    * always-tracked leading PK) whose min/max every future commit records
    * per new file in the manifest — scans then FILE-SKIP on pushed
    * predicates over these columns at planning time, zero footer opens
    * (the Iceberg per-column-metrics model). Files written earlier carry
    * no entry and are never pruned on them; a compact/zorder rewrite
    * refreshes the whole table. Storable types only (integral, floating,
    * string); the leading PK is silently dropped from the list (already
    * tracked). [[zorderCompact]] registers its clustering columns
    * automatically.
    *
    * The 100 TB story: hash bucketing destroys range locality on every
    * column, but ingest order usually correlates with event time and
    * Z-order restores locality on chosen dimensions — per-column stats
    * turn that physical locality into planning-time pruning for
    * non-key predicates, the same way leading-PK stats already do for
    * key ranges. */
  def setStatsColumns(spark: SparkSession, warehouse0: String,
                      tableName: String, cols: Seq[String],
                      schema: Option[String] = None): Unit = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    WriteLock.withLock(spark, dir, "setStatsColumns") {
      val meta = TableMeta.read(spark, dir)
      cols.foreach { c =>
        if (!meta.schema.fieldNames.contains(c))
          throw new StoreException(
            s"stats column $c not in table schema ${meta.schema.fieldNames.toSeq}")
        if (!statStorable(meta.schema(c).dataType))
          throw new StoreException(
            s"stats column $c has non-storable type ${meta.schema(c).dataType} " +
            "(integral, floating, and string columns only)")
      }
      val cleaned = cols.distinct.filterNot(meta.pk.headOption.contains)
      if (cleaned != meta.statsCols)
        TableMeta.write(spark, dir, meta.copy(statsCols = cleaned))
    }
  }

  /** #11x MERGE: apply a change feed to the table in ONE commit — the
    * `MERGE INTO t USING delta ON pk` triple. Per delta row, keyed by
    * the table's PK:
    *  - `deleteWhen` TRUE and the key exists  → the stored row is DELETED
    *  - `deleteWhen` TRUE and the key is absent → no-op (idempotent
    *    tombstone — replaying a delete feed is safe)
    *  - `deleteWhen` FALSE, key exists  → UPDATE (present-column
    *    overwrite, exactly the upsert contract)
    *  - `deleteWhen` FALSE, key absent → INSERT
    * `deleteWhen` is evaluated over the DELTA's columns BEFORE alignment,
    * and may reference columns that are not (and never become) part of
    * the table schema — the tombstone flag is computed first and its
    * source columns are then dropped unless they belong to the table. A
    * CDC-style feed therefore applies directly:
    * `merge(feed, wh, "t", deleteWhen = col("op") === "delete")` with
    * `op` existing only in the feed.
    *
    * Everything lands atomically: one staged write, one manifest flip,
    * one changelog batch (insert/update/unchanged/delete images — the
    * exact shape [[graft.operators.CdcConsumer]] folds), under the write
    * lock. Duplicate keys in the delta are rejected (validate), NULL
    * tombstone predicates mean FALSE.
    *
    * At 100 TB: applying a day's CDC feed touches only the delta's
    * buckets — one delta-sized classification join, never a table scan —
    * and downstream consumers see exactly one new snapshot and one new
    * changelog batch per applied feed.
    *
    * @return (inserted, updated, deleted) row counts
    *
    * Reference concept: sql.py:299's upsert generalized with tombstones
    * (the reference cannot delete through its upsert; its users issue
    * separate SQL DELETEs — merge is the one-commit form). */
  /** `deleteOnlyMatched`: SQL MERGE clause semantics — tombstones act
    * only on MATCHED keys; an unmatched tombstone row inserts (see
    * [[upsert]]). Default false = change-feed semantics (unmatched
    * tombstone is a no-op).
    *
    * `expectedVersion`: optimistic snapshot pin — the commit aborts
    * with [[ConcurrentWriteException]] (table unchanged; retry) if the
    * table's current manifest version moved past it. The SQL MERGE
    * lowering pins its pre-filter routing read here, so a commit
    * landing between routing and merge can never silently mis-route
    * rows (drop a concurrently-inserted key in an update-only MERGE,
    * or double-handle it in a BY SOURCE clause). */
  /** `mode` ([[DeleteMode]], the shared Auto arithmetic of [[delete]]/
    * [[update]]): merge-on-read MERGE tombstones matched rows'
    * positions and appends the delta's surviving images as new files —
    * one commit whose write cost is ∝ |delta|, never touched-bucket
    * bytes. Auto picks it while |updates + deletes| stay under
    * [[MorMaxFraction]] of the touched buckets' live rows. */
  def merge(df: DataFrame, warehouse0: String, tableName: String,
            deleteWhen: Column, schema: Option[String] = None,
            addNewColumns: Boolean = false, validate: Boolean = true,
            changelog: Boolean = false,
            strictUtc: Boolean = true,
            deleteOnlyMatched: Boolean = false,
            expectedVersion: Option[Long] = None,
            mode: DeleteMode = DeleteMode.Auto): (Long, Long, Long) = {
    val wh = schemaDir(warehouse0, schema)
    val spark = df.sparkSession
    if (strictUtc) {
      val naive = df.schema.fields.filter(_.dataType == TimestampNTZType)
      if (naive.nonEmpty)
        throw new StoreException(
          s"Column(s) ${naive.map(_.name).mkString(", ")} timezone must be set " +
          "(naive TimestampNTZ rejected; convert to a UTC instant, or pass " +
          "strictUtc=false to pin the wall-clock to UTC) (reference: sql.py:133)")
    }
    // tombstone flag FIRST (over the raw delta columns), then the same
    // identifier cleaning as toSql; columns not in the table schema are
    // fine inside `deleteWhen` but are not carried into the table
    val flagged = df.withColumn(MergeDelCol, coalesce(deleteWhen, lit(false)))
    val cleaned = df.columns.foldLeft(flagged) { (d, c) =>
      val cc = Names.cleanName(c)
      if (cc == c) d else d.withColumnRenamed(c, cc)
    }
    // drop delta columns that are neither table columns nor survivable
    // via addNewColumns — they existed only to feed the tombstone flag
    val dir = tableDir(wh, tableName)
    WriteLock.withLock(spark, dir, "merge") {
      if (!TableMeta.exists(spark, dir))
        throw new StoreException(
          s"merge target $tableName does not exist (create it with toSql first)")
      expectedVersion.foreach { v =>
        val cur = Manifest.current(spark, dir).map(_.version).getOrElse(-1L)
        if (cur != v)
          throw new ConcurrentWriteException(
            s"merge into $tableName planned against snapshot $v but the " +
            s"table is now at $cur (concurrent commit since the routing " +
            "read); table unchanged — retry the merge")
      }
      val meta = TableMeta.read(spark, dir)
      val keep = cleaned.columns.filter(c =>
        c == MergeDelCol || addNewColumns || meta.schema.fieldNames.contains(c))
      upsert(cleaned.select(keep.map(col).toIndexedSeq: _*), wh, tableName,
        addNewColumns, validate, changelog, tombstoned = true,
        deleteOnlyMatched = deleteOnlyMatched, mode = mode)
    }
  }

  /** #11e rebucket: rewrite the table under a new bucket count — the
    * operational fix when a table outgrows its create-time bucket
    * choice (buckets sized for 1 TB are hotspots at 100 TB) or when
    * two tables must co-partition for the storage-partitioned PK join
    * (equal bucket counts are its precondition). Necessarily a full
    * rewrite — rehashing moves every row — but it's ONE shuffle
    * (repartition on the new bucket) + one write, via staging + swap
    * so readers never observe a half state; the meta updates last, so
    * a reader that raced the swap still sees a consistent (old-count)
    * view resolve to the new files only with the new meta. */
  def rebucket(spark: SparkSession, warehouse0: String, tableName: String,
               newBuckets: Int, schema: Option[String] = None,
               commitWaitMs: Long = 60000L): Unit = {
    require(newBuckets > 0, s"bucket count must be positive, got $newBuckets")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    if (Manifest.current(spark, dir).isEmpty)
      // legacy table: classic locked rebucket (adopts a manifest)
      return WriteLock.withLock(spark, dir, "rebucket") {
        rebucketLocked(spark, warehouse, tableName, newBuckets, dir)
      }
    // OPTIMISTIC rebucket: rehashing moves every row, so the conflict
    // window is necessarily COARSE — any manifest flip between the
    // start snapshot and the commit invalidates the staged layout (the
    // staged buckets were derived from every old bucket at once). But
    // the expensive part — the full shuffle + rewrite — still stages
    // OUTSIDE the lock: writers keep committing while the rebucket
    // runs, and it is the REBUCKET that re-stages on conflict
    // ([[retryMaintenance]]), never the ingest. On a table too hot for
    // the shuffle to ever land, the bounded retries surface the
    // contention loudly — quiesce writers (or schedule the rebucket
    // into a low-traffic window) rather than silently stalling them
    // for the job's duration, which is what the old full-lock design
    // did by default.
    retryMaintenance("rebucket") {
      val meta0 = TableMeta.read(spark, dir)
      val data = dataDir(warehouse, tableName)
      val base0 = Manifest.current(spark, dir).get
      if (base0.buckets == newBuckets) {
        // keep meta honest if it lags the manifest (crash between a
        // prior rebucket's manifest flip and its meta write)
        if (meta0.buckets != newBuckets)
          WriteLock.withLockWait(spark, dir, "rebucket(meta)",
              commitWaitMs) {
            val m = TableMeta.read(spark, dir)
            if (m.buckets != newBuckets)
              TableMeta.write(spark, dir, m.copy(buckets = newBuckets))
          }
      } else {
        val f = fs(spark, dir)
        val staging = s"$dir/.staging-rebucket-${UUID.randomUUID()}"
        try {
          // the full shuffle + rewrite — OUTSIDE the lock
          toPhys(withBucket(
              readRawWith(spark, warehouse, tableName, meta0, Some(base0))
                .drop(BucketCol),
              meta0.pk, newBuckets)
            .repartition(newBuckets, col(BucketCol))
            .sortWithinPartitions((BucketCol +: meta0.pk).map(col): _*),
            meta0)
            .write.partitionBy(BucketCol).parquet(staging)
          // a rebucket stages EVERY row — its footer stats must not be
          // paid inside the flip (see stageFileStats)
          val preStats = stageFileStats(spark, f, staging,
            statColsTypedOf(meta0))
          MaintenanceHooks.betweenPhases()
          // -------------- LOCKED: re-validate, commit --------------
          WriteLock.withLockWait(spark, dir, "rebucket(commit)",
              commitWaitMs) {
            val metaLatest = TableMeta.read(spark, dir)
            val baseLatest = snapshotForWrite(spark, dir, data, metaLatest)
            if (baseLatest.version != base0.version)
              throw new ConcurrentWriteException(
                s"table advanced v${base0.version} -> v${baseLatest.version} " +
                "while the rebucket staged (a rebucket touches every " +
                "bucket, so ANY concurrent commit invalidates it) — " +
                "re-staging")
            if (metaLatest.schema != meta0.schema)
              throw new ConcurrentWriteException(
                "table schema changed while the rebucket staged (the " +
                "rewrite republished every bucket under the old schema) " +
                "— re-staging")
            // ONE snapshot flip switches both the file set and the
            // bucket count (the manifest carries `buckets`), so no
            // reader can ever pair the old count with the new layout.
            // Old-layout buckets with no staged replacement
            // (newBuckets < old) leave the snapshot via removeMissing;
            // the old files stay for readers of previous snapshots
            // until vacuum. Meta updates after, as the mirror legacy
            // (pre-manifest) code paths read.
            commitStaged(spark, f, dir, data, staging,
              0 until math.max(base0.buckets, newBuckets), "rebucket",
              baseLatest, newBuckets, metaLatest, removeMissing = true,
              preStats = Some(preStats))
            // a full rewrite: every live file now carries the current
            // schema, so dropped names may be re-added safely
            TableMeta.write(spark, dir,
              metaLatest.copy(buckets = newBuckets, dropped = Nil))
          }
        } finally f.delete(new Path(staging), true)
      }
    }
  }

  private def rebucketLocked(spark: SparkSession, warehouse: String,
                             tableName: String, newBuckets: Int,
                             dir: String): Unit = {
    val meta = TableMeta.read(spark, dir)
    val data = dataDir(warehouse, tableName)
    val base = snapshotForWrite(spark, dir, data, meta)
    if (base.buckets == newBuckets) {
      // keep meta honest if it lags the manifest (crash between a prior
      // rebucket's manifest flip and its meta write)
      if (meta.buckets != newBuckets)
        TableMeta.write(spark, dir, meta.copy(buckets = newBuckets))
      return
    }
    val f = fs(spark, dir)
    val staging = s"$dir/.staging-rebucket-${UUID.randomUUID()}"
    try {
      toPhys(withBucket(
          readRawWith(spark, warehouse, tableName, meta, manifestOf(base))
            .drop(BucketCol),
          meta.pk, newBuckets)
        .repartition(newBuckets, col(BucketCol))
        .sortWithinPartitions((BucketCol +: meta.pk).map(col): _*),
        meta)
        .write.partitionBy(BucketCol).parquet(staging)
      // ONE snapshot flip switches both the file set and the bucket
      // count (the manifest carries `buckets`), so no reader can ever
      // pair the old count with the new layout — the failure mode the
      // old dir-swap ordering had to reason about. Old-layout buckets
      // with no staged replacement (newBuckets < old) leave the
      // snapshot via removeMissing; the old files stay for readers of
      // previous snapshots until vacuum. Meta updates after, as the
      // mirror legacy (pre-manifest) code paths read.
      commitStaged(spark, f, dir, data, staging,
        0 until math.max(base.buckets, newBuckets), "rebucket",
        base, newBuckets, meta, removeMissing = true)
      // a full rewrite: every live file now carries the current schema,
      // so dropped column names may be re-added safely (see dropColumns)
      TableMeta.write(spark, dir,
        meta.copy(buckets = newBuckets, dropped = Nil))
    } finally f.delete(new Path(staging), true)
  }

  /** Reclaim a table's garbage, bounded by `olderThanMs` (default 24 h)
    * so nothing an in-flight writer or reader can still touch is
    * removed. Three kinds, each safe by construction:
    *  - `.staging-*` / `.retired-*` dirs a crashed write abandoned
    *    (never the only copy of live data — commits are additive file
    *    moves + a manifest flip, see [[Manifest]]). ALL `.staging-*`
    *    roots are reaped only past a [[WriteLock.DefaultStaleMs]] floor
    *    however aggressive `olderThanMs` — the optimistic verbs
    *    (append/upsert/update/merge/delete `*Concurrent`), layout
    *    maintenance, sink epochs, and changelog images all stage
    *    OUTSIDE the lock, so the lock held here proves nothing about
    *    them — and a `.staging-stream-*` root whose query still holds
    *    a ledger entry is never reaped (see [[dropStreamLedger]]);
    *  - data files the CURRENT manifest does not reference: superseded
    *    by later commits (kept until now precisely so readers of recent
    *    snapshots stay undisturbed) or moved in by a commit that died
    *    before its manifest flip;
    *  - manifests older than the current one (expiring those snapshots
    *    ends their time-travel window — the Iceberg expire-snapshots
    *    trade, made explicit by the age bound).
    * Returns the number of directories/files removed.
    *
    * `dryRun` (the Delta `VACUUM ... DRY RUN` move): walk the identical
    * decision tree — including the liveness union computed AS IF the
    * age-expired manifests were gone, so the count PREDICTS the real
    * run — but delete nothing. The one divergence: bucket dirs that
    * would only become empty by the reap are not counted (emptiness is
    * observable only after real deletes). Retention changes at 100 TB
    * get rehearsed, not discovered. */
  def vacuum(spark: SparkSession, warehouse0: String, tableName: String,
             olderThanMs: Long = 24L * 3600 * 1000,
             schema: Option[String] = None,
             dryRun: Boolean = false): Int = {
    if (splitRef(tableName)._2.isDefined)
      throw new StoreException(
        s"vacuum the BASE table, not a branch ref ($tableName): branches " +
        "share the base's data files and the reap must see every ref's " +
        "live set at once")
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) return 0
    // dryRun: every reap DECISION runs identically — only the delete is
    // suppressed. `expired` records the manifests the pass (would have)
    // removed so the liveness union below can exclude them in both
    // modes; without it a dry run would count data files against a
    // liveness set that still includes the to-be-expired snapshots and
    // systematically under-predict the real reap.
    val expired = scala.collection.mutable.Set.empty[String]
    def reap(path: Path, recursive: Boolean): Boolean =
      dryRun || f.delete(path, recursive)
    // ---------- UNLOCKED pre-walk (the 100 TB long pole) ----------
    // Reading every surviving snapshot and LISTING every bucket dir is
    // O(files) IO; holding the write lock across it would pause every
    // writer for the walk's duration — GC would be the next writer
    // outage after maintenance went optimistic. So the walk runs
    // FIRST, unlocked, against pinned manifest chains: it PREDICTS
    // expiry (the same age + protection rules the locked pass applies)
    // and collects the candidate reap set. The locked flip re-checks
    // only the DELTA — any manifest surviving at flip time that the
    // pre-walk's union did not include (committed during the walk, or
    // predicted-expired but actually protected by a tag/branch added
    // meanwhile) re-protects its references; the candidate set only
    // ever SHRINKS inside the lock. Data files move into bucket dirs
    // only under the lock (commitStaged), so no candidate can become
    // live invisibly between the walk and the flip.
    val preCutoff = System.currentTimeMillis() - olderThanMs
    val preWalk: Option[(Set[(String, Long)], Seq[(String, Path)], Seq[Path])] =
      Manifest.current(spark, dir).map { _ =>
        val preBranches = Branches.branchDirs(spark, dir)
        def predictedSurviving(refDir: String, extraProtected: Set[String])
            : Seq[Manifest] = {
          val prot: Set[String] =
            Tags.read(spark, refDir).values.map(Manifest.versionName).toSet ++
              extraProtected ++
              Manifest.current(spark, refDir)
                .map(mm => Manifest.versionName(mm.version)).toSet
          val mdirR = Manifest.dir(refDir)
          val mtimeOf: Map[String, Long] =
            if (!f.exists(mdirR)) Map.empty
            else f.listStatus(mdirR).iterator
              .filter(st => st.isFile &&
                Manifest.isVersionName(st.getPath.getName))
              .map(st => st.getPath.getName -> st.getModificationTime)
              .toMap
          Manifest.all(spark, refDir).filter { mf =>
            val n = Manifest.versionName(mf.version)
            prot.contains(n) || mtimeOf.get(n).forall(_ >= preCutoff)
          }
        }
        val survivors: Seq[(String, Manifest)] =
          predictedSurviving(dir, Set.empty).map(dir -> _) ++
          preBranches.flatMap { case (_, brDir) =>
            predictedSurviving(brDir,
              Set(Manifest.versionName(Branches.forkVersionOf(spark, brDir))))
              .map(brDir -> _)
          }
        val unioned: Set[(String, Long)] =
          survivors.map { case (rd, mf) => (rd, mf.version) }.toSet
        val live0: Set[String] = survivors.iterator.map(_._2)
          .flatMap(mm => mm.files.iterator ++ mm.dvs.iterator)
          .flatMap { case (b, fls) =>
            fls.map(mfF => s"$BucketCol=$b/${mfF.name}")
          }.toSet
        val data = new Path(dir, "data")
        val cands = scala.collection.mutable.ArrayBuffer.empty[(String, Path)]
        val dataDirs = scala.collection.mutable.ArrayBuffer.empty[Path]
        if (f.exists(data)) {
          f.listStatus(data)
            .filter(st => st.isDirectory &&
              st.getPath.getName.startsWith(s"$BucketCol="))
            .foreach { d =>
              dataDirs += d.getPath
              f.listStatus(d.getPath).foreach { st =>
                val rel = s"${d.getPath.getName}/${st.getPath.getName}"
                if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
                    !live0.contains(rel) &&
                    st.getModificationTime < preCutoff)
                  cands += ((rel, st.getPath))
              }
            }
        }
        (unioned, cands.toSeq, dataDirs.toSeq)
      }
    VacuumHooks.betweenPhases()
    // under the WRITE lock — and every BRANCH's lock, taken below — an
    // in-flight commit's just-moved files are unreferenced until its
    // manifest flips, and an aggressive cutoff (olderThanMs = 0) must
    // not reap them mid-commit. Readers are unaffected — they never
    // take the lock; their protection is the age bound itself.
    WriteLock.withLock(spark, dir, "vacuum") {
      val branches = Branches.branchDirs(spark, dir)
      def withBranchLocks[A](rest: Seq[(String, String)])(body: => A): A =
        rest match {
          case Seq() => body
          case (name, brDir) +: tail =>
            WriteLock.withLock(spark, brDir, s"vacuum(branch $name)") {
              withBranchLocks(tail)(body)
            }
        }
      withBranchLocks(branches.sortBy(_._1)) {
      val cutoff = System.currentTimeMillis() - olderThanMs
      // The UNLOCKED stagers — appendConcurrent and the streaming
      // sink's epochs — write staging while we hold this lock, so the
      // lock proves nothing about them: their roots get a floor on the
      // age bound (a zero-age vacuum cannot reap an epoch or optimistic
      // append mid-stage), and a `.staging-stream-<queryId>` root whose
      // query holds a ledger entry in THAT ref's manifest is skipped at
      // ANY age — the sink is (or recently was) live; retire it with
      // dropStreamLedger first. Everything else staged under the lock
      // keeps the pure age bound (the documented contract).
      val unlockedCutoff = System.currentTimeMillis() -
        math.max(olderThanMs, WriteLock.DefaultStaleMs)
      // abandoned staging under the base dir AND under every branch ref
      // (branch mutations stage in their own dir before moving files
      // into the shared data dir)
      var removed = (p +: branches.map(b => new Path(b._2))).map { root =>
        val ledger: Set[String] = Manifest.current(spark, root.toString)
          .map(_.streams.keySet).getOrElse(Set.empty)
        f.listStatus(root).count { st =>
          val n = st.getPath.getName
          val stale = st.isDirectory && (
            if (n.startsWith(".staging-stream-"))
              !ledger.contains(n.stripPrefix(".staging-stream-")) &&
                st.getModificationTime < unlockedCutoff
            else if (n.startsWith(".staging-"))
              // EVERY stager gets the unlocked floor: the optimistic
              // verbs (append/upsertc/updatec/mergec/deletec), layout
              // maintenance (compact/zorder/rebucket), and changelog
              // images all stage OUTSIDE the lock, so holding it here
              // proves nothing about them — an aggressive olderThanMs
              // reaping a mid-stage dir would leave a committed
              // mutation with no CDC batch (or a maintenance flip with
              // no files). The few still-locked stagers lose nothing:
              // the floor only binds below WriteLock.DefaultStaleMs,
              // where reaping "abandoned" staging younger than the
              // stale-lock TTL was never sound anyway.
              st.getModificationTime < unlockedCutoff
            else n.startsWith(".retired-") &&
              st.getModificationTime < cutoff)
          if (stale) reap(st.getPath, true): Unit
          stale
        }
      }.sum
      // Manifest-commit temp files (`_manifests/.tmp-<uuid>`): by
      // construction never referenced once Manifest.commit returns —
      // a crash between create and rename is the only way one survives.
      // Reaped UNCONDITIONALLY (even when no manifest was ever
      // committed, e.g. a failed FIRST commit on a fresh table — the
      // expiry loop below never runs for those).
      val mdir = Manifest.dir(dir)
      if (f.exists(mdir)) {
        f.listStatus(mdir).foreach { st =>
          if (st.isFile && st.getPath.getName.startsWith(".tmp-") &&
              st.getModificationTime < cutoff && reap(st.getPath, false))
            removed += 1
        }
      }
      // Table-root temp FILES (`.tmp-*`: tag temps, and the commit
      // arbiter's lock-file temps): only a crash between create and
      // publish leaves one behind — same reap rule as manifest temps.
      f.listStatus(p).foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith(".tmp-") &&
            st.getModificationTime < cutoff && reap(st.getPath, false))
          removed += 1
      }
      Manifest.current(spark, dir).foreach { m =>
        // Order matters: FIRST expire old manifests past the age bound
        // (never the current one, never a TAGGED one — a tag is a
        // retention contract, see [[Tags]]), THEN reap data files
        // unreferenced by ANY surviving manifest — a file's own mtime
        // says when it was written, not when it was superseded, so the
        // live set must span every snapshot a reader (or asOfVersion /
        // asOfTag) can still resolve, exactly Iceberg's
        // expire-snapshots rule.
        val protected0: Set[String] =
          Tags.read(spark, dir).values.map(Manifest.versionName).toSet +
            Manifest.versionName(m.version)
        if (f.exists(mdir)) {
          f.listStatus(mdir).foreach { st =>
            val keep = !Manifest.isVersionName(st.getPath.getName) ||
              protected0.contains(st.getPath.getName)
            if (st.isFile && !keep &&
                st.getModificationTime < cutoff && reap(st.getPath, false)) {
              expired += s"$dir/${st.getPath.getName}"
              removed += 1
            }
          }
        }
        // branch-chain expiry, same rule as the base chain: never the
        // branch's CURRENT manifest, never a branch-TAGGED one, and
        // never the FORK-version manifest (readIncremental's audit diff
        // and the publish guard both resolve through it). Runs BEFORE
        // the liveness union below, so files only expired branch
        // snapshots referenced become reapable in the same pass.
        branches.foreach { case (_, brDir) =>
          val bmdir = Manifest.dir(brDir)
          Manifest.current(spark, brDir).foreach { bm =>
            val keepB: Set[String] =
              Tags.read(spark, brDir).values.map(Manifest.versionName).toSet +
                Manifest.versionName(bm.version) +
                Manifest.versionName(Branches.forkVersionOf(spark, brDir))
            if (f.exists(bmdir)) {
              f.listStatus(bmdir).foreach { st =>
                val keep = !Manifest.isVersionName(st.getPath.getName) ||
                  keepB.contains(st.getPath.getName)
                if (st.isFile && !keep &&
                    st.getModificationTime < cutoff &&
                    reap(st.getPath, false)) {
                  expired += s"$brDir/${st.getPath.getName}"
                  removed += 1
                }
              }
            }
          }
        }
        // format-4 manifest SEGMENT files (`_manifests/seg-*.json`):
        // reap those no SURVIVING snapshot of the owning ref references
        // — superseded bucket rewrites whose snapshots just expired, or
        // orphans of a commit that died between its segment writes and
        // its list flip — past the same age bound as everything else.
        (dir +: branches.map(_._2)).foreach { refDir =>
          val mdirR = Manifest.dir(refDir)
          if (f.exists(mdirR)) {
            val referenced: Set[String] =
              Manifest.all(spark, refDir).iterator.filterNot(mf =>
                expired.contains(
                  s"$refDir/${Manifest.versionName(mf.version)}"))
                .flatMap(_.segs.valuesIterator).toSet
            f.listStatus(mdirR).foreach { st =>
              val n = st.getPath.getName
              if (st.isFile && n.startsWith("seg-") && n.endsWith(".json") &&
                  !referenced.contains(n) &&
                  st.getModificationTime < cutoff &&
                  reap(st.getPath, false))
                removed += 1
            }
          }
        }
        // union-liveness spans EVERY ref sharing the data dir: the base
        // chain plus each branch's chain — a file live only on a branch
        // must survive the base's reap (and vice versa after a publish)
        // data files AND delete-vector sidecars: a DV is live exactly
        // while some surviving snapshot references it; a rewriting
        // commit drops the bucket's DVs from its new manifest, and the
        // sidecars become reapable once the older snapshots expire.
        // The heavy union + listing ran UNLOCKED (pre-walk above); here
        // only the WINDOW DELTA re-protects: references of manifests
        // the pre-walk's union did not include — committed during the
        // walk, or predicted-expired but surviving the actual expiry
        // (a tag landed meanwhile). Candidates only shrink.
        preWalk.foreach { case (unioned, cands, dataDirs) =>
          def surviving(refDir: String): Iterator[(String, Manifest)] =
            Manifest.all(spark, refDir).iterator.filterNot(mf =>
              expired.contains(s"$refDir/${Manifest.versionName(mf.version)}"))
              .map(refDir -> _)
          val lateLive: Set[String] =
            (surviving(dir) ++ branches.iterator.flatMap(b => surviving(b._2)))
            .filterNot { case (rd, mf) => unioned((rd, mf.version)) }
            .flatMap { case (_, mf) => mf.files.iterator ++ mf.dvs.iterator }
            .flatMap { case (b, fls) =>
              fls.map(mfF => s"$BucketCol=$b/${mfF.name}")
            }.toSet
          cands.foreach { case (rel, path) =>
            if (!lateLive.contains(rel) && reap(path, false)) removed += 1
          }
          // a bucket dir emptied by the reap (e.g. fully deleted
          // bucket) is itself garbage — observable only after REAL
          // deletes, so the dry run skips it (the one divergence)
          if (!dryRun) dataDirs.foreach { d =>
            if (f.exists(d) && f.listStatus(d).isEmpty &&
                f.delete(d, false))
              removed += 1
          }
        }
      }
      removed
      }
    }
  }

  /** #11v snapshot history — the DESCRIBE HISTORY surface: one row per
    * committed (unexpired) manifest version with its physical totals
    * (bucket count, live files, rows, bytes), read from the manifests
    * alone — zero data IO, zero footer opens (row counts ride in the
    * manifest; −1 when some adopted legacy file lacks one). The audit
    * view behind time travel: what each `asOfVersion` would read, and
    * how the table's physical footprint evolved commit by commit. */
  def history(spark: SparkSession, warehouse0: String, tableName: String,
              schema: Option[String] = None): DataFrame = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    // ONE listing for the whole set (per-version `at` calls would
    // re-list the manifests dir per version)
    val rows = Manifest.all(spark, dir).map { m =>
      val fls = m.files.valuesIterator.flatten.toSeq
      // n_rows = LIVE rows: data-file counts minus delete-vector
      // positions (each tombstones exactly one live row — MoR deletes
      // read through the existing mask, so positions never repeat)
      val nRows =
        (if (fls.forall(_.rows.isDefined)) Some(fls.flatMap(_.rows).sum)
         else None, m.dvRows) match {
          case (Some(d), Some(dv)) => d - dv
          case _ => -1L
        }
      (m.version, m.op.orNull, m.buckets, fls.size.toLong, nRows,
        fls.map(_.len).sum, m.tsMs.map(Long.box).orNull: java.lang.Long)
    }
    import spark.implicits._
    rows.toDF("version", "op", "buckets", "n_files", "n_rows", "bytes",
      "ts_ms")
  }

  /** Synthesize the row-image batch a branch PUBLISH represents — the
    * exact diff between the base's current content (`from`: the
    * branch-chain snapshot the last fork/publish synchronized to, which
    * by the fast-forward divergence guard IS the base's live state) and
    * the branch head (`to`) — and stage it into the BASE's changelog
    * (commit only AFTER the publish flip, via
    * [[commitChangelogBatchRef]]). Both manifests resolve against the
    * SHARED base data dir, so this is the restoreSnapshot image recipe
    * applied across the WAP boundary: [[diffImages]] over the branch
    * ref's manifest chain — manifest-pruned to changed buckets and
    * joined via the zero-exchange [[snapshotDiffJoined]] SPJ core (both
    * sides plan through the DSv2 source pinned to their branch-chain
    * version, zipped on `pb_bucket`). This is what lets
    * write-audit-publish and table-property CDC compose: the publish
    * logs the same images the branch's mutations would have logged
    * applied directly. */
  private[store] def stageWapImages(spark: SparkSession, warehouse: String,
                                    branchRef: String, dir: String,
                                    meta: TableMeta, from: Manifest,
                                    to: Manifest): (Path, Path) =
    withSpjConf(spark) {
      stageChangelogBatch(spark, dir,
        diffImages(spark, warehouse, branchRef, meta, from, to))
    }

  /** [[commitChangelogBatch]] for same-package callers (Branches'
    * publish commits its synthesized batch after the manifest flip). */
  private[store] def commitChangelogBatchRef(f: FileSystem, op: String,
                                             src: Path, dst: Path): Unit =
    commitChangelogBatch(f, op, src, dst)

  /** Tag a snapshot version under a stable name (see [[Tags]]): the
    * snapshot — and every data file it references — then survives
    * [[vacuum]] until [[dropTag]] releases it, and reads resolve it via
    * `readSql(asOfTag)` or SQL `VERSION AS OF '<name>'`. Defaults to
    * the CURRENT version. Returns the tagged version. Fails loudly on a
    * duplicate name (retagging is dropTag + tag — explicit, like
    * Iceberg's replace), an unknown version, or a table with no
    * snapshot yet. */
  def tagSnapshot(spark: SparkSession, warehouse0: String, tableName: String,
                  tag: String, version: Option[Long] = None,
                  schema: Option[String] = None): Long = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    if (tag.isEmpty || tag.exists(c => c == '/' || c == '\\'))
      throw new StoreException(s"bad tag name '$tag'")
    if (tag.toLongOption.isDefined)
      throw new StoreException(
        s"tag name '$tag' would shadow a numeric snapshot version in " +
        "SQL VERSION AS OF; pick a non-numeric name")
    WriteLock.withLock(spark, dir, s"tag($tag)") {
      val vs = Manifest.versions(spark, dir)
      if (vs.isEmpty)
        throw new StoreException(
          s"table $tableName has no snapshot to tag (write to it first)")
      val v = version.getOrElse(vs.last)
      if (!vs.contains(v))
        throw new StoreException(
          s"cannot tag version $v (available: ${vs.mkString(", ")})")
      val cur = Tags.read(spark, dir)
      if (cur.contains(tag))
        throw new StoreException(
          s"tag '$tag' already exists (points at version ${cur(tag)}); " +
          "dropTag it first to retag")
      Tags.write(spark, dir, cur + (tag -> v))
      v
    }
  }

  /** Drop a snapshot tag; the version it pinned becomes an ordinary
    * time-travel snapshot again (expired by the next [[vacuum]] once
    * past the age bound). No-op returns false if the tag is unknown. */
  def dropTag(spark: SparkSession, warehouse0: String, tableName: String,
              tag: String, schema: Option[String] = None): Boolean = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    WriteLock.withLock(spark, dir, s"dropTag($tag)") {
      val cur = Tags.read(spark, dir)
      if (!cur.contains(tag)) false
      else { Tags.write(spark, dir, cur - tag); true }
    }
  }

  /** All tags of a table as (tag, version) rows (lock-free read). */
  def tags(spark: SparkSession, warehouse0: String, tableName: String,
           schema: Option[String] = None): DataFrame = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    import spark.implicits._
    Tags.read(spark, dir).toSeq.sortBy(_._1).toDF("tag", "version")
  }

  /** Incremental snapshot read: the rows ADDED between two snapshots,
    * resolved purely from the manifest diff — the files present in
    * `toVersion` (default: current) but not in `sinceVersion`. For an
    * append-only window this is EXACTLY the new rows, at the cost of
    * reading only the new files (a consumer syncing a 100 TB table
    * reads megabytes per poll, zero listing, zero diffing) — the
    * Iceberg incremental-scan / Delta `readChangeFeed`-lite model.
    *
    * Correctness gate: if the window contains a NON-additive commit
    * (upsert rewrite, delete, compaction, Z-order, rebucket — detected
    * as any `sinceVersion` file absent from `toVersion`, or a bucket
    * count change), the added-files set no longer means "new rows"
    * (rewritten files repeat old rows) and this throws, directing the
    * consumer to [[readChangelog]], which handles arbitrary mutations
    * via row-level images. Fail loudly, never silently double-count.
    *
    * Both snapshots must still be unexpired; tag `sinceVersion`'s
    * snapshot (see [[tagSnapshot]]) to guarantee a poll cursor survives
    * vacuum. */
  def readIncremental(spark: SparkSession, warehouse0: String,
                      tableName: String, sinceVersion: Long,
                      toVersion: Option[Long] = None,
                      schema: Option[String] = None): DataFrame = {
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    val meta = TableMeta.read(spark, dir)
    val since = Manifest.at(spark, dir, sinceVersion)
    val to = toVersion match {
      case Some(v) => Manifest.at(spark, dir, v)
      case None => Manifest.current(spark, dir).getOrElse(
        throw new StoreException(s"table $tableName has no snapshot"))
    }
    if (to.version < since.version)
      throw new StoreException(
        s"readIncremental window is backwards: since=$sinceVersion " +
        s"to=${to.version}")
    def nonAdditive(why: String): Nothing = throw new StoreException(
      s"snapshots $sinceVersion..${to.version} of $tableName are not " +
      s"append-only ($why): added files would repeat surviving rows; " +
      "use readChangelog for row-level incremental consumption")
    if (to.buckets != since.buckets)
      nonAdditive(s"bucket count changed ${since.buckets} -> ${to.buckets}")
    // a merge-on-read delete adds no data files but still removes rows
    // — "added files = new rows" no longer holds across it
    if (since.dvs.view.mapValues(_.map(_.name).toSet).toMap !=
        to.dvs.view.mapValues(_.map(_.name).toSet).toMap)
      nonAdditive("delete vectors changed (merge-on-read delete)")
    val added: Map[Int, Seq[ManifestFile]] = {
      val diffs = (since.files.keySet ++ to.files.keySet).toSeq.sorted.map { b =>
        val old = since.files.getOrElse(b, Nil).map(_.name).toSet
        val cur = to.files.getOrElse(b, Nil)
        if (!old.subsetOf(cur.map(_.name).toSet))
          nonAdditive(s"bucket $b lost files")
        b -> cur.filterNot(f => old.contains(f.name))
      }
      diffs.filter(_._2.nonEmpty).toMap
    }
    // dvs cleared: any DV in force tombstones only PRE-window files
    // (the window is dv-stable per the guard above), and added files
    // are too new for any DV to name them
    readRawWith(spark, warehouse, tableName, meta,
      Some(to.copy(files = added, dvs = Map.empty)))
      .select(meta.schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** #11ae snapshot restore (the Iceberg rollback / Delta RESTORE
    * move): re-commit an EARLIER snapshot's exact file set as a brand
    * new version — pure metadata, zero data IO, one manifest write —
    * so "undo the bad backfill on the 100 TB table" costs the same as
    * tagging it. History is preserved, not rewritten: the rolled-back
    * versions stay time-travelable until [[vacuum]] expires them, and
    * the restored snapshot's files are live again (union-liveness
    * protects them from any vacuum age bound). Restores DATA, not
    * schema: the table keeps its CURRENT logical schema — columns
    * added since the target read back NULL for restored files, columns
    * dropped since stay dropped (exactly [[readSql]] time-travel
    * semantics, made the durable state).
    *
    * Pass exactly one of `version` / `tag`. Restoring to the current
    * version is a no-op (returns the current version, commits
    * nothing). The target snapshot must be unexpired — [[Manifest.at]]
    * fails loudly naming what IS available; tag what you may need to
    * roll back to.
    *
    * CDC (explicit flag or the table property): the changelog stays
    * exact across a restore. The row-level diff current→target is
    * computed over ONLY the buckets whose file sets differ (cost ∝ the
    * restore's real footprint, never the table) and logged as one
    * batch of insert/update/delete images (identical rows emit
    * nothing: a restore is not a touch). A consumer folding the log
    * therefore lands on the restored state without ever re-reading the
    * table. */
  def restoreSnapshot(spark: SparkSession, warehouse0: String,
                      tableName: String, version: Option[Long] = None,
                      tag: Option[String] = None,
                      schema: Option[String] = None,
                      changelog: Boolean = false): Long = {
    if (version.isDefined == tag.isDefined)
      throw new StoreException("restoreSnapshot: pass exactly one of version / tag")
    val warehouse = schemaDir(warehouse0, schema)
    val dir = tableDir(warehouse, tableName)
    WriteLock.withLock(spark, dir, "restore") {
      val meta = TableMeta.read(spark, dir)
      val cur = Manifest.current(spark, dir).getOrElse(
        throw new StoreException(
          s"table $tableName has no snapshot history to restore " +
          "(pre-manifest table: mutate it once to adopt a baseline)"))
      val v = version.getOrElse(resolveTag(spark, dir, tag.get))
      if (v == cur.version) cur.version else {
      val target = Manifest.at(spark, dir, v)
      val cdc = changelog || meta.changelog
      val f = fs(spark, dir)
      val clCommit: Option[(Path, Path)] = if (cdc) {
        // the restore's row-image batch is [[diffImages]] current→target
        // over this ref's own chain: manifest-pruned to the buckets the
        // restore actually rewinds, zipped shuffle-free by the
        // snapshotDiffJoined SPJ core (cost ∝ the restore's footprint,
        // and neither co-partitioned snapshot ever re-shuffles)
        Some(withSpjConf(spark) {
          stageChangelogBatch(spark, dir,
            diffImages(spark, warehouse, tableName, meta, cur, target))
        })
      } else None
      try {
        // delete vectors are part of the snapshot's live-row state and
        // restore with it (union-liveness keeps their sidecars on disk)
        // streams carry from CUR, not the target: a restore rewinds the
        // DATA, never a streaming sink's epoch high-water mark — a
        // rewound epoch would make the sink double-apply on replay
        Manifest.commit(spark, dir, Manifest(cur.version + 1, target.buckets,
          target.files, op = Some(s"restore(${target.version})"),
          dvs = target.dvs, streams = cur.streams))
        clCommit.foreach { case (src, dst) =>
          commitChangelogBatch(f, "restore", src, dst)
        }
      } finally clCommit.foreach { case (src, _) => f.delete(src, true) }
      // restoring across a rebucket: the manifest is the layout
      // authority everywhere, but keep the meta's count in sync the way
      // rebucket itself does (legacy listing fallbacks read it)
      val metaSync = meta.copy(
        buckets = target.buckets,
        changelog = meta.changelog || cdc)
      if (metaSync != meta) TableMeta.write(spark, dir, metaSync)
      cur.version + 1
      }
    }
  }

  /** Read the change-data-capture log written by changelog-enabled
    * upserts: one row per incoming row per batch — (pk…, op,
    * old_<c>…, new_<c>…, batch), op ∈ insert/update/unchanged with
    * before/after images per non-PK column, `batch` monotonically
    * increasing per upsert. `sinceBatch` restricts to batches ≥ it
    * (partition pruning on the batch directory — an incremental
    * consumer reads only the new batches, never the history). Throws
    * [[StoreException]] if the table has no changelog yet (no
    * changelog-enabled upsert has run). */
  /** #11ao snapshot DIFF: classify every PK as insert / update / delete
    * between two snapshot versions — the audit report a write-audit-
    * publish reviewer reads (diff a branch head against its fork
    * point: `snapshotDiff("t@stage", fork)`), and the changelog-free
    * answer to "what changed between v1 and v2".
    *
    * Scale: the manifest diff prunes FIRST — a bucket whose live-file
    * set (names + lengths) is identical in both snapshots holds
    * identical rows and is never read, so diffing adjacent snapshots
    * of a 100 TB table reads only the buckets the commits between them
    * touched. The two pruned sides then full-outer join on the PK
    * (same bucket layout both sides — one co-partitioned shuffle
    * pair), and per-column null-safe comparison classifies the rest.
    * Unchanged rows never leave the join.
    *
    * Note: enables the two storage-partitioned-join session confs
    * (`spark.sql.sources.v2.bucketing.enabled`,
    * `spark.sql.requireAllClusterKeysForCoPartition=false`) for the
    * returned plan, session-scoped — the same documented flip as
    * [[pkJoin]]. */
  def snapshotDiff(spark: SparkSession, warehouse0: String,
                   tableName: String, fromVersion: Long,
                   toVersion: Option[Long] = None,
                   schema: Option[String] = None): DataFrame = {
    val wh = schemaDir(warehouse0, schema)
    val dir = tableDir(wh, tableName)
    val meta = TableMeta.read(spark, dir)
    val mFrom = Manifest.at(spark, dir, fromVersion)
    val mTo = toVersion.map(Manifest.at(spark, dir, _))
      .orElse(Manifest.current(spark, dir)).getOrElse(
        throw new StoreException(
          s"$tableName has no manifest snapshot to diff against"))
    val aPresent = col(s"a.${meta.pk.head}").isNotNull
    val bPresent = col(s"b.${meta.pk.head}").isNotNull
    val nonPk = meta.schema.fieldNames.filterNot(meta.pk.contains).toSeq
    val differs = nonPk.map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    snapshotDiffJoined(spark, wh, tableName, meta, mFrom, mTo) match {
      case None => // nothing changed between the two snapshots
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(
          meta.pk.map(c => meta.schema(c)) :+
            StructField("op", StringType, nullable = false)))
      case Some(joined) =>
        joined.select(
          meta.pk.map(c => coalesce(col(s"b.$c"), col(s"a.$c")).as(c)) :+
          when(!aPresent, lit("insert")).when(!bPresent, lit("delete"))
            .when(differs, lit("update")).otherwise(lit("unchanged")).as("op")
            : _*)
          .filter(col("op") =!= "unchanged")
    }
  }

  /** The full-outer diff join of two snapshots, aliased `a` (from) and
    * `b` (to) — the shared core of [[snapshotDiff]] (pk + op) and, via
    * [[diffImages]], of the two CDC image synthesizers (the WAP
    * publish's [[stageWapImages]] and [[restoreSnapshot]]'s row-level
    * diff — both need the full before/after images). None when manifest
    * arithmetic alone proves the snapshots hold identical rows (no
    * bucket changed).
    *
    * Sets the two SPJ session confs as a side effect (they must hold at
    * physical-planning time, which for the lazy public [[snapshotDiff]]
    * is after this returns); the EAGER internal consumers run under
    * [[withSpjConf]], which restores the caller's values.
    *
    * Scale shape: both sides plan through the DSv2 source PINNED to
    * their manifest version, so each scan reports
    * `KeyGroupedPartitioning(identity(pb_bucket))` and masks its own
    * snapshot's delete vectors inside the readers; the join condition
    * includes `pb_bucket` equality, so Catalyst plans a
    * storage-partitioned sort-merge join with ZERO exchange on either
    * side — a post-backfill diff of a 100 TB table reads only the
    * changed buckets (manifest pruning below) and never shuffles
    * either snapshot. A rebucket between the versions makes bucket ids
    * incomparable: only then does the diff fall back to a plain PK
    * join over everything (the rehash moved every row anyway). */
  private def snapshotDiffJoined(spark: SparkSession, wh: String,
                                 tableName: String, meta: TableMeta,
                                 mFrom: Manifest, mTo: Manifest)
      : Option[DataFrame] = {
    val comparable = mFrom.buckets == mTo.buckets
    // bucket pruning off the manifests alone: identical live-file sets
    // (and DV sets — same data files under different delete vectors
    // hold different LIVE rows) => identical rows => skip the bucket
    val changed: Option[Seq[Int]] =
      if (!comparable) None
      else Some((0 until mTo.buckets).filter { b =>
        mFrom.files.getOrElse(b, Nil).map(f => (f.name, f.len)).toSet !=
          mTo.files.getOrElse(b, Nil).map(f => (f.name, f.len)).toSet ||
        mFrom.dvs.getOrElse(b, Nil).map(_.name).toSet !=
          mTo.dvs.getOrElse(b, Nil).map(_.name).toSet
      })
    if (changed.exists(_.isEmpty)) return None
    // storage-partitioned join gates (idempotent, session-scoped; the
    // second relaxes exact-match so [pb_bucket] ⊂ [bucket, pk…] still
    // co-partitions — same setup as PkJoin)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val a0 = KeyedTableSource.readAt(spark, wh, tableName, mFrom.version)
    val b0 = KeyedTableSource.readAt(spark, wh, tableName, mTo.version)
    // the changed-bucket filter pushes down to DIRECTORY-level pruning
    // (keptBuckets) while every bucket partition is still emitted, so
    // the two sides always zip
    val (a1, b1) = changed match {
      case Some(bs) =>
        (a0.filter(col(BucketCol).isin(bs: _*)),
         b0.filter(col(BucketCol).isin(bs: _*)))
      case None => (a0, b0)
    }
    val a = a1.alias("a")
    val b = b1.alias("b")
    val pkCond = meta.pk.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    val cond =
      if (comparable) col(s"a.$BucketCol") === col(s"b.$BucketCol") && pkCond
      else pkCond
    Some(a.hint("merge").join(b, cond, "full_outer"))
  }

  /** Run `body` with the storage-partitioned-join confs
    * [[snapshotDiffJoined]] flips, restoring the caller's previous
    * values afterwards — for the eager internal consumers (the CDC
    * image synthesizers execute their plan to completion inside, so
    * the flip never leaks into the session). The lazy public
    * [[snapshotDiff]] cannot restore (its plan executes after return)
    * and documents the session-scoped flip instead. */
  private def withSpjConf[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Row-image CHANGE frame between two snapshots of `ref`'s own
    * manifest chain — (pk…, op, old_<c>…, new_<c>…), op ∈
    * insert/update/delete, identical rows emit nothing — the one batch
    * shape both CDC image synthesizers log ([[stageWapImages]] with a
    * branch ref whose chain holds fork point and head;
    * [[restoreSnapshot]] with the base ref's current and target).
    *
    * Plan shape is [[snapshotDiffJoined]]'s: manifest-pruned to changed
    * buckets, both sides through the DSv2 source pinned to their
    * version (that snapshot's own delete vectors applied in-reader),
    * zipped on `pb_bucket` with ZERO exchange — a publish or restore
    * that rewrote 10% of a 100 TB table diffs that 10% without ever
    * shuffling either co-partitioned snapshot. Caller is responsible
    * for the SPJ confs ([[withSpjConf]] when eager). */
  private[store] def diffImages(spark: SparkSession, wh: String,
                                ref: String, meta: TableMeta,
                                mFrom: Manifest, mTo: Manifest): DataFrame = {
    val nonPk = meta.schema.fieldNames.filterNot(meta.pk.contains).toSeq
    snapshotDiffJoined(spark, wh, ref, meta, mFrom, mTo) match {
      case None => // manifest arithmetic proved the snapshots identical
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(
          meta.pk.map(c => meta.schema(c)) ++
            (StructField("op", StringType, nullable = false) +:
              nonPk.flatMap(c => Seq(
                meta.schema(c).copy(name = s"old_$c", nullable = true),
                meta.schema(c).copy(name = s"new_$c", nullable = true))))))
      case Some(joined) =>
        val aPresent = col(s"a.${meta.pk.head}").isNotNull
        val bPresent = col(s"b.${meta.pk.head}").isNotNull
        val changedCond = nonPk.map(c => !(col(s"a.$c") <=> col(s"b.$c")))
          .foldLeft(lit(false))(_ || _)
        val images = nonPk.flatMap { c =>
          Seq(col(s"a.$c").as(s"old_$c"), col(s"b.$c").as(s"new_$c"))
        }
        val op = when(!aPresent, lit("insert"))
          .when(!bPresent, lit("delete"))
          .otherwise(lit("update"))
        joined
          .filter(!aPresent || !bPresent || changedCond)
          .select(meta.pk.map(c =>
            coalesce(col(s"a.$c"), col(s"b.$c")).as(c)) ++
            (op.as("op") +: images): _*)
    }
  }

  /** Toggle the table-property CDC flag (#11l) — the programmatic core
    * of SQL `ALTER TABLE … SET TBLPROPERTIES('changelog'='true')`.
    * Enabling makes EVERY later mutation log a batch (the invariant
    * readChangelog documents); disabling stops the log at the current
    * batch — existing batches stay readable, downstream consumers
    * simply see no further batches. Metadata-only, under the lock. */
  def setChangelog(spark: SparkSession, warehouse0: String,
                   tableName: String, enabled: Boolean,
                   schema: Option[String] = None): Unit = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    WriteLock.withLock(spark, dir, s"setChangelog($enabled)") {
      val meta = TableMeta.read(spark, dir)
      if (meta.changelog != enabled)
        TableMeta.write(spark, dir, meta.copy(changelog = enabled))
    }
  }

  /** Table-property routing of SQL DML onto the OPTIMISTIC twins —
    * `ALTER TABLE t SET TBLPROPERTIES('commit_mode'='optimistic')`
    * (see [[TableMeta.optimisticDml]]). `mode` is `optimistic` or
    * `locked`; anything else fails loudly. */
  /** Parses/validates a `commit_mode` property value; true =
    * optimistic. Shared by [[setCommitMode]] and CREATE TABLE's
    * pre-creation validation (all-or-nothing: a bogus value must fail
    * before the table exists, like every other property check). */
  def parseCommitMode(mode: String): Boolean = mode.toLowerCase match {
    case "optimistic" => true
    case "locked" => false
    case v => throw new StoreException(
      s"commit_mode must be 'optimistic' or 'locked', got '$v'")
  }

  def setCommitMode(spark: SparkSession, warehouse0: String,
                    tableName: String, mode: String,
                    schema: Option[String] = None): Unit = {
    val optimistic = parseCommitMode(mode)
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    WriteLock.withLock(spark, dir, s"setCommitMode($mode)") {
      val meta = TableMeta.read(spark, dir)
      if (meta.optimisticDml != optimistic)
        TableMeta.write(spark, dir, meta.copy(optimisticDml = optimistic))
    }
  }

  /** Changelog RETENTION — expire folded `_changelog/batch=<n>`
    * batches below a batch/age floor. [[vacuum]] stays hands-off the
    * changelog by design (snapshot expiry and change-stream retention
    * are different lifecycles with different consumers), but on a
    * table-property-CDC table EVERY mutation appends a batch forever —
    * at 100 TB with daily merges the log eventually dwarfs the data —
    * so retention is its own explicit locked call (SQL surface:
    * `CALL graft.system.expire_changelog`).
    *
    * A batch expires only while BOTH dials admit it — number below
    * `beforeBatch` (when set) AND commit file-time at least
    * `olderThanMs` old (when set); at least one dial is required (an
    * undialed call refuses rather than default to a full wipe). The
    * expired set is always a PREFIX of the batch sequence: the walk
    * stops at the first non-expirable batch, so the floor invariant
    * ("everything below the floor is gone, everything at/above is
    * intact") holds even under odd file times. The NEWEST batch never
    * expires — it anchors the merged read's schema and keeps the
    * every-mutation invariant observable.
    *
    * Consumer contract (the Iceberg-tag model): changelog cursors are
    * the CALLER's responsibility — the store registers WRITERS in the
    * manifest `streams` ledger, not readers, so expiry cannot know
    * which `sinceBatch` values are live. What it does guarantee: the
    * floor is persisted (`_changelog/_floor.json`) BEFORE any batch
    * dir is deleted, and a later [[readChangelog]] whose cursor
    * reaches below the floor fails loudly toward a re-sync (snapshot
    * read, resume at the floor) — never a silently gapped change
    * stream. The STREAMING consumer
    * ([[graft.streaming.StreamingCdc]]) enforces the same contract:
    * its file stream would simply never list a reaped batch dir, so
    * it checks its fold position against [[changelogFloor]] at start
    * and per epoch, failing toward a re-seed when retention crossed
    * it. Returns the number of batches expired.
    *
    * `dryRun` (the [[vacuum]] move): the identical prefix walk under
    * the same lock, zero deletes, no floor write — the count predicts
    * the real run EXACTLY (expiry has no reap-time divergence the way
    * vacuum's emptied bucket dirs do). */
  def expireChangelog(spark: SparkSession, warehouse0: String,
                      tableName: String,
                      beforeBatch: Option[Long] = None,
                      olderThanMs: Option[Long] = None,
                      dryRun: Boolean = false,
                      schema: Option[String] = None): Int = {
    if (beforeBatch.isEmpty && olderThanMs.isEmpty)
      throw new StoreException(
        "expireChangelog: pass beforeBatch and/or olderThanMs — an " +
        "undialed call would mean 'drop the whole log'")
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    val clRoot = new Path(dir, ChangelogDir)
    val f = fs(spark, dir)
    // LOCKED: the prefix decision + the floor write (monotone floor,
    // arbitration with concurrent batch-number assignment); the
    // physical deletes run AFTER release — once the floor persists,
    // everything below it is logically expired (readers fail toward a
    // re-sync regardless of deletion timing), so a large retention
    // pass never queues writers behind its directory deletes
    val (count, toReap): (Int, Seq[Path]) =
      WriteLock.withLock(spark, dir, "expireChangelog") {
        if (!f.exists(clRoot))
          throw new StoreException(
            s"table $tableName has no changelog — nothing to expire")
        val all = f.listStatus(clRoot).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
          .map(st => (st.getPath.getName.stripPrefix("batch=").toLong, st))
          .sortBy(_._1)
        // MONOTONE floor: batches below the existing floor are already
        // logically expired — a previous call's post-lock physical
        // deletes may still be in flight, or a crash left them behind.
        // They are excluded from the prefix decision (so a second call
        // with narrower dials can never write a SMALLER floor, which
        // would leave the first call's deleted-but-above-floor batches
        // silently gapping the stream) and re-enter the reap list as
        // orphans instead.
        val floor0 = changelogFloor(f, clRoot)
        val (orphans, batches) = all.partition(_._1 < floor0)
        val newest = batches.lastOption.map(_._1).getOrElse(-1L)
        val now = System.currentTimeMillis()
        // prefix walk: stop at the first batch either dial refuses. The
        // age dial judges by the max FILE mtime inside the batch, not
        // the directory's: object-store filesystems synthesize
        // directory mtimes (often 0, or the copy time after a bucket
        // migration), so a dir-mtime age gate would expire every
        // non-newest batch regardless of real age. File mtimes are
        // written at commit; the prefix bound and the newest-batch
        // anchor keep even a skewed clock from gapping the stream.
        val expire = batches.takeWhile { case (n, st) =>
          n != newest &&
            beforeBatch.forall(n < _) &&
            olderThanMs.forall(a =>
              batchCommitMs(f, st.getPath, st.getModificationTime) <= now - a)
        }
        if (expire.isEmpty)
          (0, if (dryRun) Nil else orphans.map(_._2.getPath))
        else if (dryRun) (expire.size, Nil)
        else {
          // floor FIRST, deletes second: a crash in between leaves a
          // floor claiming slightly more than was reaped — readers
          // below it fail toward a re-sync (conservative); the reverse
          // order could leave reaped batches with no floor, i.e. a
          // silently gapped stream. The prefix excluded sub-floor
          // batches, so this floor is strictly above the existing one
          // — never a regression.
          val floor = expire.last._1 + 1
          val fp = new Path(clRoot, ChangelogFloorFile)
          val out = f.create(fp, true)
          try out.write(s"""{"firstBatch": $floor}""".getBytes("UTF-8"))
          finally out.close()
          (expire.size, orphans.map(_._2.getPath) ++ expire.map(_._2.getPath))
        }
      }
    // a concurrent expireChangelog's duplicate delete is a no-op
    toReap.foreach(p => f.delete(p, true): Unit)
    count
  }

  /** First surviving changelog batch id — the [[expireChangelog]]
    * floor (0 when never expired). The number every consumer cursor
    * must stay at-or-above: [[readChangelog]] enforces it for batch
    * reads, and the streaming consumer
    * ([[graft.streaming.StreamingCdc]]) checks its fold position
    * against it per epoch. */
  def changelogFloor(spark: SparkSession, warehouse0: String,
                     tableName: String,
                     schema: Option[String] = None): Long = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    val clRoot = new Path(dir, ChangelogDir)
    changelogFloor(fs(spark, dir), clRoot)
  }

  /** Per-surviving-batch changelog stats for the `t$changelog`
    * metadata table: (batch, n_files, bytes, dir mod-time ms, floor),
    * ascending by batch — one listing walk, zero data IO. Empty when
    * the table has no changelog. The retention dashboard: how much
    * log accumulated, how old each batch is, where the expiry floor
    * stands. */
  private[store] def changelogBatchStats(spark: SparkSession,
      tableDir: String): Seq[(Long, Long, Long, Long, Long)] = {
    val clRoot = new Path(tableDir, ChangelogDir)
    val f = fs(spark, tableDir)
    if (!f.exists(clRoot)) return Nil
    val floor = changelogFloor(f, clRoot)
    f.listStatus(clRoot).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map { st =>
        val b = st.getPath.getName.stripPrefix("batch=").toLong
        val files = f.listStatus(st.getPath)
          .filter(x => x.isFile && x.getPath.getName.endsWith(".parquet"))
        // same commit-time rule as expireChangelog's age dial: max FILE
        // mtime (dir mtimes are synthetic on object stores)
        val ts = if (files.isEmpty) st.getModificationTime
                 else files.map(_.getModificationTime).max
        (b, files.length.toLong, files.map(_.getLen).sum, ts, floor)
      }
      .sortBy(_._1)
  }

  /** Commit-time estimate of a changelog batch: the max mtime of the
    * FILES inside the batch dir (files are written once, at commit —
    * their mtimes survive object-store semantics where directory
    * mtimes are synthetic). Empty dir falls back to the dir mtime. */
  private def batchCommitMs(f: FileSystem, batchDir: Path,
                            dirMtime: Long): Long = {
    val files = f.listStatus(batchDir).filter(_.isFile)
    if (files.isEmpty) dirMtime else files.map(_.getModificationTime).max
  }

  /** First surviving batch per the floor marker; 0 when never expired. */
  private def changelogFloor(f: FileSystem, clRoot: Path): Long = {
    val fp = new Path(clRoot, ChangelogFloorFile)
    if (!f.exists(fp)) return 0L
    val in = f.open(fp)
    val s = try {
      val bytes = new Array[Byte](f.getFileStatus(fp).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    """"firstBatch"\s*:\s*(\d+)""".r.findFirstMatchIn(s) match {
      case Some(m) => m.group(1).toLong
      case None => throw new StoreException(
        s"corrupt changelog floor marker $fp: $s")
    }
  }

  def readChangelog(spark: SparkSession, warehouse0: String,
                    tableName: String, sinceBatch: Long = 0L,
                    schema: Option[String] = None): DataFrame = {
    val dir = tableDir(schemaDir(warehouse0, schema), tableName)
    val clRoot = new Path(dir, ChangelogDir)
    val f = fs(spark, dir)
    if (!f.exists(clRoot))
      throw new StoreException(
        s"table $tableName has no changelog (upsert with changelog=true to start one)")
    val floor = changelogFloor(f, clRoot)
    if (sinceBatch < floor)
      throw new StoreException(
        s"changelog batches below $floor were expired (expireChangelog); " +
        s"cursor $sinceBatch is gone — re-sync from a snapshot read and " +
        s"resume with sinceBatch >= $floor")
    // mergeSchema: batches written before a schema evolution lack the
    // evolved columns' images — without the merge, an arbitrary batch's
    // file schema would win and image columns could silently vanish;
    // merged, old batches surface NULL images for columns that did not
    // exist yet (the correct pre-image of a column before its birth)
    spark.read.option("mergeSchema", "true").parquet(clRoot.toString)
      .filter(col("batch") >= sinceBatch)
  }

  /** Read a table back, optionally restricted to an inclusive PK range.
    *
    * Mirrors reference `read_sql` (/root/reference/pandabase/sql.py:349):
    * `lowest`/`highest` filter each PK dimension independently
    * (sql.py:406-426 for MultiIndex); `null` entries skip a dimension.
    * Filters push down to parquet row-group stats.
    *
    * `asOfVersion` TIME-TRAVELS: the read resolves through that
    * manifest snapshot instead of the current one — the data exactly as
    * it stood when version N committed (under the CURRENT logical
    * schema; columns added since read as NULL for files predating
    * them). Available until [[vacuum]] expires the snapshot; reading a
    * vacuumed or unknown version fails loudly naming what IS available.
    */
  def readSql(spark: SparkSession,
              warehouse0: String,
              tableName: String,
              lowest: Seq[Any] = Nil,
              highest: Seq[Any] = Nil,
              schema: Option[String] = None,
              asOfVersion: Option[Long] = None,
              asOfTag: Option[String] = None): DataFrame = {
    val warehouse = schemaDir(warehouse0, schema)
    if (asOfVersion.isDefined && asOfTag.isDefined)
      throw new StoreException("pass asOfVersion or asOfTag, not both")
    val meta = TableMeta.read(spark, tableDir(warehouse, tableName))
    for (s <- Seq(lowest, highest) if s.nonEmpty && s.size != meta.pk.size)
      throw new StoreException(
        s"lowest/highest must have one entry per PK column (${meta.pk.size}); " +
        "use null to skip a dimension (reference: sql.py:415)")
    // reference raises when a bound's type can't be compared to the PK
    // column (sql.py:443); mirror that instead of silently coercing
    def boundComparable(v: Any, dt: DataType): Boolean = (v, dt) match {
      case (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double,
            ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType) => true
      case (_: String, StringType) => true
      case (_: Boolean, BooleanType) => true
      case (_: java.sql.Timestamp | _: java.time.Instant | _: java.time.LocalDateTime,
            TimestampType | TimestampNTZType) => true
      case (_: java.sql.Date | _: java.time.LocalDate, DateType) => true
      case _ => false
    }
    for (bounds <- Seq(lowest, highest); (v, i) <- bounds.zipWithIndex
         if v != null && !boundComparable(v, meta.schema(meta.pk(i)).dataType))
      throw new StoreException(
        s"Select range value $v (${v.getClass.getSimpleName}) is not comparable " +
        s"to PK column ${meta.pk(i)}: ${meta.schema(meta.pk(i)).dataType.catalogString} " +
        "(reference: sql.py:443)")
    val conds: Seq[Column] =
      lowest.zipWithIndex.collect { case (v, i) if v != null => col(meta.pk(i)) >= lit(v) } ++
      highest.zipWithIndex.collect { case (v, i) if v != null => col(meta.pk(i)) <= lit(v) }
    val dir = tableDir(warehouse, tableName)
    val mf = asOfVersion.orElse(asOfTag.map(resolveTag(spark, dir, _))) match {
      case Some(v) => Some(Manifest.at(spark, dir, v))
      case None => Manifest.current(spark, dir)
    }
    // bucket-pruning math must use the SNAPSHOT's bucket count (a
    // rebucket changes it; the manifest is the authority when present)
    val effMeta = meta.copy(buckets = mf.map(_.buckets).getOrElse(meta.buckets))
    // FILE skipping on the leading PK dimension: drop manifest files
    // whose recorded [min,max] cannot intersect the requested bounds —
    // on an append-accumulated table each delta's files cover only its
    // own key range, so a narrow range read plans only its overlapping
    // files per bucket, before any footer is opened
    val lo0 = lowest.headOption.filter(_ != null).flatMap(Manifest.normBound)
    val hi0 = highest.headOption.filter(_ != null).flatMap(Manifest.normBound)
    val mfPruned = mf.map { m =>
      if (lo0.isEmpty && hi0.isEmpty) m
      else m.copy(files = m.files.map { case (b, fls) =>
        b -> fls.filter(_.mayOverlap(lo0, hi0))
      }.filter(_._2.nonEmpty))
    }
    val raw = readRawWith(spark, warehouse, tableName, meta, mfPruned)
    // Bucket pruning: hash layout can't prune an arbitrary range, but
    // two shapes enumerate their touched buckets exactly:
    //  - point lookup (every dimension pinned): one bucket;
    //  - a NARROW integral range on a single-column PK: the keys in
    //    [lo, hi] are enumerable, so the bucket set is their hashes —
    //    a handful of dirs instead of all of them. At thousands of
    //    buckets (100 TB tables) this is the difference between
    //    listing 4 directories and listing 4,096.
    // The range predicates still prune row groups within survivors.
    val pruned =
      if (lowest.nonEmpty && lowest == highest && !lowest.contains(null))
        raw.filter(col(BucketCol) === bucketOf(spark, effMeta, lowest))
      else narrowRangeBuckets(spark, effMeta, lowest, highest) match {
        case Some(bs) => raw.filter(col(BucketCol).isin(bs: _*))
        case None => raw
      }
    val filtered = conds.foldLeft(pruned)(_ filter _)
    filtered.select(meta.schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** Resolve a snapshot tag to its version, naming the tags that DO
    * exist on a miss. */
  private[store] def resolveTag(spark: SparkSession, dir: String,
                                tag: String): Long = {
    val tags = Tags.read(spark, dir)
    tags.getOrElse(tag, throw new StoreException(
      s"no snapshot tag '$tag' (available: " +
      s"${tags.keys.toSeq.sorted.mkString(", ")})"))
  }

  /** Bucket of a concrete PK tuple — the same typed xxhash64 the write
    * path uses (withBucket), evaluated on a literal row. */
  private def bucketOf(spark: SparkSession, meta: TableMeta, values: Seq[Any]): Int = {
    val typed = meta.pk.zip(values).map { case (c, v) =>
      lit(v).cast(meta.schema(c).dataType)
    }
    spark.range(1)
      .select(pmod(xxhash64(typed: _*), lit(meta.buckets.toLong)).cast(IntegerType))
      .head().getInt(0)
  }

  /** Keys a narrow range can possibly hold are enumerable for an
    * integral single-column PK; cap enumeration at 1024 keys (one tiny
    * local job — hashing must use the PK's exact type, xxhash64 is
    * type-sensitive). Returns the distinct buckets those keys hash to,
    * or None when the shape doesn't qualify. */
  private def narrowRangeBuckets(spark: SparkSession, meta: TableMeta,
                                 lowest: Seq[Any], highest: Seq[Any]): Option[Seq[Int]] = {
    if (meta.pk.size != 1 || lowest.size != 1 || highest.size != 1) return None
    val dt = meta.schema(meta.pk.head).dataType
    val integral = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    val bounds = (lowest.head, highest.head) match {
      case (lo: Number, hi: Number)
        // BigInt: hi - lo overflows Long for extreme bounds (e.g. a
        // caller passing MinValue..MaxValue as "everything")
        if integral && lo.longValue() <= hi.longValue() &&
          BigInt(hi.longValue()) - BigInt(lo.longValue()) < 1024 =>
        Some((lo.longValue(), hi.longValue()))
      case _ => None
    }
    bounds.map { case (lo, hi) =>
      spark.range(lo, hi + 1)
        .select(pmod(xxhash64(col("id").cast(dt)), lit(meta.buckets.toLong))
          .cast(IntegerType).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
    }
  }
}
