package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.JsonMethods.{compact, render}

/** Table metadata persisted as `_graft_meta.json` inside the table dir.
  *
  * The logical schema lives here (not only in the parquet footers) so
  * that `add_new_columns`-style evolution is a metadata-only operation:
  * old files simply lack the new column and read back as NULL
  * (the Spark-native replacement for the reference's ALTER TABLE,
  * /root/reference/pandabase/sql.py:509).
  *
  * @param pk       primary-key column names (the reference's index / MultiIndex)
  * @param buckets  hash-bucket count for the `pb_bucket` partition layout
  * @param autoIndex true when the PK is the synthetic Names.AutoIndex column
  * @param schema   logical schema (PK columns first), JSON-serialized Spark StructType
  * @param maxAutoIndex high-water mark of assigned auto-index ids, so an
  *   append never scans the table to find `max(id)`. Updated BEFORE the
  *   data write (a crash mid-append leaves it too high → a harmless id
  *   gap, never a duplicate). `None` on pre-field tables → the reader
  *   recovers via a footer-stats max (O(files), not O(rows)).
  * @param changelog true once any mutation has captured CDC: from then
  *   on EVERY mutation (append, upsert, delete — programmatic or SQL)
  *   writes a changelog batch regardless of the per-call flag. Without
  *   this, a consumer maintaining a derived aggregate from the log
  *   would silently miss rows written through a path that forgot (or,
  *   like SQL `DELETE FROM graft.t`, cannot express) `changelog = true`.
  *   The table-property model (Delta CDF, Iceberg changelog): CDC is a
  *   property of the TABLE, not of individual write calls.
  * @param statsCols EXTRA per-column statistics columns (beyond the
  *   leading PK, which is always tracked): every commit records each
  *   new file's min/max for these from the same one footer read, and
  *   scans file-skip on pushed predicates over them — the Iceberg
  *   per-column-metrics model. Set via `KeyedTable.setStatsColumns`;
  *   `zorderCompact` adds its clustering columns automatically (a
  *   Z-ordered layout is exactly what makes these bounds tight).
  *   Files written before a column joined this list carry no entry for
  *   it and are simply never pruned on it.
  * @param dropped column names removed by `KeyedTable.dropColumns` whose
  *   PHYSICAL data may still sit in live files (the drop is
  *   metadata-only). Re-adding such a name through schema evolution
  *   would silently resurrect the old values instead of reading NULL,
  *   so evolution rejects these names until a FULL rewrite (rebucket /
  *   zorderCompact) has replaced every live file — those clear the
  *   list. The field-ID-free form of Iceberg's drop-column safety.
  */
/** @param optimisticDml table-property routing of SQL DML
  *   (`TBLPROPERTIES('commit_mode'='optimistic')`): when true, SQL
  *   INSERT/UPDATE/DELETE/MERGE lower onto the bucket-level OPTIMISTIC
  *   twins (`appendConcurrent`/`updateConcurrent`/`deleteConcurrent`/
  *   `mergeConcurrent`) instead of the locked primitives — the
  *   Spark-SQL-only writer (the common case for orchestrated
  *   pipelines) then gets the same multi-writer behavior as the
  *   programmatic API: stage outside the lock, bucket-window
  *   re-validation at a brief flip, ConcurrentWriteException →
  *   retry the statement. Default false: fail-fast lock contention,
  *   the conservative single-writer contract. */
/** @param renames LOGICAL → PHYSICAL column-name map from
  *   `KeyedTable.renameColumn` (ALTER TABLE … RENAME COLUMN). The
  *   physical name is fixed at column CREATION and never changes —
  *   live files, staged files, manifest stat keys, and parquet
  *   pushdown all speak physical forever — so a rename is pure
  *   metadata: `schema` carries the new logical name, this map
  *   remembers where the bytes live. Readers alias physical→logical
  *   in one projection; writers alias logical→physical at staging.
  *   Identity entries never appear (renaming back to the physical
  *   name drops the entry). The field-ID-free form of Iceberg's
  *   rename: time travel, incremental reads, and old snapshots keep
  *   working because the bytes' names never moved. */
final case class TableMeta(
    pk: Seq[String],
    buckets: Int,
    autoIndex: Boolean,
    schema: StructType,
    maxAutoIndex: Option[Long] = None,
    changelog: Boolean = false,
    statsCols: Seq[String] = Nil,
    dropped: Seq[String] = Nil,
    checks: Map[String, String] = Map.empty,
    optimisticDml: Boolean = false,
    renames: Map[String, String] = Map.empty) {

  /** The parquet-file name of logical column `c`. */
  def physName(c: String): String = renames.getOrElse(c, c)

  /** `schema` with every field under its PHYSICAL name — what the
    * bytes in live files are actually called. */
  def physSchema: StructType =
    if (renames.isEmpty) schema
    else StructType(schema.fields.map(f => f.copy(name = physName(f.name))))

  def toJson: String = compact(render(JObject(
    "pk" -> JArray(pk.map(JString(_)).toList) ::
    "buckets" -> JInt(buckets) ::
    "autoIndex" -> JBool(autoIndex) ::
    "schema" -> JString(schema.json) ::
    (maxAutoIndex.map(m => List("maxAutoIndex" -> (JInt(m): JValue))).getOrElse(Nil) ++
     (if (changelog) List("changelog" -> (JBool(true): JValue)) else Nil) ++
     (if (optimisticDml)
        List("optimisticDml" -> (JBool(true): JValue)) else Nil) ++
     (if (statsCols.nonEmpty)
        List("statsCols" -> (JArray(statsCols.map(JString(_)).toList): JValue))
      else Nil) ++
     (if (dropped.nonEmpty)
        List("dropped" -> (JArray(dropped.map(JString(_)).toList): JValue))
      else Nil) ++
     (if (checks.nonEmpty)
        List("checks" -> (JObject(checks.toList.sortBy(_._1).map {
          case (n, e) => n -> (JString(e): JValue) }): JValue))
      else Nil) ++
     (if (renames.nonEmpty)
        List("renames" -> (JObject(renames.toList.sortBy(_._1).map {
          case (l, p) => l -> (JString(p): JValue) }): JValue))
      else Nil)))))
}

object TableMeta {
  val FileName = "_graft_meta.json"

  /** Driver-side meta cache, validated by the meta file's modification
    * time. Catalog operations over an N-table warehouse (describe,
    * repeated readSql) would otherwise pay N serial small-file reads
    * per call — linear driver latency at 1,000 tables. Same-JVM writes
    * refresh the entry eagerly; cross-JVM writes are caught by the
    * mtime check. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, TableMeta)]()

  def fromJson(s: String): TableMeta = {
    val j = JsonMethods.parse(s)
    val JArray(pks) = (j \ "pk"): @unchecked
    val JInt(buckets) = (j \ "buckets"): @unchecked
    val JBool(auto) = (j \ "autoIndex"): @unchecked
    val JString(schemaJson) = (j \ "schema"): @unchecked
    val maxIdx = (j \ "maxAutoIndex") match {
      case JInt(m) => Some(m.toLong)
      case _ => None
    }
    val cl = (j \ "changelog") match {
      case JBool(b) => b
      case _ => false
    }
    val sc = (j \ "statsCols") match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case _ => Nil
    }
    val dr = (j \ "dropped") match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case _ => Nil
    }
    val ck = (j \ "checks") match {
      case JObject(xs) => xs.collect { case (n, JString(e)) => n -> e }.toMap
      case _ => Map.empty[String, String]
    }
    val od = (j \ "optimisticDml") match {
      case JBool(b) => b
      case _ => false
    }
    val rn = (j \ "renames") match {
      case JObject(xs) => xs.collect { case (l, JString(p)) => l -> p }.toMap
      case _ => Map.empty[String, String]
    }
    TableMeta(
      pks.map { case JString(x) => x; case o => o.toString },
      buckets.toInt, auto,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      maxIdx, cl, sc, dr, ck, od, rn)
  }

  def path(tableDir: String): Path = new Path(tableDir, FileName)

  /** ATOMIC publish of the meta file — the staged-publish discipline
    * every other store mutation already follows, applied to the ONE
    * file that is rewritten in place across its life. A truncating
    * `fs.create(p, overwrite = true)` here would hand lock-free meta
    * readers a torn/empty file on progressive-visibility filesystems
    * (file/HDFS) and would let a crash between truncate and write lose
    * the table's schema/PK/renames durably. Instead the new body is
    * COMPLETE before it becomes visible:
    *
    *  - object stores: `create(p, overwrite = true)` IS the atomic
    *    replace — the PUT at close is all-or-nothing and readers see
    *    old-object-or-new, never bytes in flight;
    *  - `file`: body to a `.tmp-meta-*` sibling, then a kernel-atomic
    *    `Files.move(ATOMIC_MOVE)` replace (a reader holding the old
    *    inode finishes its read untouched); any stale Hadoop `.crc`
    *    sibling from a pre-atomic-write binary is removed so
    *    checksummed `fs.open` readers never fail validation;
    *  - HDFS-like: body to a tmp sibling via the FileSystem, then
    *    `rename` (replace-capable connectors succeed atomically) or the
    *    FileContext OVERWRITE rename (namenode-atomic) when the plain
    *    rename refuses an existing target.
    *
    * When NO atomic replace can be performed (rename failed and the
    * scheme has no FileContext binding), the write FAILS LOUDLY with
    * the previous meta intact — losing an edit beats destroying the
    * table's schema. Crash debris is a root `.tmp-*` sibling, reaped by
    * vacuum past the age bound like every other staged temp. */
  def write(spark: SparkSession, tableDir: String, meta: TableMeta): Unit = {
    val p = path(tableDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val body = meta.toJson.getBytes("UTF-8")
    CommitArbiter.schemeOf(fs) match {
      case s if CommitArbiter.NonAtomicSchemes.contains(s) =>
        val out = fs.create(p, true)
        try out.write(body) finally out.close()
      case "file" =>
        val target = new java.io.File(p.toUri.getPath)
        Option(target.getParentFile).foreach(_.mkdirs())
        val tmp = new java.io.File(target.getParentFile,
          s".tmp-meta-${java.util.UUID.randomUUID()}")
        try {
          val out = new java.io.FileOutputStream(tmp)
          try { out.write(body); out.getFD.sync() } finally out.close()
          java.nio.file.Files.move(tmp.toPath, target.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // raw write bypasses Hadoop's checksum layer; a stale `.crc`
          // from an fs.create-written ancestor would fail fs.open reads
          new java.io.File(target.getParentFile, s".${target.getName}.crc")
            .delete(): Unit
        } finally { tmp.delete(); () }
      case scheme =>
        val tmp = new Path(p.getParent, s".tmp-meta-${UUID.randomUUID()}")
        val out = fs.create(tmp, false)
        try {
          try out.write(body) finally out.close()
          val renamed = fs.rename(tmp, p)
          if (!renamed) {
            if (!fs.exists(p))
              throw new StoreException(
                s"metadata publish rename $tmp -> $p failed with no " +
                "existing target (filesystem error); table metadata " +
                "unchanged")
            // HDFS semantics: rename refuses an existing target — the
            // FileContext API exposes the namenode's atomic
            // rename-with-overwrite
            try {
              val fc = org.apache.hadoop.fs.FileContext.getFileContext(
                p.toUri, conf)
              fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            } catch {
              case scala.util.control.NonFatal(e) => throw new StoreException(
                s"cannot atomically replace table metadata at $p on scheme " +
                s"'$scheme' (plain rename refused an existing target and " +
                s"the FileContext overwrite-rename failed: $e); the " +
                "PREVIOUS metadata is intact — this store never " +
                "truncate-rewrites the meta file")
            }
          }
        } finally {
          try { if (fs.exists(tmp)) fs.delete(tmp, false): Unit }
          catch { case _: Exception => () }
        }
    }
    cache.put(p.toString, (fs.getFileStatus(p).getModificationTime, meta))
  }

  def read(spark: SparkSession, tableDir: String): TableMeta = {
    val p = path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtime = fs.getFileStatus(p).getModificationTime
    val hit = cache.get(p.toString)
    if (hit != null && hit._1 == mtime) return hit._2
    // read-to-EOF of ONE opened stream: with [[write]]'s atomic replace
    // the open resolves either the old or the new meta in full; sizing
    // the buffer from a SECOND getFileStatus (the old shape) could pair
    // a replaced length with the originally-opened content and parse a
    // truncated prefix
    val in = fs.open(p)
    val meta = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      fromJson(buf.toString("UTF-8"))
    } finally in.close()
    cache.put(p.toString, (mtime, meta))
    meta
  }

  def exists(spark: SparkSession, tableDir: String): Boolean = {
    val p = path(tableDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
