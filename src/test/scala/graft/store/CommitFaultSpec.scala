package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The crash-safety contract of the manifest commit protocol
  * (KeyedTable.commitStaged + Manifest.commit): Hadoop renames report
  * failure by RETURNING FALSE, and a false return at any point — moving
  * a staged file in, or flipping the manifest — must never lose a row:
  * the current snapshot stays live and complete, the mutation aborts
  * loudly. Verified by running real mutations on a [[FaultyFileSystem]]
  * armed to fail exactly the rename under test. */
class CommitFaultSpec extends SparkSpec {

  private lazy val wh: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
    val local = Files.createTempDirectory("graft-fault").toString
    s"faulty://$local"
  }

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  private def rowsOf(table: String): Seq[(Long, String, Double)] =
    KeyedTable.readSql(spark, wh, table).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  private val base = Seq(1L -> ("a", 1.0), 2L -> ("b", 2.0), 3L -> ("c", 3.0),
    4L -> ("d", 4.0), 5L -> ("e", 5.0), 6L -> ("f", 6.0))
    .map { case (i, (n, v)) => (i, n, v) }

  private def freshTable(name: String): String = {
    KeyedTable.toSql(df(base: _*), wh, name, pk = Seq("id"), buckets = 4)
    name
  }

  private def version(table: String): Long =
    Manifest.current(spark, s"$wh/$table").get.version

  test("upsert: staged-file move fails -> snapshot unchanged, no row lost") {
    val t = freshTable("t_move_fail")
    val v0 = version(t)
    val up = df((2L, "B", 20.0), (7L, "g", 7.0))
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.toSql(up, wh, t, pk = Seq("id"), how = WriteMode.Upsert)
      }
    }
    assert(e.getMessage.contains("could not move staged file"))
    assert(e.getMessage.contains("current snapshot unchanged"))
    assert(version(t) == v0)      // no new snapshot committed
    assert(rowsOf(t) == base)     // live table byte-for-byte intact
    // not poisoned: the same upsert succeeds once renames work again
    KeyedTable.toSql(up, wh, t, pk = Seq("id"), how = WriteMode.Upsert)
    assert(version(t) == v0 + 1)
    assert(rowsOf(t) == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0), (6L, "f", 6.0), (7L, "g", 7.0)))
  }

  test("upsert: manifest flip fails -> moved-in files rolled back, table whole") {
    val t = freshTable("t_flip_fail")
    val v0 = version(t)
    val e = intercept[StoreException] {
      FaultyFileSystem.armed("/_manifests/.tmp-", "/_manifests/v") {
        KeyedTable.toSql(df((1L, "X", 9.9)), wh, t,
          pk = Seq("id"), how = WriteMode.Upsert)
      }
    }
    assert(e.getMessage.contains("could not commit manifest"))
    assert(version(t) == v0)
    assert(rowsOf(t) == base)
    KeyedTable.toSql(df((1L, "X", 9.9)), wh, t,
      pk = Seq("id"), how = WriteMode.Upsert)
    assert(rowsOf(t) == (1L, "X", 9.9) +: base.drop(1))
  }

  test("append: staged-file move fails -> nothing appended") {
    val t = freshTable("t_append_fail")
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.toSql(df((7L, "g", 7.0)), wh, t,
          pk = Seq("id"), how = WriteMode.Append)
      }
    }
    assert(e.getMessage.contains("commit aborted"))
    assert(rowsOf(t) == base)
    KeyedTable.toSql(df((7L, "g", 7.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    assert(rowsOf(t) == base :+ (7L, "g", 7.0))
  }

  test("compact: move fails -> every file still live and readable") {
    val t = "t_compact_fail"
    KeyedTable.toSql(df(base.take(3): _*), wh, t, pk = Seq("id"), buckets = 2)
    base.drop(3).foreach { r =>
      KeyedTable.toSql(df(r), wh, t, pk = Seq("id"), how = WriteMode.Append)
    }
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.compact(spark, wh, t, minFiles = 2)
      }
    }
    assert(e.getMessage.contains("current snapshot unchanged"))
    assert(rowsOf(t) == base)
    assert(KeyedTable.compact(spark, wh, t, minFiles = 2) > 0)
    assert(rowsOf(t) == base)
  }

  test("delete: move fails -> nothing deleted") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("t_delete_fail")
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.delete(spark, wh, t, col("id") <= 2L)
      }
    }
    assert(e.getMessage.contains("current snapshot unchanged"))
    assert(rowsOf(t) == base)
    assert(KeyedTable.delete(spark, wh, t, col("id") <= 2L) == 2L)
    assert(rowsOf(t) == base.drop(2))
  }

  test("zorder and rebucket: move fails -> table intact, then succeed clean") {
    val t = freshTable("t_maint_fail")
    intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.zorderCompact(spark, wh, t, Seq("id", "v"))
      }
    }
    assert(rowsOf(t) == base)
    intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.rebucket(spark, wh, t, 8)
      }
    }
    assert(rowsOf(t) == base)
    KeyedTable.zorderCompact(spark, wh, t, Seq("id", "v"))
    KeyedTable.rebucket(spark, wh, t, 8)
    assert(rowsOf(t) == base)
    // point lookup agrees with the new bucket count
    assert(KeyedTable.readSql(spark, wh, t, lowest = Seq(3L), highest = Seq(3L))
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("fastForward: manifest flip fails -> base unpublished, branch whole, retry clean") {
    val t = freshTable("t_ff_fault")
    val fork = Branches.create(spark, wh, t, "stage")
    KeyedTable.toSql(df((7L, "g", 7.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    // arm exactly the BASE manifest flip (tmp -> v<N>.json under the
    // base _manifests dir, not the branch's)
    intercept[StoreException] {
      FaultyFileSystem.armed(s"/$t/_manifests/.tmp-",
          s"/$t/_manifests/v") {
        Branches.fastForward(spark, wh, t, "stage")
      }
    }
    // nothing published: base at the fork point, branch head intact
    assert(rowsOf(t) == base)
    assert(version(t) == fork)
    assert(KeyedTable.readSql(spark, wh, s"$t@stage").count() == 7L)
    // the retry publishes cleanly (fork record untouched by the abort)
    assert(Branches.fastForward(spark, wh, t, "stage") == fork + 1)
    assert(rowsOf(t).map(_._1) == (1L to 7L))
  }

  test("failed commits leave only vacuumable leftovers, never live-data gaps") {
    val t = freshTable("t_leftovers")
    intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.toSql(df((3L, "Z", 0.0)), wh, t,
          pk = Seq("id"), how = WriteMode.Upsert)
      }
    }
    assert(rowsOf(t) == base)
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L): Unit
    assert(rowsOf(t) == base)
  }

  test("meta publish rename fails -> OLD meta intact and readable, the " +
       "edit aborts loudly, no truncated/partial meta ever exists") {
    val t = freshTable("t_meta_fail")
    val dir = s"$wh/$t"
    val before = TableMeta.read(spark, dir)
    assert(before.statsCols.isEmpty)
    // arm exactly the meta publish rename (.tmp-meta-* -> _graft_meta.json);
    // on this scheme the FileContext overwrite fallback has no binding
    // either, so the write must abort with the previous meta untouched
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".tmp-meta-", TableMeta.FileName) {
        KeyedTable.setStatsColumns(spark, wh, t, Seq("v"))
      }
    }
    assert(e.getMessage.contains("PREVIOUS metadata is intact"), e.getMessage)
    // the old meta is byte-complete: a fresh parse sees the pre-edit state
    assert(TableMeta.read(spark, dir).statsCols.isEmpty)
    assert(rowsOf(t) == base) // and the table still reads end-to-end
    // no staged-temp debris left behind by the aborted publish
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith(".tmp-meta-")))
    // not poisoned: the same edit succeeds once renames work again
    KeyedTable.setStatsColumns(spark, wh, t, Seq("v"))
    assert(TableMeta.read(spark, dir).statsCols == Seq("v"))
  }

  test("meta publish: tmp-stage write fails -> old meta untouched " +
       "(the truncate-in-place shape is structurally gone)") {
    val t = freshTable("t_meta_stage_fail")
    val dir = s"$wh/$t"
    val metaPath = TableMeta.path(dir)
    val f = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytesBefore = f.getFileStatus(metaPath).getLen
    // even while a (failing) edit is in flight, the live meta file is
    // never opened for write: its length/content cannot regress
    intercept[StoreException] {
      FaultyFileSystem.armed(".tmp-meta-", TableMeta.FileName) {
        KeyedTable.setChangelog(spark, wh, t, enabled = true)
      }
    }
    assert(f.getFileStatus(metaPath).getLen == bytesBefore)
    assert(!TableMeta.read(spark, dir).changelog)
  }
}
