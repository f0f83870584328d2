package graft.store

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec

/** The crash-safety contract of the per-bucket swap commit protocol
  * (KeyedTable.swapBuckets): Hadoop renames report failure by RETURNING
  * FALSE, and a false return at any point of the commit must never lose
  * a bucket — the live table either commits fully or is restored
  * unchanged. Verified by running real mutations on a [[FaultyFileSystem]]
  * armed to fail exactly the commit (or retire) rename. */
class SwapProtocolSpec extends SparkSpec {

  private lazy val wh: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
    val local = Files.createTempDirectory("graft-swap").toString
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

  test("upsert: commit rename fails -> old bucket restored, no row lost") {
    val t = freshTable("t_commit_fail")
    val up = df((2L, "B", 20.0), (7L, "g", 7.0))
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.toSql(up, wh, t, pk = Seq("id"), how = WriteMode.Upsert)
      }
    }
    assert(e.getMessage.contains("could not commit"))
    assert(e.getMessage.contains("old bucket restored"))
    // the live table is byte-for-byte the pre-upsert state
    assert(rowsOf(t) == base)
    // and not poisoned: the same upsert succeeds once renames work again
    KeyedTable.toSql(up, wh, t, pk = Seq("id"), how = WriteMode.Upsert)
    assert(rowsOf(t) == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0), (6L, "f", 6.0), (7L, "g", 7.0)))
  }

  test("upsert: retire rename fails -> commit aborts with table unchanged") {
    val t = freshTable("t_retire_fail")
    val e = intercept[StoreException] {
      FaultyFileSystem.armed("/data/pb_bucket=", ".retired-") {
        KeyedTable.toSql(df((1L, "X", 9.9)), wh, t,
          pk = Seq("id"), how = WriteMode.Upsert)
      }
    }
    assert(e.getMessage.contains("could not retire"))
    assert(rowsOf(t) == base)
  }

  test("compact: commit rename fails -> every file still readable") {
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
    assert(e.getMessage.contains("old bucket restored"))
    assert(rowsOf(t) == base)
    assert(KeyedTable.compact(spark, wh, t, minFiles = 2) > 0)
    assert(rowsOf(t) == base)
  }

  test("delete: retire rename fails -> nothing deleted") {
    import org.apache.spark.sql.functions.col
    val t = freshTable("t_delete_fail")
    val e = intercept[StoreException] {
      FaultyFileSystem.armed("/data/pb_bucket=", ".retired-") {
        KeyedTable.delete(spark, wh, t, col("id") <= 2L)
      }
    }
    assert(e.getMessage.contains("could not retire"))
    assert(rowsOf(t) == base)
    assert(KeyedTable.delete(spark, wh, t, col("id") <= 2L) == 2L)
    assert(rowsOf(t) == base.drop(2))
  }

  test("zorder: commit rename fails -> table intact, then succeeds clean") {
    val t = freshTable("t_zorder_fail")
    val e = intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.zorderCompact(spark, wh, t, Seq("id", "v"))
      }
    }
    assert(e.getMessage.contains("old bucket restored"))
    assert(rowsOf(t) == base)
    KeyedTable.zorderCompact(spark, wh, t, Seq("id", "v"))
    assert(rowsOf(t) == base)
  }

  test("failed commits leave only vacuumable leftovers, never live-data gaps") {
    val t = freshTable("t_leftovers")
    intercept[StoreException] {
      FaultyFileSystem.armed(".staging-", "/data/pb_bucket=") {
        KeyedTable.toSql(df((3L, "Z", 0.0)), wh, t,
          pk = Seq("id"), how = WriteMode.Upsert)
      }
    }
    // vacuum(0) reaps any .staging-* / .retired-* leftovers; the table
    // reads back whole before AND after
    assert(rowsOf(t) == base)
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L): Unit
    assert(rowsOf(t) == base)
  }
}
