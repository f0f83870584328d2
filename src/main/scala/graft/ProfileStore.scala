package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Measurement-only main (guide §1): counts the Spark JOBS each store
  * verb schedules and dumps the executed plan of create's staging
  * write, so the jobs-per-verb claims in OPTIMIZATION_r21.md are
  * auditable against a committed record (plans/r21/store_jobcounts*).
  * Run: `java -cp ... graft.ProfileStore <sfDir>`. Never part of the
  * gate or the bench; changes nothing. */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs += 1
    })
    // capture the create staging write's executed plan (the observe()
    // fusion evidence: CollectMetrics + Window riding the ONE exchange)
    @volatile var createPlan: String = ""
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val p = qe.executedPlan.toString
        if (p.contains("CollectMetrics") && p.contains("_graft_pkdup") &&
            createPlan.isEmpty)
          createPlan = p
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .limit(15000)
    val wh = TempDirs.tempDir("graft-profile-")
    import graft.store.{KeyedTable, WriteMode}

    def verb(name: String)(body: => Unit): Unit = {
      // settle in-flight listener events, then count fresh (the bus is
      // private[spark]; a short quiesce is enough for a probe)
      Thread.sleep(500)
      jobs = 0
      val t0 = System.nanoTime()
      body
      Thread.sleep(500)
      val ms = (System.nanoTime() - t0) / 1e6 - 500.0
      println(f"VERB $name%-22s jobs=$jobs%3d  ${ms / 1000}%.2f s")
    }

    verb("create") {
      KeyedTable.toSql(orders, wh, "t", pk = Seq("o_orderkey"),
        strictUtc = false)
    }
    val delta = orders.filter(col("o_orderkey") % 7 === 3)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    verb("upsert") {
      KeyedTable.toSql(delta, wh, "t", pk = Seq("o_orderkey"),
        how = WriteMode.Upsert, strictUtc = false)
    }
    val fresh = orders.filter(col("o_orderkey") % 7 === 5)
      .withColumn("o_orderkey", col("o_orderkey") + 90000000L)
    verb("append") {
      KeyedTable.toSql(fresh, wh, "t", pk = Seq("o_orderkey"),
        how = WriteMode.Append, strictUtc = false)
    }
    verb("merge(auto)") {
      KeyedTable.merge(delta.withColumn("del", col("o_orderkey") % 14 === 3),
        wh, "t", deleteWhen = col("del"), strictUtc = false)
    }
    verb("merge(mor)") {
      KeyedTable.merge(delta.withColumn("del", col("o_orderkey") % 14 === 10),
        wh, "t", deleteWhen = col("del"), strictUtc = false,
        mode = graft.store.DeleteMode.MergeOnRead)
    }
    verb("update(cow)") {
      KeyedTable.update(spark, wh, "t", col("o_orderkey") % 11 === 4,
        Map("o_totalprice" -> (col("o_totalprice") + 1)),
        mode = graft.store.DeleteMode.CopyOnWrite)
    }
    verb("delete(cow)") {
      KeyedTable.delete(spark, wh, "t", col("o_orderkey") % 13 === 6,
        mode = graft.store.DeleteMode.CopyOnWrite)
    }
    // CDC-enabled cycle: the changelog staging overlap evidence
    verb("create(cdc)") {
      KeyedTable.toSql(orders, wh, "tc", pk = Seq("o_orderkey"),
        strictUtc = false, changelog = true)
    }
    verb("upsert(cdc)") {
      KeyedTable.toSql(delta, wh, "tc", pk = Seq("o_orderkey"),
        how = WriteMode.Upsert, strictUtc = false, changelog = true)
    }
    println("\n=== create staging write executed plan ===")
    println(createPlan)
    spark.stop()
  }
}
