package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the default 100-entry codegen cache thrashes across a 67-query
      // run — each eviction recompiles generated code on the next use
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev-only: SPARK_GRAFT_ONLY=q1,q2 restricts the run (driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Warmup: run every query once at the smallest available SF so the
    // timed pass measures steady-state throughput (JIT, codegen cache,
    // parquet reader machinery) instead of first-query JVM warmup.
    val warmDir = {
      val parent = java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent
      val small = if (parent != null) parent.resolve("sf0.001") else null
      if (small != null && java.nio.file.Files.isDirectory(small)) small.toString else sfDir
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name failed: $e") }
    }
    // Median-of-REPS timed passes (default 3): a single pass conflates a
    // real plan regression with one GC pause / page-cache miss; the
    // per-query MEDIAN across passes is robust to both, and the headline
    // total is the sum of medians. SPARK_GRAFT_BENCH_REPS=1 for dev loops.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    def timedPass(): Seq[(String, Double)] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full row materialization (no count() column pruning)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val passes = (1 to reps).map(_ => timedPass())
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2) // odd reps → true median; even → upper
    }
    val names = selected.map(_._1)
    val byName = passes.flatten.groupBy(_._1).view.mapValues(vs => median(vs.map(_._2))).toMap
    val results = names.map(n => n -> byName(n))
    // Sub-totals: every pb_* query (and stream_upsert) is a full store
    // write+read cycle through KeyedTable — parquet write, lock, commit —
    // while the rest are pure reads. Splitting the headline lets a
    // regression be attributed to the write path vs the scan/plan path.
    def isStoreWrite(n: String) = n.startsWith("pb_") || n == "stream_upsert"
    def r2(v: Double) = math.rint(v * 100) / 100
    val storeWriteTotal = r2(results.filter(t => isStoreWrite(t._1)).map(_._2).sum)
    val readOnlyTotal = r2(results.filterNot(t => isStoreWrite(t._1)).map(_._2).sum)
    val passTotals = passes.map(p => r2(p.map(_._2).sum))
    // Compact per-query times (10 ms resolution) and put the headline
    // metric/value at the END of the line: the harness captures a
    // 2000-char tail of the output (plus sbt's trailing [success]
    // line), and a 68-query line at full double precision overflowed
    // it head-first, truncating the total out of the capture.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    val total = r2(results.map(_._2).sum)
    val sfShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    println(s"""{"queries":$qs,"sf":"$sfShort","metric":"total","value":$total,"unit":"sec"}""")
    // Per-query visibility for a tail-limited capture (the driver keeps
    // only the last ~2000 chars of stdout, which truncates the big line
    // above): re-emit the per-query map as SHORT self-describing chunks,
    // each a complete JSON object under 1500 chars. Any tail window that
    // catches the end of the run sees whole chunks it can reassemble.
    locally {
      val entries = results.map { case (k, v) => "\"" + k + "\":" + r2(v) }
      val chunks = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]; var len = 0
      entries.foreach { e =>
        if (len + e.length > 1300 && cur.nonEmpty) {
          chunks += cur.reverse; cur = Nil; len = 0
        }
        cur = e :: cur; len += e.length + 1
      }
      if (cur.nonEmpty) chunks += cur.reverse
      val n = chunks.size
      chunks.zipWithIndex.foreach { case (es, i) =>
        println(s"""{"queries_part":${i + 1},"of":$n,"sf":"$sfShort","q":{${es.mkString(",")}}}""")
      }
    }
    // the full line above is ~the tail-capture size; repeat the headline
    // WITHOUT the per-query map so the capture always ends with one
    // complete, parseable JSON summary even if the big line truncates
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfShort","n_queries":${results.size},"reps":$reps,"store_write_total":$storeWriteTotal,"read_only_total":$readOnlyTotal,"pass_totals":[${passTotals.mkString(",")}]}""")
    // The COMPLETE per-query record, committed to the repo: the driver's
    // BENCH artifact keeps only a 2000-char tail, which truncates the
    // first half of the alphabet out of the public record — this file is
    // the auditable full set (per-query median + every pass's time).
    // relative to the working directory (override via env) — a
    // hardcoded absolute path would silently write into unrelated
    // checkouts on other machines
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_full.json")
    try {
      val perQuery = names.map { n =>
        val ps = passes.map(_.toMap.apply(n)).map(r2)
        "\"" + n + "\":{\"median\":" + r2(byName(n)) +
          ",\"passes\":[" + ps.mkString(",") + "]}"
      }.mkString("{", ",", "}")
      val doc =
        s"""{"sf":"$sfShort","reps":$reps,"n_queries":${results.size},
           |"total":$total,"store_write_total":$storeWriteTotal,
           |"read_only_total":$readOnlyTotal,
           |"pass_totals":[${passTotals.mkString(",")}],
           |"queries":$perQuery}""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        doc.getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: $e")
    }
    spark.stop()
  }
}
