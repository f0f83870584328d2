package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shuffle-free inner PK join of two keyed tables that share a bucket
  * count (and PK column types): rows of bucket `i` on both sides are
  * guaranteed co-located because both tables cluster by
  * `pmod(xxhash64(pk...), buckets)`, so the join is `buckets`
  * independent partition-local hash joins — NO exchange of either
  * table, the property that makes repeated fact↔fact joins on the
  * same key affordable at 100 TB.
  *
  * Spark's planner cannot see file-layout co-partitioning on plain
  * parquet paths (that needs a DataSource V2 reporting
  * KeyGroupedPartitioning for storage-partitioned join), so this is
  * the documented `mapPartitions`-tier operator: one RDD partition per
  * bucket per side, aligned by index, zipPartitions with an in-memory
  * hash build of the right bucket (right buckets must fit an
  * executor's memory — size the bucket count at create time
  * accordingly).
  *
  * Output: left columns + right non-PK columns (right-side name
  * collisions suffixed `_r`).
  */
object PkJoin {

  def pkJoin(spark: SparkSession, warehouse: String,
             leftTable: String, rightTable: String): DataFrame = {
    val lm = TableMeta.read(spark, KeyedTable.tableDir(warehouse, leftTable))
    val rm = TableMeta.read(spark, KeyedTable.tableDir(warehouse, rightTable))
    require(lm.buckets == rm.buckets,
      s"bucket counts differ: ${lm.buckets} vs ${rm.buckets} — co-partitioned join needs equal clustering")
    require(lm.pk.length == rm.pk.length,
      s"composite PK arity differs: ${lm.pk} vs ${rm.pk}")
    val lTypes = lm.pk.map(c => lm.schema(c).dataType)
    val rTypes = rm.pk.map(c => rm.schema(c).dataType)
    require(lTypes == rTypes,
      s"PK types differ ($lTypes vs $rTypes) — xxhash64 bucketing is type-sensitive")

    val n = lm.buckets
    val lIdx = lm.pk.map(lm.schema.fieldIndex)
    val rIdx = rm.pk.map(rm.schema.fieldIndex)
    val rKeep = rm.schema.fields.indices.filterNot(rIdx.contains)

    val leftRdd = bucketAlignedRdd(spark, warehouse, leftTable, lm, n)
    val rightRdd = bucketAlignedRdd(spark, warehouse, rightTable, rm, n)

    val joined: RDD[Row] = leftRdd.zipPartitions(rightRdd) { (ls, rs) =>
      // build on the right bucket, stream the left
      val built = new scala.collection.mutable.HashMap[List[Any], List[Row]]()
      rs.foreach { r =>
        val k = rIdx.map(r.get).toList
        built.update(k, r :: built.getOrElse(k, Nil))
      }
      ls.flatMap { l =>
        built.getOrElse(lIdx.map(l.get).toList, Nil).reverse.map { r =>
          Row.fromSeq(l.toSeq ++ rKeep.map(r.get))
        }
      }
    }

    val leftNames = lm.schema.fieldNames.toSet
    val outFields = lm.schema.fields ++ rKeep.map { i =>
      val f = rm.schema.fields(i)
      if (leftNames.contains(f.name)) f.copy(name = f.name + "_r") else f
    }
    spark.createDataFrame(joined, StructType(outFields))
  }

  /** One RDD partition per bucket, in bucket order (empty bucket dirs →
    * empty partitions, keeping both sides index-aligned). */
  private def bucketAlignedRdd(spark: SparkSession, warehouse: String,
                               table: String, meta: TableMeta, n: Int): RDD[Row] = {
    val dataDir = s"${KeyedTable.tableDir(warehouse, table)}/data"
    val fs = new Path(dataDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = (0 until n).map { b =>
      val dir = new Path(dataDir, s"${KeyedTable.BucketCol}=$b")
      if (fs.exists(dir))
        spark.read.schema(meta.schema).parquet(dir.toString).rdd.coalesce(1)
      else
        spark.sparkContext.parallelize(Seq.empty[Row], 1)
    }
    spark.sparkContext.union(parts)
  }
}
