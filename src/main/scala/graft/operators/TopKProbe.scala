package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopK
import org.apache.spark.sql.GraftBridge

object TopKProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1, 0.9, 10L), (1, 0.8, 11L), (1, 0.9, 12L), (1, 0.7, 13L),
                 (2, 0.5, 20L), (2, 0.6, 21L)).toDF("q", "cos", "id")
    val elem = struct(col("cos"), (-col("id")).as("_nt"), col("id"))
    def agg(rev: Boolean) = GraftBridge.column(
      GraftTopK.collectTopK(GraftBridge.expression(elem), 2, rev))
    val r = df.groupBy("q").agg(agg(false).as("f"), agg(true).as("t"))
    r.show(false)
  }
}
