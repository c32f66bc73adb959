package graft

import org.apache.spark.sql.SparkSession

// Throwaway local probe; not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    ev.printSchema()
    ev.show(3, truncate = false)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.printSchema()
    li.selectExpr("min(l_shipdate)", "max(l_shipdate)", "min(l_quantity)", "max(l_quantity)", "min(l_discount)", "max(l_discount)").show(false)
    spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .selectExpr("min(o_orderdate)", "max(o_orderdate)", "min(o_totalprice)", "max(o_totalprice)").show(false)
    ev.selectExpr("min(value)", "max(value)", "avg(value)").show(false)
    spark.stop()
  }
}
