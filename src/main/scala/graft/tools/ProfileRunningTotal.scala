package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch: measure Ordinals.withRunningTotal (now the custom
  * RunningTotalExec — zero extra exchange, Tungsten rows) against a
  * DataFrame window variant (per-partition window — one extra full
  * exchange). Evidence for SCALING.md's prefix-sum row. */
object ProfileRunningTotal {

  def dfVariant(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                out: String): DataFrame = {
    val w0 = org.apache.spark.sql.expressions.Window
      .orderBy("__pid").rowsBetween(Long.MinValue, -1)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("__mid")
    val sorted = df.orderBy(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val offsets = sorted.groupBy("__pid")
      .agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__off", coalesce(sum("__psum").over(w0), lit(0.0)))
      .select("__pid", "__off")
    sorted.join(broadcast(offsets), "__pid")
      .withColumn(out, sum(col(valueCol)).over(wp) + col("__off"))
      .drop("__pid", "__mid", "__off")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile-rt", cores = "32",
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val sortCols = Seq(col("l_orderkey").asc, col("l_linenumber").asc)
    li.count() // warm scan cache
    def time(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f.agg(max("run")).collect()(0).getDouble(0)
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (max=$n)")
      }
    }
    time("exec")(graft.ops.Ordinals.withRunningTotal(li, sortCols, "l_quantity", "run"))
    time("df ")(dfVariant(li, sortCols, "l_quantity", "run"))
    spark.stop()
  }
}
