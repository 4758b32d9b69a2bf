package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("interleave: hand-checked bit placement, 32-bit masking") {
    assert(ZOrderKey.interleave(0L, 0L) == 0L)
    assert(ZOrderKey.interleave(3L, 0L) == 5L)    // x bits -> even positions
    assert(ZOrderKey.interleave(0L, 3L) == 10L)   // y bits -> odd positions
    assert(ZOrderKey.interleave(5L, 3L) == 27L)   // 10011011b = 17 | 10
    // only the low 32 bits of each input participate
    assert(ZOrderKey.interleave(1L << 32, 0L) == 0L)
    assert(ZOrderKey.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L,
      "full 32+32 bits fill all 64 key bits")
  }

  test("z_order is SQL-callable and participates in codegen") {
    import spark.implicits._
    val r = spark.sql("SELECT z_order(5L, 3L)").head().getLong(0)
    assert(r == 27L)
    // spark.range keeps the expression un-foldable; the starred prefix
    // marks operators inside a WholeStageCodegen stage
    val plan = spark.range(100)
      .select(call_function("z_order", col("id"), col("id") + 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [z_order"), plan)
  }

  test("z layout prunes a full-width narrow-height box; x sort cannot") {
    import spark.implicits._
    // 64x64 grid; box = ALL x, y in [0,4) — the case a 1-D sort cannot
    // prune. Count distinct partitions holding matches under each layout.
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    def touched(laid: org.apache.spark.sql.DataFrame): Long =
      laid.withColumn("__pid", spark_partition_id())
        .filter(col("y") < 4).select("__pid").distinct().count()
    val xSorted = grid.repartitionByRange(16, col("x"))
    val zLaid = graft.io.Bucketing.zorderLayout(grid, "x", "y", 16)
    val (tx, tz) = (touched(xSorted), touched(zLaid))
    assert(tx == 16, s"x-sorted layout spreads the box everywhere: $tx")
    assert(tz < tx && tz <= 8, s"z layout must confine the box, touched $tz")
  }
}
