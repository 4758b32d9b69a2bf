package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling (enabled in
  * Sessions.tune) covers sort-merge joins at runtime; these cover the two
  * cases AQE can't: aggregations over a hot key, and broadcast-infeasible
  * joins where one side's key distribution is pathological.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: phase 1 aggregates on
    * (key, salt) — the hot key's rows spread over `buckets` reducers —
    * phase 2 merges the partials per key. Caller supplies MERGEABLE
    * partial aggregates (sum/count/min/max; avg = sum+count merged by the
    * caller). */
  def saltedAggregate(df: DataFrame, key: String, buckets: Int,
                      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy(col(key), col("__salt")).agg(partials.head, partials.tail: _*)
    phase1.groupBy(col(key)).agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a LARGE skewed left side against a right side
    * too big to broadcast whole but small enough to replicate `buckets`
    * times: left rows get a random salt in [0, buckets); right rows are
    * exploded once per salt value. The join key becomes (key, salt) — the
    * hot key's rows land on `buckets` different reducers. */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame, key: String,
                 buckets: Int, seed: Long = 42L): DataFrame = {
    val l = skewedLeft.withColumn("__salt",
      (rand(seed) * buckets).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
