package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Restore task parallelism for CPU-DENSE derived work stacked on a
  * LOW-SPLIT scan (r15).
  *
  * A parquet row group is the atomic split unit: a compact fixture file
  * (one row group) scans as ONE task no matter the core count or any
  * split-size conf, so every expensive derived column chained onto the
  * scan — md5 mixes, replicate explodes, exact-decimal product folds —
  * runs serially while 31 cores idle (measured: a47_bootstrap_ci ran
  * 7 jobs x 1 task with two ~2.6 s single-core md5+explode stages; the
  * p=5 Gram ridge folded 22 decimal sums over 600k rows in one task).
  *
  * [[ensure]] inserts ONE narrow exchange ahead of such work, but ONLY
  * when the frame's plan parallelism is below half the session default
  * parallelism — at data scale inputs carry many row groups, the gate
  * fails and this is the identity: no shuffle is ever added on a real
  * cluster. The exchange ships the frame BEFORE any expansion (project
  * to the needed columns first), so the bytes moved are the compact
  * form, never the exploded one (guide §2.3/§8: decide placement on
  * small rows, expand after).
  */
object Parallelism {
  /** Repartition `df` to the session default parallelism when its plan
    * parallelism is deficient (see object doc). With `keys`, a hash
    * repartition (no sort); keyless pays Spark's deterministic
    * sort-before-repartition on the (small, by the gate) input.
    * Callers must be partitioning-insensitive — aggregates, joins,
    * row-keyed hashes; never order-dependent folds. */
  def ensure(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
