package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Diagnostic: block-key skew and candidate volume of the d22 simhash
  * banding at a given SF dir — run when the bench flags the query.
  * Usage: sbt "runMain graft.tools.ProfileSimhash /tmp/sf1 48 3" */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bits = if (args.length > 1) args(1).toInt else 48
    val maxDist = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.Sessions.local("graft-profile", cores = "16",
      shufflePartitions = "16")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 40000).as("doc_id"),
      concat(col("text"), lit(" zzz")).as("text")))
    val sigs = Dedup.simhash(docs, "text", "doc_id", bits)
    val nBlocks = maxDist + 1
    val blockBits = bits / nBlocks
    val blocked = sigs.select(col("id"), explode(array((0 until nBlocks).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("simhash"), b * blockBits)
            .bitwiseAND(lit((1L << blockBits) - 1)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("bk.blk"), col("bk.key"))
    val hot = blocked.groupBy("blk", "key").count()
    println("== hottest block keys ==")
    hot.orderBy(desc("count")).show(15, truncate = false)
    val cand = hot.agg(
      sum(col("count") * (col("count") - 1) / 2).as("pairs"),
      count(lit(1)).as("distinct_keys")).head()
    println(s"candidate pairs (sum c*(c-1)/2) = ${cand.get(0)}")
    println(s"distinct (block, key)          = ${cand.get(1)}")
    val nSig = sigs.select("simhash").distinct().count()
    println(s"docs = ${docs.count()}, distinct signatures = $nSig")
    val distinctBlocked = sigs.select("simhash").distinct()
      .select(col("simhash"), explode(array((0 until nBlocks).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("simhash"), b * blockBits)
            .bitwiseAND(lit((1L << blockBits) - 1)).as("key"))): _*)).as("bk"))
      .select(col("simhash"), col("bk.blk"), col("bk.key"))
    val dh = distinctBlocked.groupBy("blk", "key").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head()
    println(s"distinct-sig candidate pairs = ${dh.get(0)}")
    val t0 = System.nanoTime()
    val out = Dedup.simhashPairs(docs, "text", "doc_id", bits, maxDist,
      blocksPerKey = 3).count()
    println(s"blocksPerKey=3 pair count in ${(System.nanoTime()-t0)/1e9}s")
    println(s"output pairs = $out")
    spark.stop()
  }
}
