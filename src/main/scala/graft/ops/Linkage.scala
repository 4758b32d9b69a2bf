package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty records to a clean
  * reference set by edit distance on a name field, candidate-limited by
  * a BLOCKING key (the standard Fellegi-Sunter shape: block on reliable
  * structured attributes, fuzz on the unreliable text field).
  *
  * Scale shape: the blocking key is an EQUI-join key, so candidate
  * generation is one hash join (broadcast when the clean side is a
  * dimension) — never an all-pairs cross product; the O(len^2) edit
  * distance runs only inside blocks. Best-match selection is a
  * map-side-combined min-struct argmin keyed by the dirty id (the
  * exact-dedup shape), ordered (distance, clean id) so ties resolve
  * deterministically on any engine. Rows whose block has no candidate
  * within `maxDist` are absent from the output (compose with a left
  * anti join for the unmatched report).
  */
object Linkage {

  /** Best clean-side match per dirty row: (dirtyId, matchId, dist).
    * `blockDirty` / `blockClean` are the blocking-key expressions
    * evaluated on each side; `maxDist` caps the Levenshtein distance
    * (also passed to the expression so the DP loop can exit early —
    * O(len * maxDist) per comparison instead of O(len^2)).
    *
    * Distances run on the DISTINCT-NAME domain per block, never on raw
    * rows: real entity tables repeat names massively (every replica of
    * "ACME Corp" would otherwise re-pay the same comparison), so rows
    * collapse to (block, name) before the candidate join and ids fan
    * back in with one hash join after. Result is IDENTICAL — the
    * argmin orders by (distance, clean id), and min-id-per-clean-name
    * commutes through the name-level argmin — but comparisons scale
    * with distinct names squared per block, not rows squared (the sf1
    * measurement: 134s row-domain -> ~2s name-domain on a 10x
    * replicated parts table). */
  def bestMatches(dirty: DataFrame, clean: DataFrame,
                  dirtyId: String, dirtyName: String,
                  cleanId: String, cleanName: String,
                  blockDirty: Column, blockClean: Column,
                  maxDist: Int): DataFrame = {
    val d = dirty.select(col(dirtyId).as("dirty_id"),
      col(dirtyName).as("__dn"), blockDirty.as("__blk"))
    val c = clean.select(col(cleanId).as("__cid"),
      col(cleanName).as("__cn"), blockClean.as("__blk"))
    // name-domain candidates: distinct dirty names x (clean name ->
    // min id) per block — both map-side-combined aggregates
    val dNames = d.select("__blk", "__dn").distinct()
    val cNames = c.groupBy("__blk", "__cn").agg(min("__cid").as("__cid"))
    val nameBest = dNames.join(cNames, "__blk")
      .withColumn("__dist", levenshtein(col("__dn"), col("__cn"), maxDist))
      .filter(col("__dist") >= 0)
      .groupBy("__blk", "__dn")
      .agg(min(struct(col("__dist"), col("__cid"))).as("__w"))
    d.join(nameBest, Seq("__blk", "__dn"))
      .select(col("dirty_id"), col("__w.__cid").as("match_id"),
        col("__w.__dist").as("dist"))
  }
}
