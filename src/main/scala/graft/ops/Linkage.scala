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
    * (also passed to the expression so the DP loop can exit early). */
  def bestMatches(dirty: DataFrame, clean: DataFrame,
                  dirtyId: String, dirtyName: String,
                  cleanId: String, cleanName: String,
                  blockDirty: Column, blockClean: Column,
                  maxDist: Int): DataFrame = {
    val d = dirty.select(col(dirtyId).as("dirty_id"),
      col(dirtyName).as("__dn"), blockDirty.as("__blk"))
    val c = clean.select(col(cleanId).as("__cid"),
      col(cleanName).as("__cn"), blockClean.as("__blk"))
    // threshold-bounded Levenshtein: the DP early-exits once the
    // distance provably exceeds maxDist (returns -1) — O(len * maxDist)
    // per pair instead of O(len^2), the difference that matters on long
    // fields at corpus scale
    d.join(c, "__blk")
      .withColumn("__dist", levenshtein(col("__dn"), col("__cn"), maxDist))
      .filter(col("__dist") >= 0)
      .groupBy("dirty_id")
      .agg(min(struct(col("__dist"), col("__cid"))).as("__w"))
      .select(col("dirty_id"), col("__w.__cid").as("match_id"),
        col("__w.__dist").as("dist"))
  }
}
