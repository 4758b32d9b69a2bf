package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Hybrid-retrieval assembly: rank lists from different scorers (BM25
  * lexical, embedding ANN) fused by Reciprocal Rank Fusion (Cormack,
  * Clarke & Büttcher 2009) — the standard no-tuning way to combine
  * retrieval signals for RAG-style corpus search.
  *
  * Scale: inputs are already top-k rank lists (k rows each, corpus
  * scans happened upstream in the scorers), so fusion is a join of two
  * k-row frames — driver-trivial at any corpus size. Rank lists built
  * with [[Ordinals.withGlobalRank]] keep the no-keyless-window rule.
  */
object Retrieval {

  /** Attach a 1-based rank under (`score` desc, id asc) — pre-rounded
    * scores (the t12 rule) keep ranks engine-replayable — and keep the
    * top `k`. */
  def rankBy(df: DataFrame, idCol: String, scoreCol: String,
             k: Int): DataFrame =
    Ordinals.withGlobalRank(df,
        Seq(col(scoreCol).desc, col(idCol).asc), "rank")
      .filter(col("rank") <= k)

  /** RRF: `fused(id) = Σ_lists 1/(k0 + rank_list(id))`, absent lists
    * contribute 0; top `k` by (fused desc, id). Both inputs are
    * (idCol, rank) frames. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              k0: Int = 60): DataFrame = {
    def contrib(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol),
        (lit(1.0) / (lit(k0.toDouble) + col("rank").cast(DoubleType))).as(out))
    contrib(a, "__ra").join(contrib(b, "__rb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        round(coalesce(col("__ra"), lit(0.0)) + coalesce(col("__rb"), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
