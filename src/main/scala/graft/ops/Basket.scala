package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair analysis — the co-occurrence layer of the a1/a3
  * frequency reports: which items appear TOGETHER more than chance?
  * The classic apriori level-2 pass (support / confidence / lift per
  * unordered item pair), the workhorse behind "parts ordered together"
  * and co-occurring-tag analysis on a corpus.
  *
  * Scale contract: the only super-linear step is the within-basket
  * self-join, whose cost is Σ k_b² over basket sizes k_b — bounded
  * explicitly, never silently: (1) the APRIORI PRUNE runs first (an
  * item below minSupport can't be in a pair above it, so infrequent
  * items are dropped BEFORE pair formation — on a heavy-tailed item
  * distribution this removes most of the long tail); (2) baskets
  * larger than `maxBasketSize` are EXCLUDED (a degenerate mega-basket
  * would contribute k² pairs and dominate the join; the cap makes the
  * quadratic budget explicit). Everything after the pair groupBy is
  * pairs-sized, and the final top-K plans as TakeOrderedAndProject.
  */
object Basket {

  /** One row per unordered frequent pair:
    * (item_a, item_b, n_a, n_b, n_ab, support, conf_a_b, conf_b_a,
    * lift), the `topK` pairs by (n_ab desc, item_a, item_b).
    * Counts are at BASKET level (duplicates within a basket count
    * once); support = n_ab/N over the baskets that survived the size
    * cap; lift = N·n_ab/(n_a·n_b) — > 1 means the pair co-occurs more
    * than independence predicts. All ratios are fixed double trees
    * over exact longs, rounded to 6. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long = 2L, topK: Int = 50,
                maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // r14 reshape: ONE basket-keyed exchange serves the whole pipeline.
    // The explicit repartition(__b) ahead of the (b, i) dedup leaves every
    // basket-keyed step downstream — the dedup itself (clustering (b, i)
    // is satisfied by partitioning on b), the size filter, and critically
    // the within-basket self-join — exchange-free; the apriori prune and
    // the n_a/n_b decoration ride broadcasts of the (filtered) item-count
    // dictionary. The basket denominator is an in-plan broadcast scalar:
    // the former sized.count() was a SECOND action that re-executed the
    // scan + dedup before the main query even started.
    val items = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .repartition(col("__b"))
      .dropDuplicates("__b", "__i")
    val sized = items.groupBy("__b").agg(count(lit(1)).as("__k"))
      .filter(col("__k") <= maxBasketSize)
      .select("__b")
    val kept = items.join(sized, "__b")
    val nb = sized.agg(count(lit(1)).cast("double").as("__nd"))
    val itemN = kept.groupBy("__i").agg(count(lit(1)).as("__ni"))
      .filter(col("__ni") >= minSupport) // apriori: prune BEFORE pairing
    // broadcast semi prune keeps the basket partitioning (an item-count
    // dictionary is vocab-sized; at extreme vocab swap in a Bloom filter
    // per guide §3.2 — same no-false-negative contract)
    val fitems = kept.join(broadcast(itemN.select("__i")), Seq("__i"), "left_semi")
    val a = fitems.select(col("__b"), col("__i").as("item_a"))
    val b = fitems.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .join(broadcast(itemN.select(col("__i").as("item_a"),
        col("__ni").as("n_a"))), "item_a")
      .join(broadcast(itemN.select(col("__i").as("item_b"),
        col("__ni").as("n_b"))), "item_b")
    val nD = col("__nd")
    val ab = col("n_ab").cast("double")
    pairs.crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round(ab / nD, 6).as("support"),
        round(ab / col("n_a").cast("double"), 6).as("conf_a_b"),
        round(ab / col("n_b").cast("double"), 6).as("conf_b_a"),
        round((nD * ab) /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
      .orderBy(col("n_ab").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
  }
}
