package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point registering the engine's native
  * expressions (`unicode_sum`, `dot_product`). Wire up with
  * `.withExtensions(new GraftExtensions)` (done in Sessions) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("unicode_sum"),
      new ExpressionInfo(classOf[UnicodeSum].getName, "unicode_sum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "unicode_sum takes exactly one argument")
        UnicodeSum(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "dot_product takes exactly two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "jaro_winkler takes exactly two arguments")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "damerau_levenshtein takes exactly two arguments")
        DamerauLevenshtein(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "simhash64 takes (tokens, bits)")
        SimHash64(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("ngram_stats"),
      new ExpressionInfo(classOf[NgramStats].getName, "ngram_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "ngram_stats takes (tokens, n)")
        NgramStats(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "fingerprint64 takes exactly one argument")
        Fingerprint64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_minhashes"),
      new ExpressionInfo(classOf[KmvMinHashes].getName, "kmv_minhashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "kmv_minhashes takes (col, k)")
        KmvMinHashes(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllDistinct].getName, "hll_distinct"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "hll_distinct takes (col, p)")
        HllDistinct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "topk_pairs takes (dist, id, k)")
        TopKPairs(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs_tag"),
      new ExpressionInfo(classOf[TopKPairsTag].getName, "topk_pairs_tag"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4, "topk_pairs_tag takes (dist, id, tag, k)")
        TopKPairsTag(children.head, children(1), children(2), children(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "kll_quantiles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "kll_quantiles takes (col, k, probs)")
        KllQuantiles(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantiles_w"),
      new ExpressionInfo(classOf[KllQuantilesWeighted].getName,
        "kll_quantiles_w"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4,
          "kll_quantiles_w takes (col, weight, k, probs)")
        KllQuantilesWeighted(children.head, children(1), children(2),
          children(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "misra_gries takes (col, k)")
        MisraGries(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("z_order"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "z_order"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "z_order takes exactly two arguments")
        ZOrderKey(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("count_in"),
      new ExpressionInfo(classOf[CountIn].getName, "count_in"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "count_in takes exactly two arguments")
        CountIn(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("clean_lines"),
      new ExpressionInfo(classOf[CleanLines].getName, "clean_lines"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "clean_lines takes (text, minWords, requireTerminal)")
        CleanLines(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "char_entropy takes exactly one argument")
        CharEntropy(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "nfc_normalize takes exactly one argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "quantize_i8 takes (vec, scale)")
        QuantizeI8(children.head, children(1))
      }))
    // Spark's own runtime-filter bloom expressions, surfaced as callable
    // functions (4.1 ships them for join runtime filters but registers no
    // SQL names): bloom_agg(longCol[, items[, bits]]) -> binary filter,
    // bloom_might_contain(filterBinary, longCol) -> boolean. Both are
    // codegen-participating catalyst expressions — the probe side is a
    // map-only predicate, the shape a 100 TB semi-join prune needs.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children.size match {
          case 1 => new BloomFilterAggregate(children.head)
          case 2 => new BloomFilterAggregate(children.head, children(1))
          case 3 => new BloomFilterAggregate(children.head, children(1), children(2))
          case n => throw new IllegalArgumentException(
            s"bloom_agg takes (value[, estimatedItems[, numBits]]), got $n args")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "bpe_token_count takes (text, merges)")
        BpeTokenCount(children.head, children(1))
      }))
    // probe side is OUR expression, not Spark's BloomFilterMightContain:
    // the built-in's codegen assumes a scalar-subquery filter child and
    // falls back to the interpreter on a binary literal — see
    // [[BloomContains]] for the hot-path rationale.
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "bloom_might_contain takes (filter, value)")
        BloomContains(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "bpe_encode takes (text, merges)")
        BpeEncode(children.head, children(1))
      }))
    // row-local shingle hashing + array bloom probe: together they make
    // decontamination a fully MAP-ONLY (and therefore streaming-safe)
    // pipeline — no explode, no groupBy, no shuffle.
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "shingle_hashes takes (text, n)")
        ShingleHashes(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_count_in"),
      new ExpressionInfo(classOf[BloomCountIn].getName, "bloom_count_in"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "bloom_count_in takes (filter, values)")
        BloomCountIn(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "pq_adc takes (codes, lut)")
        PqAdc(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "pq_encode takes (vec, cents, m)")
        PqEncode(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "pq_lut takes (vec, cents, m)")
        PqLut(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "winnow_fps takes (text, k, w)")
        WinnowFps(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_decode"),
      new ExpressionInfo(classOf[BpeDecode].getName, "bpe_decode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "bpe_decode takes (ids, merges)")
        BpeDecode(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dsir_score"),
      new ExpressionInfo(classOf[DsirScore].getName, "dsir_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "dsir_score takes (text, lut)")
        DsirScore(children.head, children(1))
      }))
    // whole-operator nodes (custom LogicalPlan -> SparkPlan)
    ext.injectPlannerStrategy(_ => graft.plans.RunningTotalStrategy)
  }
}
