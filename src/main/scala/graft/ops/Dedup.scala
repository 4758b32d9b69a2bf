package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the O(n^2) cross join. Candidate
  * pairs come from an inverted-index/banding SHUFFLE JOIN on a short key
  * (shingle, LSH band, simhash block); only candidates are verified
  * exactly. That is the standard web-scale recipe: the shuffle volume is
  * O(docs x shingles) with heavy-key pruning, never O(n^2).
  */
object Dedup {

  /** Exact dedup: canonical row = min(idCol) per identical `textCol`
    * (hash-partition on the text hash, not the text itself). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word n-gram shingles of a text column (array form — the
    * interpreted-lambda path; fine for small frames and the specs'
    * reference semantics). The SCALE path is [[shingleRows]]. */
  def shingles(c: Column, n: Int): Column = {
    val toks = Text.tokens(c)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Distinct shingles as EXPLODED rows (id, sh): posexplode the tokens,
    * build each shingle with window `lead`s over (id, pos) — every step
    * whole-stage codegen except one id-partitioned window shuffle.
    * Profiling at sf0.1: the array-lambda form above took 6.7 s of the
    * minhash pipeline; this shape is the fix. Documents shorter than n
    * tokens contribute their whole text as one shingle (same semantics as
    * `shingles`). */
  def shingleRows(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val tok = df.select(col(idCol).as("id"), toks.as("__toks"))
      .withColumn("__nt", size(col("__toks")))
    val long = tok.filter(col("__nt") >= n)
      .select(col("id"), posexplode(col("__toks")).as(Seq("__pos", "__t")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("__pos")
    val leads = (1 until n).map(j => lead(col("__t"), j).over(w))
    val shingled = long
      .withColumn("sh", concat_ws(" ", (col("__t") +: leads): _*))
      .withColumn("__full", if (n > 1) leads.last.isNotNull else lit(true))
      .filter(col("__full")) // window exprs must be projected before WHERE
      .select("id", "sh")
    val short = tok.filter(col("__nt") < n)
      .select(col("id"), concat_ws(" ", col("__toks")).as("sh"))
    shingled.unionByName(short).dropDuplicates("id", "sh")
  }

  /** Candidate pairs sharing >=1 shingle, with exact Jaccard similarity.
    * Inverted index: explode shingles -> self-join on shingle -> count
    * common per pair -> Jaccard from per-doc shingle counts.
    * `maxDocsPerShingle` prunes stop-shingles (a shingle shared by half
    * the corpus generates quadratic pairs but never decides near-dup). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String, n: Int,
                        threshold: Double, maxDocsPerShingle: Int = 1000): DataFrame = {
    // join key = 60-bit md5 of the shingle: an 8-byte shuffle key instead
    // of the n-word string (collision odds ~ |shingles|^2 / 2^60 — nil)
    val sh = shingleRows(df, textCol, idCol, n)
      .select(col("id"), Hashing.md5Int(col("sh")).as("sh"))
    // cached: feeds both self-join sides and the size aggregate (same
    // app-scoped-cache note as minhashLshPairs)
    val pruned = sh.withColumn("__df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("__df") <= maxDocsPerShingle).drop("__df")
      .persist()
    // sizes over the PRUNED universe: Jaccard is then consistent with the
    // pair-common counts (stop-shingles are removed from the feature set,
    // not just from the join)
    val sizes = pruned.groupBy("id").agg(count(lit(1)).as("n_sh")) // shingles are distinct already
    val common = pruned.as("a").join(pruned.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard", col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: k permutations h_i(x) = (a_i * md5Int(x) + b_i) mod p,
    * signature element i = min over shingles. Deterministic params from a
    * seeded LCG so any engine can reproduce them. */
  val MinhashP = 2147483647L
  def minhashParams(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % (MinhashP - 1)) + 1 }
    Seq.fill(k)((next(), next()))
  }

  /** Array-column signature (small-data convenience; the lambda path is
    * interpreted). The SCALE path is [[minhashSignatures]] below. */
  def minhashSignature(shinglesCol: Column, k: Int, seed: Long = 42L): Column = {
    val params = minhashParams(k, seed)
    val hashed = transform(shinglesCol, x => pmod(Hashing.md5Int(x), lit(MinhashP)))
    array(params.map { case (a, b) =>
      array_min(transform(hashed, h => pmod(lit(a) * h + lit(b), lit(MinhashP))))
    }: _*)
  }

  /** Signatures over EXPLODED (id, sh) shingle rows via k min-aggregates:
    * md5 runs ONCE per (doc, shingle) inside whole-stage codegen, the k
    * permutations are plain modular arithmetic, and the only shuffle is
    * the groupBy(id) — map-side partial min-aggregation, the shape that
    * scales. Returns (id, sig). */
  def minhashSignatures(shingleRows: DataFrame, idCol: String, k: Int,
                        seed: Long = 42L): DataFrame = {
    val params = minhashParams(k, seed)
    val ex = shingleRows
      .withColumn("__h", pmod(Hashing.md5Int(col("sh")), lit(MinhashP)))
    val aggs = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("__h") + lit(b), lit(MinhashP))).as(s"__m$i")
    }
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup pairs: signatures banded into `bands` groups of
    * `rowsPerBand`; pairs sharing any band key are verified with exact
    * Jaccard and filtered at `threshold`. Shuffle key = (band index, band
    * hash) — short and uniform. */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String, n: Int,
                      bands: Int, rowsPerBand: Int, threshold: Double,
                      seed: Long = 42L): DataFrame = {
    val k = bands * rowsPerBand
    // cached because it feeds three consumers (signatures, sizes, verify);
    // app-scoped — a long-lived session running many corpora should
    // spark.catalog.clearCache() between runs
    val exploded = shingleRows(df, textCol, idCol, n).persist()
    val sizes = exploded.groupBy("id").agg(count(lit(1)).as("n_sh"))
    // banding carries ONLY (id, band, key)
    val banded = minhashSignatures(exploded, "id", k, seed)
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).as("key"))))
          .as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact verify anchored on the candidate PAIRS (a shingle self-join
    // would blow up quadratically on hot shingles): expand each pair with
    // the a-side shingles, then match b-side shingles on (id_b, hash)
    val hashed = exploded.select(col("id"), Hashing.md5Int(col("sh")).as("__h"))
    val withA = cand.join(hashed.withColumnRenamed("id", "id_a"), "id_a")
    val common = withA.join(hashed.withColumnRenamed("id", "id_b"),
        Seq("id_b", "__h"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard", col("common").cast(DoubleType) /
        (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash: `bits`-wide signature; bit j set iff the sum over tokens of
    * (+1 if bit j of md5Int(token) else -1) is positive. One explode +
    * one groupBy — linear shuffle. */
  def simhash(df: DataFrame, textCol: String, idCol: String, bits: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(Text.tokens(col(textCol))).as("t"))
      .withColumn("h", Hashing.md5Int(col("t")))
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j"))
    val agg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs at Hamming distance <= maxDist. Candidate
    * generation: split the signature into maxDist+1 blocks — any pair
    * within distance must agree on >=1 whole block (pigeonhole); join on
    * (block index, block value), verify exact popcount. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String, bits: Int,
                   maxDist: Int): DataFrame = {
    val sigs = simhash(df, textCol, idCol, bits)
    val nBlocks = maxDist + 1
    val blockBits = bits / nBlocks
    val blocked = sigs.select(col("id"), col("simhash"),
      explode(array((0 until nBlocks).map(b => struct(lit(b).as("blk"),
        shiftrightunsigned(col("simhash"), b * blockBits)
          .bitwiseAND(lit((1L << blockBits) - 1)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.blk"), col("bk.key"))
    val popcount = (c: Column) => {
      // 64-bit popcount via bit_count
      bit_count(c)
    }
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", popcount(col("ha").bitwiseXOR(col("hb"))).cast(LongType))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding cosine near-dup pairs above `threshold`.
    * `Similarity.cosine` does the arithmetic; candidate generation here is
    * the sign-LSH band join (random-hyperplane sketch) — brute force only
    * when `lshPlanes == 0`. */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
                  threshold: Double, lshPlanes: Int = 0, seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    if (lshPlanes <= 0)
      v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
        .filter(col("cosine") >= threshold)
    else {
      // scale path: codegen'd sketches for candidates, codegen'd
      // exploded-join cosine for verification — no interpreted lambdas
      // on the hot path
      val sk = Similarity.signSketchDf(v, "id", "v", lshPlanes, seed)
      val cand = sk.as("a").join(sk.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      Similarity.cosineForPairs(cand, v, "id", "v")
        .filter(col("cosine") >= threshold)
    }
  }
}
