package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.TableOp

/** String-hashing ops (SURVEY §2.6 H1-H6,
  * reference `preprocessing/hashing_methods_ui.py:285-433`).
  *
  * All hashes are pure column expressions (whole-stage codegen, no UDFs,
  * no shuffle): at 100 TB each is a map-only pass. Where the reference
  * relies on Python's session-unstable `hash()` (H1, H4) we substitute a
  * STABLE hash (Murmur3 / md5-derived) — an intentional improvement the
  * reference itself flags as a weakness (`hashing_methods_ui.py:412`).
  */
object Hashing {

  /** 60-bit integer from the first 15 hex chars of md5 — reproducible in
    * any engine (DuckDB: CAST('0x'||substring(md5(c),1,15) AS BIGINT)). */
  def md5Int(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  /** 60-bit integer from the first 15 hex chars of sha256. */
  def sha256Int(c: Column): Column =
    conv(substring(sha2(c.cast(StringType), 256), 1, 15), 16, 10).cast(LongType)

  /** Sum of character code points (reference H4 "embedding" component,
    * `hashing_methods_ui.py:301-307`) — the native codegen'd
    * [[graft.functions.UnicodeSum]] expression (registered as SQL
    * `unicode_sum` by GraftExtensions); the interpreted higher-order
    * `aggregate(split(...), ...)` form it replaces ran per-character. */
  def codepointSum(c: Column): Column =
    call_function("unicode_sum", c.cast(StringType))

  /** H1 — simple modular hash: pmod(murmur3, n). Stable replacement for the
    * reference's `hash(value) % 2^31 % n`. */
  case class SimpleHash(c: String, n: Int, out: Option[String] = None) extends TableOp {
    def describe = s"simple hash $c mod $n"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(out.getOrElse(c + "_hashed"),
        pmod(hash(col(c).cast(StringType)), lit(n)).cast(LongType))
  }

  /** H2 — feature hashing: int(md5(v)[:15],16) % n (`…:291-294`). */
  case class FeatureHash(c: String, n: Int, out: Option[String] = None) extends TableOp {
    def describe = s"feature hash $c mod $n"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(out.getOrElse(c + "_hashed"), pmod(md5Int(col(c)), lit(n.toLong)))
  }

  /** H3 — one-hot + hash: alphabetical label code, then H2 of the code's
    * string form (`…:296-300`). */
  case class OneHotHash(c: String, n: Int, out: Option[String] = None) extends TableOp {
    def describe = s"one-hot hash $c mod $n"
    def apply(df: DataFrame): DataFrame = {
      val dict = Encoding.labelDictionary(df, c)
      df.join(broadcast(dict), Seq(c), "left")
        .withColumn(out.getOrElse(c + "_hashed"),
          pmod(md5Int(col("__code").cast(StringType)), lit(n.toLong)))
        .drop("__code")
    }
  }

  /** H4 — "embedding" hash: (codepoint_sum % 2^31 + md5Int(v)) % n
    * (`…:301-307`, with md5Int replacing unstable Python hash). */
  case class EmbeddingHash(c: String, n: Int, out: Option[String] = None) extends TableOp {
    def describe = s"embedding hash $c mod $n"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(out.getOrElse(c + "_hashed"),
        pmod(pmod(codepointSum(col(c)), lit(2147483648L)) + md5Int(col(c)), lit(n.toLong)))
  }

  /** H5 — universal hash ((a·x + b) mod p) mod n with p = 2^31-1 and
    * x = sha256-derived, reduced mod p first so a·x stays in 64 bits
    * (`…:308-313`; a,b fixed instead of per-session random — determinism). */
  case class UniversalHash(c: String, n: Int, a: Long = 1103515245L, b: Long = 12345L,
                           out: Option[String] = None) extends TableOp {
    private val p = 2147483647L
    def describe = s"universal hash $c mod $n"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(out.getOrElse(c + "_hashed"),
        pmod(pmod(lit(a) * pmod(sha256Int(col(c)), lit(p)) + lit(b), lit(p)), lit(n.toLong)))
  }

  /** H6 — count-min sketch frequency estimate appended as a column
    * (`…:314-319,422-433`). The sketch is built driver-side from the column
    * (one pass, mergeable partial sketches — scales like an aggregate) and
    * broadcast into a lookup. */
  case class CountMinFreq(c: String, eps: Double = 0.0001, confidence: Double = 0.99,
                          seed: Int = 42, out: Option[String] = None) extends TableOp {
    def describe = s"count-min frequency of $c"
    def apply(df: DataFrame): DataFrame = {
      val sketch = df.stat.countMinSketch(col(c).cast(StringType), eps, confidence, seed)
      val est = udf((v: String) => if (v == null) 0L else sketch.estimateCount(v))
      df.withColumn(out.getOrElse(c + "_cms_count"), est(col(c).cast(StringType)))
    }
  }
}
