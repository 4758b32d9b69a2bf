package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained-tokenizer BPE: a merges table (the standard one-merge-per-
  * line "left right" text format tokenizer toolkits ship) trained,
  * saved, loaded, and APPLIED as a map-only native expression
  * (`bpe_token_count` — [[graft.functions.BpeTokenCount]]).
  *
  * Scale contract: TRAINING is driver-side over a bounded corpus
  * sample — the standard production shape (a tokenizer is trained once,
  * offline, on a sample; nobody BPE-trains on 100 TB), and the sample
  * collect is explicitly capped. APPLYING is the distributed hot path:
  * the merges table broadcasts as a literal into whole-stage codegen,
  * one pass, no shuffle, no UDF. Char-level pairs (a documented
  * simplification of byte-level GPT-2 BPE; no reference analogue —
  * extension surface for [[Corpus.packSequences]] token budgets).
  */
object Bpe {

  /** Same pre-tokenizer as [[Text.bpeTokenCount]]'s approximation:
    * letter/digit runs and single punctuation marks. */
  private val WordPattern = Pattern.compile(Text.BpeTokenPattern)

  // ---- byte-level alphabet (GPT-2 encoder.py scheme, public) ----

  /** Byte -> printable-unicode symbol: printable ASCII/Latin-1 bytes map
    * to themselves, the rest shift to 256+n — every possible byte gets a
    * distinct, visible, whitespace-free char, so merges tables stay
    * plain text and ANY input (any script, emoji, broken UTF-8) is
    * covered by the 256 base symbols with no unknown-token case. */
  private[ops] val ByteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  /** UTF-8 bytes of a pre-token piece as the byte-symbol string BPE
    * merges operate on in byte-level mode. */
  private[ops] def toByteSymbols(word: String): String = {
    val bytes = word.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(ByteToChar(b & 0xFF)))
    sb.toString
  }

  /** Header line that marks a merges table as byte-level; rides the
    * standard `#`-comment lane so char-level loaders skip it. */
  val ByteLevelHeader = "#byte_level"

  def isByteLevel(merges: String): Boolean =
    merges.split("\n").exists(_.trim == ByteLevelHeader)

  // ---- merges table I/O (driver-side artifact) ----

  def saveMerges(path: String, merges: Seq[(String, String)],
                 byteLevel: Boolean = false): Unit =
    Files.write(Paths.get(path),
      ((if (byteLevel) Seq(ByteLevelHeader) else Seq.empty) ++
        merges.map { case (a, b) => s"$a $b" }).asJava, StandardCharsets.UTF_8)

  /** Whether a saved merges table was trained byte-level. */
  def loadIsByteLevel(path: String): Boolean =
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala
      .exists(_.trim == ByteLevelHeader)

  /** Lines "left right"; `#`-prefixed header lines (the usual
    * `#version:` stamp) and blanks are skipped. */
  def loadMerges(path: String): Seq[(String, String)] =
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala.toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }

  /** Serialize merges for the `bpe_token_count` literal argument; the
    * byte-level flag travels as the [[ByteLevelHeader]] comment line so
    * the expression needs no extra argument. */
  def mergesToString(merges: Seq[(String, String)],
                     byteLevel: Boolean = false): String =
    ((if (byteLevel) Seq(ByteLevelHeader) else Seq.empty) ++
      merges.map { case (a, b) => s"$a $b" }).mkString("\n")

  /** Rank map "a b" -> merge priority (line order). */
  def parseRanks(merges: String): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var rank = 0
    merges.split("\n").foreach { l =>
      val line = l.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        m.put(line, rank)
        rank += 1
      }
    }
    m
  }

  // ---- apply (the distributed path) ----

  /** Token count of one text under the rank map: pre-tokenize, then
    * per word repeatedly merge the lowest-rank adjacent pair. Called
    * from the expression's codegen — one tight JVM loop per row. */
  def countTokens(text: String, ranks: java.util.HashMap[String, Integer]): Long = {
    var total = 0L
    val m = WordPattern.matcher(text)
    while (m.find()) total += countWord(m.group(), ranks)
    total
  }

  /** Byte-level twin of [[countTokens]]: pre-tokenize on TEXT (the GPT-2
    * order — the word pattern sees chars, not bytes), then merge over
    * each piece's byte symbols. Also called from the expression's
    * codegen. */
  def countTokensByte(text: String, ranks: java.util.HashMap[String, Integer]): Long = {
    var total = 0L
    val m = WordPattern.matcher(text)
    while (m.find()) total += countWord(toByteSymbols(m.group()), ranks)
    total
  }

  private def countWord(word: String, ranks: java.util.HashMap[String, Integer]): Int =
    partsOf(word, ranks).size

  /** The merged symbol sequence of one pre-token piece — the shared
    * kernel of counting ([[countTokens]]) and encoding
    * ([[encodeTokens]]). */
  private[ops] def partsOf(word: String,
                           ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    var parts = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { parts.add(String.valueOf(word.charAt(i))); i += 1 }
    if (word.length <= 1) return parts
    var done = false
    while (!done && parts.size > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < parts.size - 1) {
        val r = ranks.get(parts.get(j) + " " + parts.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        // merge EVERY occurrence of the winning pair left to right
        val a = parts.get(bestIdx)
        val b = parts.get(bestIdx + 1)
        val next = new java.util.ArrayList[String](parts.size)
        var k = 0
        while (k < parts.size) {
          if (k < parts.size - 1 && parts.get(k) == a && parts.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(parts.get(k)); k += 1 }
        }
        parts = next
      }
    }
    parts
  }

  /** Parse a merges-table string (the `mergesToString` format) back to
    * pairs — `#` header lines and blanks skipped. */
  def parseMerges(merges: String): Seq[(String, String)] =
    merges.split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }

  /** Token-id sequence of one text under a rank map + vocab id map —
    * the encode twin of [[countTokens]]/[[countTokensByte]], called
    * from the `bpe_encode` expression's codegen. A symbol absent from
    * the vocab encodes as -1 (possible only in char-level mode on
    * chars outside the merge alphabet; the byte-level base covers
    * every input). */
  def encodeTokens(text: String, ranks: java.util.HashMap[String, Integer],
                   vocab: java.util.HashMap[String, java.lang.Long],
                   byteLevel: Boolean): Array[Long] = {
    val out = new java.util.ArrayList[java.lang.Long]()
    val m = WordPattern.matcher(text)
    while (m.find()) {
      val piece = if (byteLevel) toByteSymbols(m.group()) else m.group()
      val parts = partsOf(piece, ranks)
      var i = 0
      while (i < parts.size) {
        val id = vocab.get(parts.get(i))
        out.add(if (id == null) -1L else id.longValue())
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    arr
  }

  /** [[vocab]] as the fast JVM lookup the encode kernel needs. */
  def vocabMap(merges: Seq[(String, String)],
               byteLevel: Boolean): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab(merges, byteLevel).foreach { case (t, id) => m.put(t, id) }
    m
  }

  /** Column form: token-id array of `textCol` (native `bpe_encode`). */
  def encode(textCol: Column, merges: Seq[(String, String)],
             byteLevel: Boolean = false): Column =
    call_function("bpe_encode", textCol, lit(mergesToString(merges, byteLevel)))

  /** Column form: token count of `textCol` under a trained merges
    * table (constant — ships inside the codegen plan). */
  def tokenCount(textCol: Column, merges: Seq[(String, String)],
                 byteLevel: Boolean = false): Column =
    call_function("bpe_token_count", textCol, lit(mergesToString(merges, byteLevel)))

  /** Column form: decode a token-id array back to text (native
    * `bpe_decode`) — the inverse of [[encode]] up to the pre-tokenizer:
    * `decode(encode(t))` equals the CONCATENATION of t's pre-token
    * pieces (whitespace between pieces is not encoded, so it cannot
    * come back). */
  def decode(idsCol: Column, merges: Seq[(String, String)],
             byteLevel: Boolean = false): Column =
    call_function("bpe_decode", idsCol, lit(mergesToString(merges, byteLevel)))

  /** Reverse vocabulary: token string per id, id order. */
  def idTokens(merges: Seq[(String, String)], byteLevel: Boolean): Array[String] =
    vocab(merges, byteLevel).map(_._1).toArray

  /** Symbol char -> original byte (inverse of [[ByteToChar]]); -1 for
    * chars outside the byte alphabet. */
  private[ops] val CharToByte: Array[Int] = {
    val arr = Array.fill(256 + 70)(-1)
    (0 until 256).foreach(b => arr(ByteToChar(b).toInt) = b)
    arr
  }

  /** Decode kernel: ids -> token strings -> (byte-level) UTF-8 bytes.
    * Out-of-range ids (the char-level -1 unknown) decode to nothing. */
  def decodeTokens(ids: Array[Long], toks: Array[String],
                   byteLevel: Boolean): String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (id >= 0 && id < toks.length) sb.append(toks(id.toInt))
      i += 1
    }
    if (!byteLevel) sb.toString
    else {
      val s = sb.toString
      val bytes = new Array[Byte](s.length)
      var j = 0
      while (j < s.length) {
        val b = if (s.charAt(j) < CharToByte.length) CharToByte(s.charAt(j).toInt) else -1
        bytes(j) = (if (b < 0) '?'.toInt else b).toByte
        j += 1
      }
      new String(bytes, StandardCharsets.UTF_8)
    }
  }

  /** [[idTokens]] boxed for codegen reference objects. */
  def idTokensArray(mergesText: String): Array[String] =
    idTokens(parseMerges(mergesText), isByteLevel(mergesText))

  // ---- vocabulary emission ----

  /** The (token, id) vocabulary a merges table implies, GPT-2
    * convention: base alphabet first, then one token per merge in rank
    * order. Byte-level: base = the 256 byte symbols in byte order —
    * complete coverage of any input is guaranteed. Char-level: base =
    * the sorted distinct single chars appearing in the merge parts (the
    * table carries no other alphabet record). A merge result that
    * collides with an existing token (t+he == th+e == 'the') keeps the
    * FIRST id — ids stay contiguous, size can undershoot
    * 256 + numMerges. */
  def vocab(merges: Seq[(String, String)], byteLevel: Boolean): Seq[(String, Long)] = {
    val base: Seq[String] =
      if (byteLevel) ByteToChar.map(String.valueOf(_)).toSeq
      else merges.flatMap { case (a, b) => (a + b).map(String.valueOf(_)) }
        .distinct.sorted
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    base.foreach(t => if (!out.contains(t)) out.put(t, out.size.toLong))
    merges.foreach { case (a, b) =>
      val t = a + b
      if (!out.contains(t)) out.put(t, out.size.toLong)
    }
    out.toSeq
  }

  /** [[vocab]] as a DataFrame (token, id) — the persistable artifact. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              merges: Seq[(String, String)], byteLevel: Boolean): DataFrame = {
    import spark.implicits._
    vocab(merges, byteLevel).toDF("token", "id")
  }

  // ---- training (driver-side, sample-bounded) ----

  /** Classic BPE training over a word-frequency dictionary from a
    * corpus SAMPLE: `sampleRows` docs (deterministic — first rows under
    * the id order), `numMerges` greedy most-frequent-pair merges.
    * Returns the merges in training order (= rank order). `byteLevel`
    * trains over UTF-8 byte symbols ([[toByteSymbols]]) instead of
    * chars — the GPT-2 shape: 256 base symbols cover any input. */
  def train(df: DataFrame, textCol: String, idCol: String,
            numMerges: Int, sampleRows: Int = 10000,
            byteLevel: Boolean = false): Seq[(String, String)] = {
    val sample = df.orderBy(col(idCol)).limit(sampleRows)
      .select(col(textCol)).collect().map(_.getString(0)).filter(_ != null)
    // word frequency dict, each word as its char/byte-symbol sequence
    val freq = new java.util.HashMap[List[String], Long]()
    sample.foreach { text =>
      val m = WordPattern.matcher(text)
      while (m.find()) {
        val piece = if (byteLevel) toByteSymbols(m.group()) else m.group()
        val w = piece.map(String.valueOf(_)).toList
        freq.merge(w, 1L, (x, y) => x + y)
      }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var dict = freq.asScala.toMap
    var step = 0
    while (step < numMerges) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      dict.foreach { case (w, n) =>
        w.sliding(2).foreach {
          case List(a, b) => pairCounts.merge((a, b), n, (x, y) => x + y)
          case _ => ()
        }
      }
      if (pairCounts.isEmpty) step = numMerges
      else {
        // deterministic: max count, ties by pair text
        val best = pairCounts.asScala.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        merges += best
        dict = dict.map { case (w, n) => (mergeWord(w, best), n) }
        step += 1
      }
    }
    merges.toSeq
  }

  private def mergeWord(w: List[String], pair: (String, String)): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    val v = w.toVector
    while (i < v.length) {
      if (i < v.length - 1 && v(i) == pair._1 && v(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += v(i); i += 1 }
    }
    out.toList
  }
}
