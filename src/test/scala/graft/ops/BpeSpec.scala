package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("countTokens applies merges lowest-rank-first, all occurrences") {
    val ranks = Bpe.parseRanks("a b\nab c\nx y")
    // "abc" -> [a,b,c] -> [ab,c] -> [abc] = 1 token
    assert(Bpe.countTokens("abc", ranks) == 1L)
    // "abab" -> [ab, ab]: both occurrences of the winning pair merge
    assert(Bpe.countTokens("abab", ranks) == 2L)
    // unknown chars stay single: "abq" -> [ab, q]
    assert(Bpe.countTokens("abq", ranks) == 2L)
    // pre-tokenizer splits words and punctuation: "xy, abc!" ->
    // word "xy" -> [xy] (1), "," (1), "abc" -> [abc] (1), "!" (1)
    assert(Bpe.countTokens("xy, abc!", ranks) == 4L)
    // empty merges: every char of every word is a token
    assert(Bpe.countTokens("ab cd", Bpe.parseRanks("")) == 4L)
  }

  test("merges round-trip through save/load; header lines skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    val merges = Seq(("a", "b"), ("ab", "c"), ("t", "h"))
    Bpe.saveMerges(s"$dir/merges.txt", merges)
    assert(Bpe.loadMerges(s"$dir/merges.txt") == merges)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/hdr.txt"),
      "#version: 0.2\na b\nab c\n")
    assert(Bpe.loadMerges(s"$dir/hdr.txt") == Seq(("a", "b"), ("ab", "c")))
  }

  test("train learns the frequent pairs; trained counts compress vs chars") {
    import spark.implicits._
    val docs = (0L until 50L)
      .map(i => (i, "the cat the hat the mat and the bat " * 3))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", "doc_id", numMerges = 20)
    assert(merges.nonEmpty && merges.size <= 20)
    // 'th'/'he' class merges must be learned from this corpus
    assert(merges.contains(("t", "h")) || merges.contains(("h", "e")),
      s"expected th/he among $merges")
    val ranks = Bpe.parseRanks(Bpe.mergesToString(merges))
    val trained = Bpe.countTokens("the cat sat", ranks)
    val untrained = Bpe.countTokens("the cat sat", Bpe.parseRanks(""))
    assert(trained < untrained, s"merges must compress: $trained vs $untrained")
  }

  test("packSequences accepts trained-BPE counts: budgets respected, counts differ") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, "the cat the hat the mat and the bat"))
      .toDF("doc_id", "text")
    // few merges: words stay PARTIALLY merged, so counts sit strictly
    // between word count and char count (full training on this tiny
    // vocabulary would collapse every word to one token = word count)
    val merges = Bpe.train(docs, "text", "doc_id", numMerges = 3)
    val packed = Corpus.packSequences(docs, "text", "doc_id", budget = 64,
      tokenCount = Bpe.tokenCount(_, merges))
    // packing contract: a doc joins the sequence where its cumulative
    // count STARTS, so a sequence overflows by at most one doc
    val maxDoc = packed.agg(max("n_tokens")).head().getLong(0)
    val perSeq = packed.groupBy("seq_id").agg(sum("n_tokens").as("t"))
      .collect().map(_.getLong(1))
    assert(perSeq.nonEmpty && perSeq.forall(_ < 64 + maxDoc), perSeq.mkString(","))
    // and the trained counts genuinely differ from the whitespace counts
    val bpeTotal = packed.agg(sum("n_tokens")).head().getLong(0)
    val wsTotal = Corpus.packSequences(docs, "text", "doc_id", budget = 64)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(bpeTotal > wsTotal, s"bpe $bpeTotal vs whitespace $wsTotal")
  }

  test("byte-level: any unicode covered by 256 symbols; header switches the expression") {
    import spark.implicits._
    // multibyte text: char-level sees 1 char per accent, byte-level 2
    val empty = Bpe.parseRanks("")
    assert(Bpe.countTokens("é", empty) == 1L)
    assert(Bpe.countTokensByte("é", empty) == 2L)
    // the byte-symbol map is a bijection over all 256 byte values
    assert(Bpe.ByteToChar.distinct.length == 256)
    // byte-level merges learned over UTF-8 symbols compress multibyte text
    val docs = (0L until 30L).map(i => (i, "héllo héllo wörld wörld " * 2))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", "doc_id", numMerges = 10, byteLevel = true)
    val ranks = Bpe.parseRanks(Bpe.mergesToString(merges, byteLevel = true))
    val trained = Bpe.countTokensByte("héllo wörld", ranks)
    val untrained = Bpe.countTokensByte("héllo wörld", empty)
    assert(trained < untrained, s"$trained vs $untrained")
    // the #byte_level header routes the NATIVE expression to byte mode:
    // with no merges, "é" counts 2 (bytes) under the header, 1 without
    val n = Seq("é").toDF("text")
      .select(Bpe.tokenCount(col("text"), Seq.empty, byteLevel = true).as("n"),
        Bpe.tokenCount(col("text"), Seq.empty).as("m")).head()
    assert((n.getLong(0), n.getLong(1)) == (2L, 1L))
    // save/load round-trips the header
    val dir = java.nio.file.Files.createTempDirectory("graft_bpeb_").toString
    Bpe.saveMerges(s"$dir/m.txt", merges, byteLevel = true)
    assert(Bpe.loadIsByteLevel(s"$dir/m.txt"))
    assert(Bpe.loadMerges(s"$dir/m.txt") == merges)
    assert(!Bpe.isByteLevel(Bpe.mergesToString(merges)))
  }

  test("vocab: GPT-2 convention — 256 base ids, merges in rank order, collisions keep first id") {
    // byte-level: base ids 0..255 are the byte symbols in byte order
    val merges = Seq(("t", "h"), ("th", "e"), ("h", "e"))
    val v = Bpe.vocab(merges, byteLevel = true)
    assert(v.size == 256 + 3)
    assert(v.take(256).map(_._1) == Bpe.ByteToChar.map(String.valueOf(_)).toSeq)
    assert(v.map(_._2) == v.indices.map(_.toLong)) // contiguous ids
    assert(v(256) == ("th", 256L) && v(257) == ("the", 257L) && v(258) == ("he", 258L))
    // collision: t+he == "the" already exists -> first id wins, no gap
    val v2 = Bpe.vocab(merges :+ ("t", "he"), byteLevel = true)
    assert(v2.size == v.size && v2.map(_._2) == v2.indices.map(_.toLong))
    // char-level base: distinct chars of the merge parts, sorted
    val v3 = Bpe.vocab(Seq(("a", "b")), byteLevel = false)
    assert(v3 == Seq(("a", 0L), ("b", 1L), ("ab", 2L)))
  }

  test("bpe_encode: ids round-trip through the vocab; length == bpe_token_count") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, "the cat the hat wörld " * 2))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", "doc_id", numMerges = 15, byteLevel = true)
    val idToToken = Bpe.vocab(merges, byteLevel = true)
      .map { case (t, id) => id -> t }.toMap
    val rows = Seq("the cat", "wörld!", "").toDF("text")
      .select(Bpe.encode(col("text"), merges, byteLevel = true).as("ids"),
        Bpe.tokenCount(col("text"), merges, byteLevel = true).as("n"))
      .collect()
    rows.foreach { r =>
      val ids = r.getSeq[Long](0)
      assert(ids.length == r.getLong(1), s"size(ids) must equal count: $r")
      assert(ids.forall(idToToken.contains), s"all ids in vocab: $ids")
    }
    // decode round trip: concatenated tokens == byte symbols of the
    // pre-token pieces, in order (construction-guaranteed)
    val decoded = rows(0).getSeq[Long](0).map(idToToken).mkString
    val expected = {
      val m = java.util.regex.Pattern.compile(Text.BpeTokenPattern).matcher("the cat")
      val sb = new StringBuilder
      while (m.find()) sb.append(Bpe.toByteSymbols(m.group()))
      sb.toString
    }
    assert(decoded == expected, s"'$decoded' vs '$expected'")
    // empty text encodes to the empty sequence; null to null
    assert(rows(2).getSeq[Long](0).isEmpty)
    val n = Seq(null.asInstanceOf[String]).toDF("text")
      .select(Bpe.encode(col("text"), merges, byteLevel = true)).head()
    assert(n.isNullAt(0))
    // codegen: the projection stays whole-stage
    val plan = spark.range(3).select(
        call_function("bpe_encode", concat(lit("ab"), col("id")),
          lit(Bpe.mergesToString(merges, byteLevel = true))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("bpe_token_count is SQL-callable and runs inside whole-stage codegen") {
    import spark.implicits._
    val merges = Bpe.mergesToString(Seq(("a", "b"), ("ab", "c")))
    val df = Seq("abc abc!", "zz", null.asInstanceOf[String]).toDF("text")
      .select(Bpe.tokenCount(col("text"), Seq(("a", "b"), ("ab", "c"))).as("n"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 3L) // [abc] [abc] [!]
    assert(rows(1).getLong(0) == 2L) // [z] [z]
    assert(rows(2).isNullAt(0))
    val plan = spark.range(5).select(
        call_function("bpe_token_count", concat(lit("ab"), col("id")), lit(merges)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("bpe_decode inverts bpe_encode: unicode byte-level, char-level, unknowns") {
    import spark.implicits._
    // byte-level handles any script/emoji through the UTF-8 byte alphabet
    val texts = Seq("hello world", "héllo wörld", "汉字 text", "mixed 😀 emoji!")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", "doc_id", numMerges = 30,
      sampleRows = 10, byteLevel = true)
    val pre = java.util.regex.Pattern.compile(Text.BpeTokenPattern)
    def pieces(t: String): String = {
      val m = pre.matcher(t); val sb = new StringBuilder
      while (m.find()) sb.append(m.group()); sb.toString
    }
    val rt = docs.select(col("doc_id"),
        Bpe.decode(Bpe.encode(col("text"), merges, byteLevel = true),
          merges, byteLevel = true).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rt(i.toLong) == pieces(t), s"byte-level roundtrip broke on '$t'")
    }
    // char-level: unknown symbols encode as -1 and decode to nothing
    val charMerges = Seq(("a", "b"))
    val out = Seq((1L, "ab zz")).toDF("doc_id", "text")
      .select(Bpe.decode(Bpe.encode(col("text"), charMerges), charMerges))
      .head().getString(0)
    assert(out == "ab") // 'z' is outside the {a, b} merge alphabet
  }
}
