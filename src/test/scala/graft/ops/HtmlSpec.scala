package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlSpec extends SparkSpec {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Text.htmlToText(col("h"))).head().getString(0)
  }

  test("htmlToText: scripts/styles/comments drop, block tags break lines, entities decode") {
    val html =
      """<html><head><style>p { a: 1 }</style>
        |<script>if (1 < 2) { alert("</p>hi"); }</script></head>
        |<body><!-- chrome --><div>Nav | Bar</div>
        |<h1>Title</h1><p>First &amp; second &lt;para&gt;</p>
        |<p>Quote: &quot;x&quot; and &#39;y&#39;&nbsp;end</p></body></html>""".stripMargin
    val out = extract(html)
    // source newlines between block tags merge with tag breaks into
    // PARAGRAPH breaks (\n\n); </h1><p> with no source newline is a
    // single line break — structure mirrors the markup's own spacing
    assert(out ==
      "Nav | Bar\n\nTitle\nFirst & second <para>\n\nQuote: \"x\" and 'y' end",
      s"got:\n$out")
  }

  test("htmlToText: case-insensitive tags, preserved paragraph breaks, plain text fixpoint") {
    assert(extract("<DIV>a</DIV><P>b</P>") == "a\nb")
    // >= 2 newlines survive as a paragraph break for splitParagraphs
    assert(extract("line1<br><br><br>line2") == "line1\n\nline2")
    assert(extract("no markup at all") == "no markup at all")
    assert(extract("a  b\tc") == "a b c")
  }

  test("htmlToText composes with splitParagraphs downstream") {
    import spark.implicits._
    val df = Seq((1L, "<p>alpha</p><p></p><p>beta</p>")).toDF("doc_id", "h")
      .select(col("doc_id"), Text.htmlToText(col("h")).as("text"))
    val paras = Dedup.splitParagraphs(df, "text", "doc_id")
      .collect().map(_.getString(2))
    // the empty <p></p> leaves a blank-line break -> two paragraphs
    assert(paras.toSeq == Seq("alpha", "beta"))
  }

  test("scriptCounts and dominantScript classify by code-point range") {
    import spark.implicits._
    def classify(s: String): (Map[String, Int], String) = {
      val c = Text.scriptCounts(col("t"))
      val row = Seq(s).toDF("t").select(
        (c.map { case (n, cc) => cc.as(n) } :+
          Text.dominantScript(col("t")).as("script")): _*).head()
      (c.indices.map(i => c(i)._1 -> row.getInt(i)).toMap,
        row.getString(c.size))
    }
    val (enC, enS) = classify("Hello, world 123")
    assert(enC("n_latin") == 10 && enC("n_cyrillic") == 0 && enS == "latin")
    val (ruC, ruS) = classify("Привет мир")
    assert(ruC("n_cyrillic") == 9 && ruC("n_latin") == 0 && ruS == "cyrillic")
    val (cjC, cjS) = classify("你好 こんにちは 안녕")
    assert(cjC("n_cjk") == 9 && cjS == "cjk", cjC.toString)
    assert(classify("مرحبا")._2 == "arabic")
    assert(classify("नमस्ते")._2 == "devanagari")
    // accented Latin sits in the extended range; digits count nowhere
    assert(classify("café")._1("n_latin") == 4)
    assert(classify("12345 .,!?")._2 == "none")
    // mixed with a tie goes to the EARLIER range entry (latin)
    assert(classify("ab Пр")._2 == "latin")
  }
}
