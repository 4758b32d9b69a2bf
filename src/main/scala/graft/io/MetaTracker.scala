package graft.io

import scala.collection.mutable.ListBuffer

/** Provenance tracker for the versioned-CSV contract: each saved dataset
  * carries `# META: vN: change, change, …` comment lines, one per version
  * (reference `utils/meta_tracker.py:29-60,132-153`). Driver-side metadata —
  * never touches executors.
  */
final class MetaTracker {
  private val history = ListBuffer[(Int, String)]() // (version, change text)
  private val pending = ListBuffer[String]()
  private var ver: Int = 0

  def version: Int = ver
  def changes: Seq[String] = pending.toSeq
  def historyPairs: Seq[(Int, String)] = history.toSeq
  def historyLines: Seq[String] =
    history.toSeq.map { case (v, t) => if (t.isEmpty) s"# META: v$v" else s"# META: v$v: $t" }

  def addChange(desc: String): Unit = pending += desc

  /** Header lines to write for the next save; bumps version unless preserved. */
  def commit(preserveVersion: Boolean = false): Seq[String] = {
    if (!preserveVersion) ver += 1
    history += ((ver, pending.mkString(", ")))
    pending.clear()
    historyLines
  }
}

object MetaTracker {
  private val MetaRe = """^#\s*META:\s*v(\d+)\s*:?\s*(.*)$""".r

  /** Rebuild a tracker from previously written `# META:` lines. */
  def parse(lines: Seq[String]): MetaTracker = {
    val t = new MetaTracker
    lines.foreach {
      case MetaRe(v, rest) =>
        t.history += ((v.toInt, rest.trim))
        t.ver = math.max(t.ver, v.toInt)
      case _ =>
    }
    t
  }

  /** WRAPPED header variant (reference
    * `preprocessing/outlier_categories_ui.py:296-341`): the whole history
    * joined `"vN changes"` with `|` into ONE logical `# META:` line,
    * greedily wrapped at `maxLen` chars on `|` boundaries; continuation
    * lines re-prefixed. A single over-long segment stays on its own line
    * (same as the reference). */
  def wrappedLines(t: MetaTracker, maxLen: Int = 150): Seq[String] = {
    val parts = t.historyPairs.sortBy(_._1).map { case (v, txt) =>
      s"v$v ${if (txt.isEmpty) "no changes" else txt}"
    }
    val full = "# META: " + parts.mkString("|")
    if (full.length <= maxLen) Seq(full)
    else {
      val lines = ListBuffer.empty[String]
      var cur = "# META:"
      for (w <- parts) {
        val test = if (cur == "# META:") s"# META: $w" else s"$cur|$w"
        if (test.length <= maxLen) cur = test
        else {
          if (cur != "# META:") lines += cur
          cur = s"# META: $w"
        }
      }
      if (cur != "# META:") lines += cur
      lines.toSeq
    }
  }

  private val WrappedVerRe = """^v(\d+)\s+(.*)$""".r

  /** Parse wrapped-header lines back into a tracker. */
  def parseWrapped(lines: Seq[String]): MetaTracker = {
    val t = new MetaTracker
    val content = lines.filter(_.startsWith("# META:"))
      .map(_.stripPrefix("# META:").trim).mkString("|")
    content.split('|').iterator.filter(_.nonEmpty).foreach {
      case WrappedVerRe(v, rest) =>
        t.history += ((v.toInt, rest.trim))
        t.ver = math.max(t.ver, v.toInt)
      case _ =>
    }
    t
  }
}
