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
}
