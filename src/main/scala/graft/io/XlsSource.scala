package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4 (legacy half) — .xls (BIFF8) scan: the reference's `read_excel`
  * accepts both `.xls` and `.xlsx`
  * (`preprocessing/correlation_graph_ui.py:84-87`); [[ExcelSource]]
  * covers the zip+XML half, this covers the 1997-2003 binary format.
  * JDK-only, from the public [MS-CFB] / [MS-XLS] specs: an OLE2
  * compound-file container (FAT + miniFAT sector chains) holding a
  * `Workbook` stream of BIFF8 records. Reads the first worksheet
  * substream; supported cell records: LABELSST (via SST with
  * Continue-record splitting and compressed/UTF-16 runs), LABEL,
  * NUMBER, RK, MULRK, FORMULA (cached numeric / following STRING
  * result), BOOLERR. First row = header, every cell a string (the
  * lenient-scan contract — numbers stringify integer-exact when whole,
  * like the CSV path leaves them as written).
  *
  * Scale note: same as .xlsx — hand-edited sheets are KB-MB driver-side
  * inputs by nature; the parse feeds the normal DataFrame path. */
object XlsSource {

  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF

  // ---------------- CFB container ----------------

  private final class Cfb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 &&
      buf.getLong(0) == 0xE11AB1A1E011CFD0L, "not an OLE2 compound file")
    private val sectorShift = buf.getShort(30).toInt
    private val miniShift = buf.getShort(32).toInt
    private val sectorSize = 1 << sectorShift
    private val miniSize = 1 << miniShift
    private val nFat = buf.getInt(44)
    private val firstDir = buf.getInt(48)
    private val miniCutoff = buf.getInt(56)
    private val firstMiniFat = buf.getInt(60)
    private val firstDifat = buf.getInt(68)

    private def sector(i: Int): Array[Byte] = {
      val off = 512 + i * sectorSize
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + sectorSize, bytes.length))
    }
    private def ints(b: Array[Byte]): Array[Int] = {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(b.length / 4)(bb.getInt())
    }

    /** FAT: header DIFAT (109 entries) + chained DIFAT sectors. */
    private val fat: Array[Int] = {
      val fatSectors = ArrayBuffer.empty[Int]
      for (i <- 0 until math.min(109, nFat)) {
        val s = buf.getInt(76 + i * 4)
        if (s >= 0) fatSectors += s
      }
      var difat = firstDifat
      while (difat != ENDOFCHAIN && difat >= 0) {
        val d = ints(sector(difat))
        d.take(d.length - 1).foreach(s => if (s >= 0) fatSectors += s)
        difat = d.last
      }
      fatSectors.toArray.flatMap(s => ints(sector(s)))
    }

    private def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = ArrayBuffer.empty[Int]
      var s = start
      var guard = 0
      while (s != ENDOFCHAIN && s >= 0) {
        out += s; s = table(s)
        guard += 1
        require(guard <= table.length, "cyclic sector chain")
      }
      out.toSeq
    }

    private def readChain(start: Int): Array[Byte] =
      chain(start, fat).iterator.map(sector).foldLeft(Array.empty[Byte])(_ ++ _)

    private val miniFat: Array[Int] =
      if (firstMiniFat == ENDOFCHAIN || firstMiniFat < 0) Array.empty
      else ints(readChain(firstMiniFat))

    /** Directory entries: (name, entryType, startSector, size). */
    private val dir: Seq[(String, Int, Int, Long)] = {
      val d = readChain(firstDir)
      (0 until d.length / 128).map { i =>
        val off = i * 128
        val bb = ByteBuffer.wrap(d, off, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = ByteBuffer.wrap(d, off + 64, 2).order(ByteOrder.LITTLE_ENDIAN).getShort.toInt
        val name = if (nameLen >= 2)
          new String(d, off, nameLen - 2, StandardCharsets.UTF_16LE) else ""
        val tpe = d(off + 66).toInt
        val start = ByteBuffer.wrap(d, off + 116, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        val size = ByteBuffer.wrap(d, off + 120, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
        (name, tpe, start, size)
      }
    }

    private lazy val miniStream: Array[Byte] = {
      val root = dir.find(_._2 == 5).getOrElse(
        throw new IllegalArgumentException("no root directory entry"))
      readChain(root._3)
    }

    /** Read a named stream, resolving mini vs regular placement. */
    def stream(names: Set[String]): Array[Byte] = {
      val (_, _, start, size) = dir
        .find(e => e._2 == 2 && names.contains(e._1.toLowerCase))
        .getOrElse(throw new IllegalArgumentException(
          s"no ${names.mkString("/")} stream; found ${dir.map(_._1).mkString(", ")}"))
      val raw =
        if (size < miniCutoff)
          chain(start, miniFat).iterator.map { m =>
            val off = m * miniSize
            java.util.Arrays.copyOfRange(miniStream, off,
              math.min(off + miniSize, miniStream.length))
          }.foldLeft(Array.empty[Byte])(_ ++ _)
        else readChain(start)
      java.util.Arrays.copyOfRange(raw, 0, size.toInt)
    }
  }

  // ---------------- BIFF8 records ----------------

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)
  private def f64(b: Array[Byte], o: Int): Double =
    java.lang.Double.longBitsToDouble(
      (i32(b, o).toLong & 0xFFFFFFFFL) | (i32(b, o + 4).toLong << 32))

  /** RK number: bit0 = /100, bit1 = int30, else top-30-bits double. */
  private[io] def decodeRk(rk: Int): Double = {
    val base: Double =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Lenient-scan stringification: whole numbers print without the
    * trailing .0 a raw Double.toString would add. */
  private[io] def numToString(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15 && !v.isInfinite) v.toLong.toString
    else v.toString

  /** Cursor over an SST payload + its Continue payloads: character
    * data restarts with a fresh flags byte at every record boundary. */
  private final class SstCursor(parts: Seq[Array[Byte]]) {
    private var part = 0
    private var pos = 0
    private def remaining: Int = parts(part).length - pos
    private def advance(): Unit = { while (part < parts.length && remaining == 0 && part < parts.length - 1) { part += 1; pos = 0 } }
    def u8(): Int = { advance(); val v = parts(part)(pos) & 0xFF; pos += 1; v }
    def u16le(): Int = u8() | (u8() << 8)
    def i32le(): Int = u16le() | (u16le() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) { advance(); val t = math.min(left, remaining); pos += t; left -= t }
    }
    def atBoundary: Boolean = remaining == 0 && part < parts.length - 1

    /** XLUnicodeRichExtendedString. */
    def string(): String = {
      val cch = u16le()
      var flags = u8()
      val cRun = if ((flags & 0x08) != 0) u16le() else 0
      val cbExt = if ((flags & 0x04) != 0) i32le() else 0
      val sb = new StringBuilder
      var read = 0
      while (read < cch) {
        if (atBoundary) { advance(); flags = u8() } // continued chars re-flag
        if ((flags & 0x01) != 0) { // UTF-16LE
          sb.append(u16le().toChar)
        } else sb.append((u8() & 0xFF).toChar) // compressed (latin-1)
        read += 1
      }
      skip(cRun * 4 + cbExt)
      sb.toString
    }
  }

  /** Parse a BIFF8 Workbook stream into rows of the FIRST worksheet. */
  private def parseWorkbook(b: Array[Byte]): Seq[Array[String]] = {
    // pass 1: record offsets; collect SST (with its Continues)
    val sst = ArrayBuffer.empty[String]
    val cells = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), String]
    var off = 0
    var substream = 0      // depth of BOF/EOF nesting seen so far
    var sheetIndex = -1    // 0 for the first sheet substream
    var inTargetSheet = false
    var pendingFormulaCell: (Int, Int) = null
    def payload(o: Int, len: Int) = java.util.Arrays.copyOfRange(b, o + 4, o + 4 + len)
    while (off + 4 <= b.length) {
      val id = u16(b, off)
      val len = u16(b, off + 2)
      id match {
        case 0x0809 => // BOF
          val p = payload(off, len)
          val dt = u16(p, 2)
          substream += 1
          if (dt == 0x0010) { sheetIndex += 1; inTargetSheet = sheetIndex == 0 }
        case 0x000A => // EOF
          substream -= 1
          inTargetSheet = false
        case 0x00FC if substream > 0 => // SST
          // gather this record plus all directly following Continues
          val parts = ArrayBuffer(payload(off, len))
          var o2 = off + 4 + len
          while (o2 + 4 <= b.length && u16(b, o2) == 0x003C) {
            val l2 = u16(b, o2 + 2)
            parts += payload(o2, l2)
            o2 += 4 + l2
          }
          val cur = new SstCursor(parts.toSeq)
          cur.skip(8) // cstTotal, cstUnique counts
          val total = i32(parts(0), 4)
          var i = 0
          while (i < total) { sst += cur.string(); i += 1 }
        case 0x00FD if inTargetSheet => // LABELSST
          val p = payload(off, len)
          cells((u16(p, 0), u16(p, 2))) = sst(i32(p, 6))
        case 0x0204 if inTargetSheet => // LABEL (inline BIFF8 string)
          val p = payload(off, len)
          val cur = new SstCursor(Seq(java.util.Arrays.copyOfRange(p, 6, p.length)))
          cells((u16(p, 0), u16(p, 2))) = cur.string()
        case 0x0203 if inTargetSheet => // NUMBER
          val p = payload(off, len)
          cells((u16(p, 0), u16(p, 2))) = numToString(f64(p, 6))
        case 0x027E if inTargetSheet => // RK
          val p = payload(off, len)
          cells((u16(p, 0), u16(p, 2))) = numToString(decodeRk(i32(p, 6)))
        case 0x00BD if inTargetSheet => // MULRK: row, colFirst, (ixfe, rk)*, colLast
          val p = payload(off, len)
          val row = u16(p, 0); val c0 = u16(p, 2)
          val n = (len - 6) / 6
          for (k <- 0 until n)
            cells((row, c0 + k)) = numToString(decodeRk(i32(p, 4 + k * 6 + 2)))
        case 0x0006 if inTargetSheet => // FORMULA: cached result
          val p = payload(off, len)
          val rc = (u16(p, 0), u16(p, 2))
          if (u16(p, 12) == 0xFFFF) {
            (p(6) & 0xFF) match {
              case 0 => pendingFormulaCell = rc // string follows in STRING
              case 1 => cells(rc) = if (p(8) != 0) "TRUE" else "FALSE"
              case 2 => cells(rc) = s"#ERR${p(8) & 0xFF}"
              case _ => // empty string result
            }
          } else cells(rc) = numToString(f64(p, 6))
        case 0x0207 if inTargetSheet && pendingFormulaCell != null => // STRING
          val p = payload(off, len)
          cells(pendingFormulaCell) = new SstCursor(Seq(p)).string()
          pendingFormulaCell = null
        case 0x0205 if inTargetSheet => // BOOLERR
          val p = payload(off, len)
          cells((u16(p, 0), u16(p, 2))) =
            if ((p(7) & 0xFF) == 0) { if (p(6) != 0) "TRUE" else "FALSE" }
            else s"#ERR${p(6) & 0xFF}"
        case _ =>
      }
      off += 4 + len
    }
    if (cells.isEmpty) return Seq.empty
    val maxRow = cells.keys.map(_._1).max
    val maxCol = cells.keys.map(_._2).max
    (0 to maxRow).map { r =>
      Array.tabulate(maxCol + 1)(c => cells.getOrElse((r, c), null))
    }
  }

  /** Read an .xls into an all-string DataFrame, first row as header —
    * the [[ExcelSource.read]] contract for the legacy format. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    val rows = parseWorkbook(cfb.stream(Set("workbook", "book")))
    require(rows.nonEmpty, s"empty sheet in $path")
    val header = rows.head.map(h => if (h == null) "" else h.trim)
    val width = math.max(header.length, rows.map(_.length).max)
    val names = (0 until width).map(i =>
      if (i < header.length && header(i).nonEmpty) header(i) else s"_c$i")
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val data = rows.tail.map(r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null)))
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  // ---------------- fixture writer ----------------

  private def rec(id: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + body.length)
    out(0) = (id & 0xFF).toByte; out(1) = ((id >> 8) & 0xFF).toByte
    out(2) = (body.length & 0xFF).toByte; out(3) = ((body.length >> 8) & 0xFF).toByte
    System.arraycopy(body, 0, out, 4, body.length)
    out
  }
  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = le16(v & 0xFFFF) ++ le16((v >>> 16) & 0xFFFF)
  private def le64(v: Long) = le32((v & 0xFFFFFFFFL).toInt) ++ le32((v >>> 32).toInt)

  /** XLUnicodeRichExtendedString, compressed when latin-1 fits. */
  private def biffString(s: String): Array[Byte] = {
    val compressed = s.forall(_ < 256)
    val chars: Array[Byte] =
      if (compressed) s.map(_.toByte).toArray
      else s.getBytes(StandardCharsets.UTF_16LE)
    le16(s.length) ++ Array((if (compressed) 0 else 1).toByte) ++ chars
  }

  /** Minimal single-sheet BIFF8 .xls writer — fixture generation for
    * tests/queries, mirroring [[ExcelSource.write]]. Cells: String ->
    * SST + LABELSST, Double -> NUMBER, Int -> RK (integer form),
    * null -> absent. Small workbooks land in the CFB MINI stream (the
    * spec-mandated placement under the 4096-byte cutoff), so the reader's
    * miniFAT path is exercised by every fixture. */
  def write(rows: Seq[Seq[Any]], path: String): Unit = {
    val strings = rows.flatten.collect { case s: String => s }.distinct
    val sstIndex = strings.zipWithIndex.toMap
    val bof = (dt: Int) => rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0x0600))
    val eof = rec(0x000A, Array.empty)
    val sst = rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++
      strings.flatMap(biffString).toArray)
    // globals: BOF, BOUNDSHEET (patched below), SST, EOF
    val sheetRecs: Array[Byte] = {
      val cells = for {
        (r, ri) <- rows.zipWithIndex
        (v, ci) <- r.zipWithIndex
        if v != null
      } yield v match {
        case s: String =>
          rec(0x00FD, le16(ri) ++ le16(ci) ++ le16(0) ++ le32(sstIndex(s)))
        case d: Double =>
          rec(0x0203, le16(ri) ++ le16(ci) ++ le16(0) ++
            le64(java.lang.Double.doubleToLongBits(d)))
        case i: Int =>
          rec(0x027E, le16(ri) ++ le16(ci) ++ le16(0) ++ le32((i << 2) | 2))
        case other => throw new IllegalArgumentException(
          s"xls writer: unsupported cell ${other.getClass}")
      }
      bof(0x0010) ++ cells.flatten ++ eof
    }
    // BOUNDSHEET needs the sheet BOF offset: globals size depends on the
    // boundsheet record size (fixed name here), so compute in two steps
    val sheetName = biffString("Sheet1") // 16-bit len + flags + chars
    val bsBody = (offset: Int) => le32(offset) ++ Array(0.toByte, 0.toByte) ++
      Array((sheetName.length - 3).toByte) ++ sheetName.drop(2)
    val globalsLen = bof(5).length + rec(0x0085, bsBody(0)).length + sst.length + eof.length
    val globals = bof(0x0005) ++ rec(0x0085, bsBody(globalsLen)) ++ sst ++ eof
    writeCfb(globals ++ sheetRecs, path)
  }

  /** Minimal CFB writer: FAT sector + directory sector, stream in mini
    * sectors under the 4096 cutoff (miniFAT + ministream), regular
    * sectors above it. */
  private[io] def writeCfb(stream: Array[Byte], path: String): Unit = {
    val useMini = stream.length < 4096
    val sectors = ArrayBuffer.empty[Array[Byte]]
    def pad(b: Array[Byte], size: Int): Array[Byte] =
      if (b.length >= size) b.take(size) else b ++ Array.fill(size - b.length)(0.toByte)
    val fat = ArrayBuffer.empty[Int]
    // sector 0 = FAT itself
    sectors += null; fat += 0xFFFFFFFD
    // sector 1 = directory
    sectors += null; fat += ENDOFCHAIN
    var miniFatSector = ENDOFCHAIN
    var nMiniFat = 0
    var streamStart = ENDOFCHAIN
    var miniStreamStart = ENDOFCHAIN
    var miniStreamBytes = 0L
    if (useMini) {
      val nMini = (stream.length + 63) / 64
      // miniFAT sector
      miniFatSector = sectors.length
      nMiniFat = 1
      val mfat = (0 until nMini).map(i => if (i == nMini - 1) ENDOFCHAIN else i + 1) ++
        Seq.fill(128 - nMini)(FREESECT)
      sectors += pad(mfat.flatMap(le32).toArray, 512); fat += ENDOFCHAIN
      // ministream in regular sectors
      val miniData = pad(stream, nMini * 64)
      val nStream = (miniData.length + 511) / 512
      miniStreamStart = sectors.length
      for (i <- 0 until nStream) {
        sectors += pad(java.util.Arrays.copyOfRange(miniData, i * 512,
          math.min((i + 1) * 512, miniData.length)), 512)
        fat += (if (i == nStream - 1) ENDOFCHAIN else sectors.length)
      }
      miniStreamBytes = nMini * 64L
      streamStart = 0 // first mini sector
    } else {
      val nStream = (stream.length + 511) / 512
      streamStart = sectors.length
      for (i <- 0 until nStream) {
        sectors += pad(java.util.Arrays.copyOfRange(stream, i * 512,
          math.min((i + 1) * 512, stream.length)), 512)
        fat += (if (i == nStream - 1) ENDOFCHAIN else sectors.length)
      }
    }
    // directory sector: Root + Workbook + 2 free
    def dirEntry(name: String, tpe: Int, color: Int, left: Int, right: Int,
                 child: Int, start: Int, size: Long): Array[Byte] = {
      val n = name.getBytes(StandardCharsets.UTF_16LE)
      pad(n, 64) ++ le16(if (name.isEmpty) 0 else n.length + 2) ++
        Array(tpe.toByte, color.toByte) ++ le32(left) ++ le32(right) ++
        le32(child) ++ Array.fill(16)(0.toByte) ++ le32(0) ++
        Array.fill(16)(0.toByte) ++ le32(start) ++ le64(size)
    }
    val NOSTREAM = 0xFFFFFFFF
    val dirData =
      dirEntry("Root Entry", 5, 1, NOSTREAM, NOSTREAM, 1,
        if (useMini) miniStreamStart else ENDOFCHAIN, miniStreamBytes) ++
      dirEntry("Workbook", 2, 1, NOSTREAM, NOSTREAM, NOSTREAM,
        streamStart, stream.length.toLong) ++
      dirEntry("", 0, 0, NOSTREAM, NOSTREAM, NOSTREAM, 0, 0) ++
      dirEntry("", 0, 0, NOSTREAM, NOSTREAM, NOSTREAM, 0, 0)
    sectors(1) = pad(dirData, 512)
    require(fat.length <= 128, "fixture too large for a one-sector FAT")
    sectors(0) = pad((fat.toSeq ++ Seq.fill(128 - fat.length)(FREESECT))
      .flatMap(le32).toArray, 512)
    // header
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.putLong(0, 0xE11AB1A1E011CFD0L)
    header.putShort(24, 0x003E.toShort) // minor
    header.putShort(26, 0x0003.toShort) // major 3 (512-byte sectors)
    header.putShort(28, 0xFFFE.toShort) // byte order
    header.putShort(30, 9.toShort)      // sector shift
    header.putShort(32, 6.toShort)      // mini shift
    header.putInt(44, 1)                // # FAT sectors
    header.putInt(48, 1)                // first directory sector
    header.putInt(56, 4096)             // mini cutoff
    header.putInt(60, miniFatSector)    // first miniFAT sector
    header.putInt(64, nMiniFat)         // # miniFAT sectors
    header.putInt(68, ENDOFCHAIN)       // first DIFAT sector
    header.putInt(72, 0)                // # DIFAT sectors
    header.putInt(76, 0)                // DIFAT[0] = FAT sector 0
    for (i <- 1 until 109) header.putInt(76 + i * 4, FREESECT)
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      out.write(header.array())
      sectors.foreach(s => out.write(s))
    } finally out.close()
  }
}
