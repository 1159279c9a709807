package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal binary `.xls` (BIFF8) reader — the other half of SURVEY §2.1
  * S4: the reference loads legacy Excel via xlrd
  * (`load_dataset.py:280-303`, `requirements.txt:8`; dof_421a ships as
  * `.xls`). Zero extra deps: a small OLE2 compound-file (CFB) parser to
  * extract the `Workbook` stream, then a BIFF8 record walk covering the
  * cell-bearing records real exports use (SST/LABELSST, NUMBER, RK,
  * MULRK, LABEL, BOOLERR), including CONTINUE-spanning shared-string
  * tables with mid-string splits.
  *
  * Same ingestion shape as [[Xlsx]]: Excel is parsed DRIVER-SIDE during
  * the small ingest step (human-published artifacts, a few MB — never
  * the 100 TB path), then all heavy processing is the resulting
  * DataFrame's.
  *
  * Out of scope (documented): BIFF5/7 (pre-Excel-97), encrypted
  * workbooks (FILEPASS), cached FORMULA results, rich-text runs beyond
  * the plain characters (run data is skipped per spec field lengths).
  */
object Xls {

  // ---- OLE2 / CFB container -----------------------------------------

  private val CfbSignature = 0xE11AB1A1E011CFD0L

  private final class Cfb(bytes: Array[Byte]) {
    private def u16(off: Int): Int =
      ((bytes(off) & 0xff)) | ((bytes(off + 1) & 0xff) << 8)
    private def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    private def i64(off: Int): Long =
      (i32(off) & 0xffffffffL) | ((i32(off + 4) & 0xffffffffL) << 32)

    require(i64(0) == CfbSignature, "not an OLE2 compound file (bad signature)")
    private val sectorSize = 1 << u16(30)
    private val miniSectorSize = 1 << u16(32)
    private val numFatSectors = i32(44)
    private val dirStart = i32(48)
    private val miniFatStart = i32(60)
    private val miniStreamCutoff = i32(56)
    private val difatStart = i32(68)
    private val numDifat = i32(72)

    private def sectorOff(sid: Int): Int = 512 + sid * sectorSize

    /** FAT sector ids: 109 header DIFAT slots + chained DIFAT sectors. */
    private val fatSectorIds: Seq[Int] = {
      val out = ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109 && out.size < numFatSectors) {
        val sid = i32(76 + 4 * i)
        if (sid >= 0) out += sid
        i += 1
      }
      var difat = difatStart
      var guard = 0
      while (difat >= 0 && guard <= numDifat) {
        val base = sectorOff(difat)
        var j = 0
        while (j < sectorSize / 4 - 1 && out.size < numFatSectors) {
          val sid = i32(base + 4 * j)
          if (sid >= 0) out += sid
          j += 1
        }
        difat = i32(base + sectorSize - 4)
        guard += 1
      }
      out.toSeq
    }

    private def fatEntry(sid: Int): Int = {
      val perSector = sectorSize / 4
      val fatSid = fatSectorIds(sid / perSector)
      i32(sectorOff(fatSid) + 4 * (sid % perSector))
    }

    /** Follow a FAT chain, concatenating whole sectors. */
    private def readChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      val maxSectors = bytes.length / sectorSize + 2
      while (sid >= 0) {
        require(guard < maxSectors, "FAT chain cycle")
        out.write(bytes, sectorOff(sid), sectorSize)
        sid = fatEntry(sid)
        guard += 1
      }
      out.toByteArray
    }

    private val directory: Array[Byte] = readChain(dirStart)

    private def dirEntryName(idx: Int): String = {
      val off = idx * 128
      val nameLen = ((directory(off + 64) & 0xff)) |
        ((directory(off + 65) & 0xff) << 8)
      if (nameLen < 2) ""
      else new String(directory, off, nameLen - 2, StandardCharsets.UTF_16LE)
    }

    private def dirEntry(idx: Int): (Int, Long) = {
      val off = idx * 128
      val start = (directory(off + 116) & 0xff) |
        ((directory(off + 117) & 0xff) << 8) |
        ((directory(off + 118) & 0xff) << 16) |
        ((directory(off + 119) & 0xff) << 24)
      val size = (directory(off + 120) & 0xffL) |
        ((directory(off + 121) & 0xffL) << 8) |
        ((directory(off + 122) & 0xffL) << 16) |
        ((directory(off + 123) & 0xffL) << 24)
      (start, size)
    }

    /** The mini stream (root entry's data), holding streams below the
      * cutoff in 64-byte mini sectors mapped by the mini FAT.
      */
    private lazy val miniStream: Array[Byte] = {
      val (start, size) = dirEntry(0)
      if (start < 0) Array.emptyByteArray
      else readChain(start).take(size.toInt)
    }
    private lazy val miniFat: Array[Byte] =
      if (miniFatStart < 0) Array.emptyByteArray else readChain(miniFatStart)
    private def miniFatEntry(sid: Int): Int = {
      val off = 4 * sid
      (miniFat(off) & 0xff) | ((miniFat(off + 1) & 0xff) << 8) |
        ((miniFat(off + 2) & 0xff) << 16) | ((miniFat(off + 3) & 0xff) << 24)
    }

    /** Stream bytes by directory-entry name. */
    def stream(name: String): Option[Array[Byte]] = {
      val entries = directory.length / 128
      (0 until entries).find(i => dirEntryName(i) == name).map { i =>
        val (start, size) = dirEntry(i)
        if (size >= miniStreamCutoff) readChain(start).take(size.toInt)
        else {
          val out = new java.io.ByteArrayOutputStream()
          var sid = start
          var guard = 0
          while (sid >= 0) {
            require(guard < miniStream.length / miniSectorSize + 2,
              "miniFAT chain cycle")
            out.write(miniStream, sid * miniSectorSize, miniSectorSize)
            sid = miniFatEntry(sid)
            guard += 1
          }
          out.toByteArray.take(size.toInt)
        }
      }
    }
  }

  // ---- BIFF8 records -------------------------------------------------

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecSst = 0x00FC
  private val RecContinue = 0x003C
  private val RecBoundSheet = 0x0085
  private val RecLabelSst = 0x00FD
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecLabel = 0x0204
  private val RecBoolErr = 0x0205

  private final case class Record(typ: Int, data: Array[Byte])

  private def records(stream: Array[Byte], from: Int): Iterator[Record] =
    new Iterator[Record] {
      private var off = from
      def hasNext: Boolean = off + 4 <= stream.length && {
        val t = (stream(off) & 0xff) | ((stream(off + 1) & 0xff) << 8)
        t != 0 // zero padding after the final EOF
      }
      def next(): Record = {
        val t = (stream(off) & 0xff) | ((stream(off + 1) & 0xff) << 8)
        val len = (stream(off + 2) & 0xff) | ((stream(off + 3) & 0xff) << 8)
        // copyOfRange zero-pads past the end of the array, which would
        // let a truncated stream parse with fabricated zero bytes
        // (e.g. numeric cells decoded from padding) — fail instead
        require(off + 4 + len <= stream.length,
          s"truncated BIFF record: type=0x${t.toHexString} declares " +
            s"$len bytes at offset $off but stream ends at ${stream.length}")
        val d = java.util.Arrays.copyOfRange(stream, off + 4, off + 4 + len)
        off += 4 + len
        Record(t, d)
      }
    }

  /** Cursor over an SST record plus its CONTINUE records. BIFF8 strings
    * may split at any record boundary; at each split the continuation
    * re-declares the high-byte flag for its remaining characters
    * ([MS-XLS] 2.5.293) — so character reads must go through here, not
    * through a flat concatenation.
    */
  private final class SstCursor(chunks: IndexedSeq[Array[Byte]]) {
    private var c = 0
    private var off = 0
    private def remaining: Int = chunks(c).length - off
    private def advance(): Unit = { c += 1; off = 0 }
    def u8(): Int = {
      if (remaining == 0) advance()
      val v = chunks(c)(off) & 0xff; off += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (remaining == 0) advance()
        val take = math.min(left, remaining)
        off += take; left -= take
      }
    }
    /** Read `cch` characters honoring per-chunk re-declared width. */
    def chars(cch: Int, firstFlags: Int): String = {
      val sb = new StringBuilder(cch)
      var wide = (firstFlags & 1) == 1
      var left = cch
      while (left > 0) {
        if (remaining == 0) { advance(); wide = (u8() & 1) == 1 }
        val width = if (wide) 2 else 1
        val avail = remaining / width
        if (avail == 0 && remaining > 0)
          throw new IllegalStateException("string split inside a wide char")
        val take = math.min(left, avail)
        var i = 0
        while (i < take) {
          val ch = if (wide) (u8() | (u8() << 8)).toChar
                   else (u8() & 0xff).toChar
          sb += ch
          i += 1
        }
        left -= take
      }
      sb.toString
    }
  }

  private def parseSst(chunks: IndexedSeq[Array[Byte]]): IndexedSeq[String] = {
    val cur = new SstCursor(chunks)
    cur.u32() // cstTotal
    val unique = cur.u32().toInt
    val out = new ArrayBuffer[String](unique)
    var i = 0
    while (i < unique) {
      val cch = cur.u16()
      val flags = cur.u8()
      val runs = if ((flags & 8) != 0) cur.u16() else 0 // fRichSt
      val ext = if ((flags & 4) != 0) cur.u32().toInt else 0 // fExtSt
      out += cur.chars(cch, flags)
      cur.skip(runs * 4 + ext)
      i += 1
    }
    out.toIndexedSeq
  }

  /** RK number decoding ([MS-XLS] 2.5.276): bit0 = divide by 100,
    * bit1 = 30-bit signed int vs truncated IEEE double.
    */
  private[graft] def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** Numbers render like spreadsheet display: integral doubles without
    * the trailing `.0` (BBL/id columns read as clean digit strings for
    * the declared-schema cast), everything else via Double.toString.
    */
  private[graft] def renderNumber(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def readBiffString(b: ByteBuffer): String = {
    val cch = b.getShort() & 0xffff
    val flags = b.get() & 0xff
    val runs = if ((flags & 8) != 0) b.getShort() & 0xffff else 0
    val ext = if ((flags & 4) != 0) b.getInt() else 0
    val s =
      if ((flags & 1) == 1) {
        val arr = new Array[Byte](cch * 2); b.get(arr)
        new String(arr, StandardCharsets.UTF_16LE)
      } else {
        val arr = new Array[Byte](cch); b.get(arr)
        new String(arr.map(x => (x & 0xff).toChar))
      }
    b.position(b.position() + runs * 4 + ext)
    s
  }

  // ---- public surface ------------------------------------------------

  /** Parse the first worksheet into rows of optional cell strings —
    * the same shape [[Xlsx.readRows]] produces, so both formats feed
    * one declared-schema ingestion path.
    */
  def readRows(path: String): Seq[Seq[Option[String]]] = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    val wb = cfb.stream("Workbook").orElse(cfb.stream("Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"no Workbook stream in $path (not a BIFF8 .xls?)"))

    // pass 1 (globals substream): SST + first BOUNDSHEET offset
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var sheetOff = -1
    val it = records(wb, 0)
    var depth = 0
    var sawGlobalsEof = false
    val pendingSst = ArrayBuffer.empty[Array[Byte]]
    while (it.hasNext && !sawGlobalsEof) {
      val r = it.next()
      if (pendingSst.nonEmpty && r.typ != RecContinue) {
        sst = parseSst(pendingSst.toIndexedSeq); pendingSst.clear()
      }
      r.typ match {
        case RecBof => depth += 1
        case RecEof => depth -= 1; if (depth == 0) sawGlobalsEof = true
        case RecSst => pendingSst += r.data
        case RecContinue if pendingSst.nonEmpty => pendingSst += r.data
        case RecBoundSheet if sheetOff < 0 =>
          val b = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
          sheetOff = b.getInt()
        case _ =>
      }
    }
    require(sheetOff >= 0, s"no BOUNDSHEET record in $path")

    // pass 2: the sheet substream's cell records
    val cells = collection.mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(rw: Int, colIdx: Int, v: String): Unit = {
      cells((rw, colIdx)) = v
      if (rw > maxRow) maxRow = rw
      if (colIdx > maxCol) maxCol = colIdx
    }
    val sit = records(wb, sheetOff)
    var sheetDepth = 0
    var done = false
    while (sit.hasNext && !done) {
      val r = sit.next()
      val b = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
      r.typ match {
        case RecBof => sheetDepth += 1
        case RecEof => sheetDepth -= 1; if (sheetDepth == 0) done = true
        case RecLabelSst =>
          val rw = b.getShort() & 0xffff; val cl = b.getShort() & 0xffff
          b.getShort() // ixfe
          put(rw, cl, sst(b.getInt()))
        case RecNumber =>
          val rw = b.getShort() & 0xffff; val cl = b.getShort() & 0xffff
          b.getShort()
          put(rw, cl, renderNumber(b.getDouble()))
        case RecRk =>
          val rw = b.getShort() & 0xffff; val cl = b.getShort() & 0xffff
          b.getShort()
          put(rw, cl, renderNumber(decodeRk(b.getInt())))
        case RecMulRk =>
          val rw = b.getShort() & 0xffff
          val colFirst = b.getShort() & 0xffff
          val n = (r.data.length - 6) / 6
          var i = 0
          while (i < n) {
            b.getShort() // ixfe
            put(rw, colFirst + i, renderNumber(decodeRk(b.getInt())))
            i += 1
          }
        case RecLabel =>
          val rw = b.getShort() & 0xffff; val cl = b.getShort() & 0xffff
          b.getShort()
          put(rw, cl, readBiffString(b))
        case RecBoolErr =>
          val rw = b.getShort() & 0xffff; val cl = b.getShort() & 0xffff
          b.getShort()
          val v = b.get() & 0xff
          val isErr = (b.get() & 0xff) == 1
          if (!isErr) put(rw, cl, if (v == 1) "TRUE" else "FALSE")
        case _ =>
      }
    }

    (0 to maxRow).map { rw =>
      (0 to maxCol).map(cl => cells.get((rw, cl))): IndexedSeq[Option[String]]
    }
  }

  /** Header row + declared schema -> typed DataFrame (shared
    * no-inference path with [[Xlsx.read]]).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    Xlsx.rowsToDataFrame(spark, readRows(path), schema, path)
}

/** Binary `.xls` source with declared schema (S4). */
final case class XlsSource(
    name: String,
    path: String,
    schema: StructType) extends SourceSpec {
  def read(spark: SparkSession): DataFrame = Xls.read(spark, path, schema)
}
