package graft.formats

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.formats.Ooxml.XlsxSheet

/** Legacy `.xls` decode (SURVEY §2.1 S13; the reference's ChunkerFactory
  * dispatches `xlsx|xls` to the same spreadsheet chunker,
  * chunking/chunker_factory.py:34-72), JDK-only.
  *
  * A BIFF8 workbook is a [MS-XLS] record stream stored as the "Workbook"
  * stream of a [MS-CFB] compound document. Both layers are implemented
  * here from the public specs:
  *
  *  - CFB: header → DIFAT → FAT chains; directory chain → stream entry;
  *    streams under the 4096-byte cutoff resolve through the miniFAT over
  *    the root entry's mini stream, larger ones through the regular FAT;
  *  - BIFF8: globals substream (SST shared strings with compressed/UTF-16
  *    variants, BOUNDSHEET sheet names + offsets) then one substream per
  *    sheet (LABELSST / LABEL / NUMBER / RK / MULRK cells, EOF framing).
  *
  * [[writeXls]] emits real BIFF8-in-CFB fixtures (string cells via SST;
  * the workbook stream is padded past the mini-stream cutoff so it lives
  * in the regular FAT) that external tools can open; [[readXls]] also
  * decodes the numeric records real-world files carry.
  */
object Biff {

  // ------------------------------------------------------------------ records

  private val RecBofGlobals = 0x0809
  private val RecEof = 0x000A
  private val RecBoundSheet = 0x0085
  private val RecSst = 0x00FC
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecContinue = 0x003C

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  // ------------------------------------------------------------------- write

  private def record(id: Int, payload: Array[Byte]): Array[Byte] = {
    // 8224 is the BIFF8 record-data ceiling; bigger payloads need CONTINUE
    // records, which the fixture writer deliberately does not emit
    require(payload.length <= 8224,
      s"record 0x${id.toHexString} payload ${payload.length} exceeds the BIFF limit")
    val b = le(4 + payload.length)
    b.putShort(id.toShort).putShort(payload.length.toShort).put(payload)
    b.array()
  }

  private def bof(substreamType: Int): Array[Byte] = {
    val b = le(16)
    b.putShort(0x0600.toShort).putShort(substreamType.toShort)
      .putShort(0x0DBB.toShort).putShort(0x07CC.toShort).putInt(0).putInt(0)
    record(RecBofGlobals, b.array())
  }

  /** Real BIFF8 .xls bytes for string-cell sheets (the [[XlsxSheet]] shape
    * the xlsx writer shares).
    */
  def writeXls(sheets: Seq[XlsxSheet]): Array[Byte] = {
    require(sheets.nonEmpty, "at least one sheet")
    // shared string table over all cells, first-seen order
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var total = 0L
    sheets.foreach(_.rows.foreach(_.foreach { c =>
      total += 1
      sstIndex.getOrElseUpdate(c, sstIndex.size)
    }))
    // SST + CONTINUE framing ([MS-XLS] 2.5.293): the 8224-byte record-data
    // ceiling forces large string tables across CONTINUE records. Like Excel
    // itself, character data may break MID-STRING — the continuation then
    // leads with a re-stated compression flag — so a single string longer
    // than one record is representable. Two invariants the reader (and any
    // external one) relies on: the 3-byte string header never splits, and
    // wide (UTF-16LE) character data breaks only on whole 2-byte characters.
    val sstRecords: Seq[Array[Byte]] = {
      val Cap = 8224
      val batches = Seq.newBuilder[Array[Byte]]
      var cur = new ByteArrayOutputStream()
      val head = le(8)
      head.putInt(total.toInt).putInt(sstIndex.size)
      cur.write(head.array())
      def break(): Unit = { batches += cur.toByteArray; cur = new ByteArrayOutputStream() }
      sstIndex.keys.foreach { s =>
        require(s.length <= 0xFFFF, "SST string exceeds the u16 cch field")
        val compressed = s.forall(_ < 256)
        val width = if (compressed) 1 else 2
        val flag: Byte = if (compressed) 0 else 1
        val payload =
          if (compressed) s.map(_.toByte).toArray else s.getBytes("UTF-16LE")
        // header plus at least the first character must fit this record
        if (cur.size() + 3 + width > Cap) break()
        val h = le(3)
        h.putShort(s.length.toShort).put(flag)
        cur.write(h.array())
        var off = 0
        while (off < payload.length) {
          val room = (Cap - cur.size()) / width * width
          if (room <= 0) { break(); cur.write(flag.toInt) } // re-stated flag
          else {
            val n = math.min(room, payload.length - off)
            cur.write(payload, off, n)
            off += n
          }
        }
      }
      batches += cur.toByteArray
      val all = batches.result()
      record(RecSst, all.head) +: all.tail.map(record(RecContinue, _))
    }
    val sheetStreams = sheets.map { sh =>
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0010))
      sh.rows.zipWithIndex.foreach { case (row, r) =>
        row.zipWithIndex.foreach { case (cell, c) =>
          val b = le(10)
          b.putShort(r.toShort).putShort(c.toShort).putShort(0)
            .putInt(sstIndex(cell))
          out.write(record(RecLabelSst, b.array()))
        }
      }
      out.write(record(RecEof, Array.emptyByteArray))
      out.toByteArray
    }
    // globals: BOF + one BOUNDSHEET per sheet + SST + EOF. BOUNDSHEET holds
    // the absolute offset of its sheet's BOF, so assemble globals twice:
    // once to learn its length, once with real offsets.
    def globals(offsets: Seq[Int]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0005))
      sheets.zip(offsets).foreach { case (sh, off) =>
        val name = sh.name
        val compressed = name.forall(_ < 256)
        val payload =
          if (compressed) name.map(_.toByte).toArray else name.getBytes("UTF-16LE")
        val b = le(8 + payload.length)
        b.putInt(off).put(0.toByte).put(0.toByte)
          .put(name.length.toByte).put(if (compressed) 0.toByte else 1.toByte)
          .put(payload)
        out.write(record(RecBoundSheet, b.array()))
      }
      sstRecords.foreach(out.write)
      out.write(record(RecEof, Array.emptyByteArray))
      out.toByteArray
    }
    val globalsLen = globals(sheets.map(_ => 0)).length
    val offsets = sheetStreams.scanLeft(globalsLen)(_ + _.length).init
    val stream = new ByteArrayOutputStream()
    stream.write(globals(offsets))
    sheetStreams.foreach(stream.write)
    wrapCfb("Workbook", stream.toByteArray)
  }

  // --------------------------------------------------------------- CFB write

  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  private val SectFat = 0xFFFFFFFD
  private val SectEnd = 0xFFFFFFFE
  private val SectFree = 0xFFFFFFFF

  /** Wrap one stream into a minimal v3 compound file. The stream is padded
    * to the 4096-byte mini-stream cutoff so it chains through the regular
    * FAT — spec-legal (padding follows the BIFF EOF record) and it keeps
    * the writer to one FAT, one directory sector, and the data.
    */
  private def wrapCfb(streamName: String, data: Array[Byte]): Array[Byte] = {
    val padded = java.util.Arrays.copyOf(data, math.max(4096, (data.length + 511) / 512 * 512))
    val dataSectors = padded.length / 512
    // sector map: FAT sectors first, then one directory sector, then data.
    // Each 512-byte FAT sector indexes 128 sectors, so solve for how many
    // the whole file (including the FAT itself) needs.
    var nFat = 1
    while (nFat + 1 + dataSectors > nFat * 128) nFat += 1
    // 109 header DIFAT slots × 128 entries ≈ 7 MB; enough for any fixture
    require(nFat <= 109, s"stream of ${padded.length} bytes exceeds header-DIFAT capacity")
    val dirSector = nFat
    val dataStart = nFat + 1
    val totalSectors = dataStart + dataSectors
    val fat = le(nFat * 512)
    (0 until totalSectors).foreach { s =>
      fat.putInt(
        if (s < nFat) SectFat
        else if (s == dirSector) SectEnd
        else if (s == totalSectors - 1) SectEnd
        else s + 1)
    }
    while (fat.position() < nFat * 512) fat.putInt(SectFree)

    def dirEntry(name: String, entryType: Int, child: Int, start: Int,
        size: Long): Array[Byte] = {
      val b = le(128)
      val utf16 = name.getBytes("UTF-16LE")
      b.put(utf16)
      b.position(64)
      b.putShort((utf16.length + 2).toShort) // name length incl. terminator
      b.put(entryType.toByte).put(1.toByte)  // black
      b.putInt(-1).putInt(-1).putInt(child)  // left, right, child
      b.position(116)                        // skip CLSID + state + times
      b.putInt(start)
      b.putLong(size)
      b.array()
    }
    val dir = le(512)
    dir.put(dirEntry("Root Entry", 5, child = 1, start = SectEnd, size = 0L))
    dir.put(dirEntry(streamName, 2, child = -1, start = dataStart,
      size = padded.length.toLong))
    dir.put(dirEntry("", 0, -1, SectFree, 0L)) // unused entries
    dir.put(dirEntry("", 0, -1, SectFree, 0L))

    val header = le(512)
    header.put(CfbMagic)
    header.position(24)
    header.putShort(0x003E.toShort).putShort(0x0003.toShort) // minor, major v3
      .putShort(0xFFFE.toShort)                              // little endian
      .putShort(9.toShort).putShort(6.toShort)               // sector shifts
    header.position(44)
    header.putInt(nFat)       // FAT sector count
    header.putInt(dirSector)  // directory start sector
    header.putInt(0)          // transaction signature
    header.putInt(4096)       // mini stream cutoff
    header.putInt(SectEnd)    // no miniFAT
    header.putInt(0)
    header.putInt(SectEnd)    // no DIFAT chain
    header.putInt(0)
    (0 until nFat).foreach(header.putInt) // DIFAT: FAT sectors 0..nFat-1
    while (header.position() < 512) header.putInt(SectFree)

    val out = new ByteArrayOutputStream()
    out.write(header.array())
    out.write(fat.array())
    out.write(dir.array())
    out.write(padded)
    out.toByteArray
  }

  // ---------------------------------------------------------------- CFB read

  /** Extract a named stream ("Workbook"/"Book") from a compound document,
    * resolving mini-stream storage for under-cutoff streams.
    */
  private[formats] def cfbStream(bytes: Array[Byte], names: Set[String]): Option[Array[Byte]] = {
    if (bytes.length < 512 || !bytes.take(8).sameElements(CfbMagic)) return None
    // anything that passes the magic check can still be truncated or carry
    // corrupt FAT/directory fields; degrade to None like non-CFB bytes do —
    // an extract UDF over real-world files must never fail the task
    try cfbStreamUnsafe(bytes, names)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def cfbStreamUnsafe(bytes: Array[Byte], names: Set[String]): Option[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sectorSize = 1 << buf.getShort(30)
    val miniSectorSize = 1 << buf.getShort(32)
    val nFat = buf.getInt(44)
    val dirStart = buf.getInt(48)
    val miniCutoff = buf.getInt(56)
    val miniFatStart = buf.getInt(60)
    val difatStart = buf.getInt(68)
    def sectorOff(s: Int): Int = 512 + s * sectorSize

    // FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && fatSectors.length < nFat) {
      val s = buf.getInt(76 + i * 4)
      if (s >= 0) fatSectors += s
      i += 1
    }
    var difat = difatStart
    while (difat >= 0 && fatSectors.length < nFat) {
      val base = sectorOff(difat)
      var j = 0
      while (j < sectorSize / 4 - 1 && fatSectors.length < nFat) {
        val s = buf.getInt(base + j * 4)
        if (s >= 0) fatSectors += s
        j += 1
      }
      difat = buf.getInt(base + sectorSize - 4)
    }
    def fatAt(sector: Int): Int = {
      // a corrupt chain can point past the FAT's coverage or the file end;
      // treat either as end-of-chain rather than reading out of bounds
      val fi = sector / (sectorSize / 4)
      if (fi >= fatSectors.length) return SectEnd
      val at = sectorOff(fatSectors(fi)) + (sector % (sectorSize / 4)) * 4
      if (at < 0 || at + 4 > bytes.length) SectEnd else buf.getInt(at)
    }
    def chain(start: Int, limit: Int = 1 << 20): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var s = start
      var n = 0
      while (s >= 0 && n < limit) {
        // only sectors fully inside the file are readable (truncated tail)
        if (sectorOff(s) + sectorSize <= bytes.length) out += s
        s = fatAt(s)
        n += 1
      }
      out.result()
    }
    def readChain(start: Int): Array[Byte] = {
      val sectors = chain(start)
      val out = new Array[Byte](sectors.length * sectorSize)
      sectors.zipWithIndex.foreach { case (s, k) =>
        System.arraycopy(bytes, sectorOff(s), out, k * sectorSize, sectorSize)
      }
      out
    }

    val dir = readChain(dirStart)
    val dbuf = ByteBuffer.wrap(dir).order(ByteOrder.LITTLE_ENDIAN)
    case class Entry(name: String, entryType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { k =>
      val nameLen = dbuf.getShort(k * 128 + 64) & 0xFFFF
      val name =
        if (nameLen >= 2) new String(dir, k * 128, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dir(k * 128 + 66) & 0xFF,
        dbuf.getInt(k * 128 + 116), dbuf.getLong(k * 128 + 120))
    }
    val root = entries.find(_.entryType == 5)
    entries.find(e => e.entryType == 2 && names.contains(e.name)).map { e =>
      val raw =
        if (e.size >= miniCutoff || root.isEmpty) readChain(e.start)
        else {
          // mini stream: data lives in the root entry's chain, addressed in
          // mini sectors through the miniFAT
          val miniData = readChain(root.get.start)
          val miniFatBytes = readChain(miniFatStart)
          val mbuf = ByteBuffer.wrap(miniFatBytes).order(ByteOrder.LITTLE_ENDIAN)
          val out = new ByteArrayOutputStream()
          var s = e.start
          var n = 0
          while (s >= 0 && n < (1 << 20)) {
            val off = s.toLong * miniSectorSize
            if (off >= 0 && off < miniData.length)
              out.write(miniData, off.toInt,
                math.min(miniSectorSize, miniData.length - off.toInt))
            s = if (s < 0 || s.toLong * 4 + 4 > miniFatBytes.length) SectEnd
                else mbuf.getInt(s * 4)
            n += 1
          }
          out.toByteArray
        }
      java.util.Arrays.copyOf(raw,
        math.max(0L, math.min(raw.length.toLong, e.size)).toInt)
    }
  }

  // --------------------------------------------------------------- BIFF read

  private[formats] def readXlString(b: ByteBuffer): String = {
    val cch = b.getShort & 0xFFFF
    val flags = b.get() & 0xFF
    // rich-text (0x08) and phonetic (0x04) variants declare their extra
    // block sizes BEFORE the character data and carry the blocks after it;
    // both must be consumed or every following SST string would misparse
    val cRun = if ((flags & 0x08) != 0) b.getShort & 0xFFFF else 0
    val cbExt = if ((flags & 0x04) != 0) b.getInt else 0
    val s =
      if ((flags & 0x01) == 0) {
        val a = new Array[Byte](cch)
        b.get(a)
        new String(a.map(x => (x & 0xFF).toChar))
      } else {
        val a = new Array[Byte](cch * 2)
        b.get(a)
        new String(a, "UTF-16LE")
      }
    b.position(math.min(b.limit(), b.position() + cRun * 4 + cbExt))
    s
  }

  /** Parse the shared string table from the SST record body plus its
    * CONTINUE record bodies ([MS-XLS] 2.4.265 + 2.4.58): header fields
    * never straddle a record break; character data that does is resumed
    * after a RE-STATED compression flag byte at the start of the next
    * part; formatting runs and ExtRst blocks continue raw.
    */
  private[formats] def parseSstParts(parts: IndexedSeq[Array[Byte]]): Seq[String] = {
    if (parts.isEmpty || parts(0).length < 8) return Seq.empty
    val unique = ByteBuffer.wrap(parts(0)).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
    var pi = 0
    var off = 8 // past cstTotal + cstUnique
    def hasMore: Boolean = off < parts(pi).length || pi < parts.length - 1
    def hop(): Unit =
      while (off >= parts(pi).length && pi < parts.length - 1) { pi += 1; off = 0 }
    def u8: Int = { val v = parts(pi)(off) & 0xFF; off += 1; v }
    def u16: Int = { val a = u8; a | (u8 << 8) }
    def u32: Int = { val a = u16; a | (u16 << 16) }
    val out = Seq.newBuilder[String]
    var k = 0
    while (k < unique && hasMore) {
      hop()
      if (parts(pi).length - off < 3) return out.result() // truncated table
      val cch = u16
      val flags = u8
      val cRun = if ((flags & 0x08) != 0) u16 else 0
      val cbExt = if ((flags & 0x04) != 0) u32 else 0
      var wide = (flags & 0x01) != 0
      val sb = new java.lang.StringBuilder(cch)
      var rem = cch
      while (rem > 0 && hasMore) {
        if (off >= parts(pi).length) { hop(); wide = (u8 & 0x01) != 0 }
        if (wide) { val lo = u8; sb.append(((u8 << 8) | lo).toChar) }
        else sb.append(u8.toChar)
        rem -= 1
      }
      var skip = cRun * 4 + cbExt
      while (skip > 0 && hasMore) {
        hop()
        val t = math.min(skip, parts(pi).length - off)
        if (t == 0) skip = 0 else { off += t; skip -= t }
      }
      out += sb.toString
      k += 1
    }
    out.result()
  }

  private def fmtNumber(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Decode one RK-encoded number ([MS-XLS] 2.5.122). */
  private[formats] def rkString(rk: Int): String = {
    val div100 = (rk & 0x01) != 0
    val isInt = (rk & 0x02) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    fmtNumber(if (div100) v / 100 else v)
  }

  /** Decode an .xls payload into its sheets, workbook order preserved.
    * Total over corrupt input: truncated streams and lying record lengths
    * degrade to empty/partial sheets, never an exception (the chunker
    * dispatches real-world `*.xls` here inside an extract UDF).
    */
  def readXls(bytes: Array[Byte]): Seq[XlsxSheet] = {
    try readXlsUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  private def readXlsUnsafe(bytes: Array[Byte]): Seq[XlsxSheet] = {
    val stream = cfbStream(bytes, Set("Workbook", "Book")).getOrElse(return Seq.empty)
    val buf = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)

    // pass 1 — globals: SST + sheet directory
    val sst = scala.collection.mutable.ArrayBuffer.empty[String]
    val bounds = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var pos = 0
    var inGlobals = true
    while (inGlobals && pos + 4 <= stream.length) {
      val id = buf.getShort(pos) & 0xFFFF
      // a declared length past the stream end is corruption; clamp so the
      // last (truncated) record parses as far as the data goes
      val len = math.min(buf.getShort(pos + 2) & 0xFFFF, stream.length - pos - 4)
      val body = ByteBuffer.wrap(stream, pos + 4, len).order(ByteOrder.LITTLE_ENDIAN)
      id match {
        case RecSst =>
          // the table spans this record plus any directly-following
          // CONTINUE records (the loop skips those ids when it meets them)
          val sstParts = scala.collection.mutable.ArrayBuffer(
            java.util.Arrays.copyOfRange(stream, pos + 4, pos + 4 + len))
          var q = pos + 4 + len
          while (q + 4 <= stream.length && (buf.getShort(q) & 0xFFFF) == RecContinue) {
            val clen = math.min(buf.getShort(q + 2) & 0xFFFF, stream.length - q - 4)
            sstParts += java.util.Arrays.copyOfRange(stream, q + 4, q + 4 + clen)
            q += 4 + clen
          }
          sst ++= parseSstParts(sstParts.toIndexedSeq)
        case RecBoundSheet =>
          val off = body.getInt
          body.get(); body.get() // hidden state, sheet type
          val cch = body.get() & 0xFF
          val flags = body.get() & 0xFF
          val name =
            if ((flags & 0x01) == 0) {
              val a = new Array[Byte](cch); body.get(a)
              new String(a.map(x => (x & 0xFF).toChar))
            } else {
              val a = new Array[Byte](cch * 2); body.get(a)
              new String(a, "UTF-16LE")
            }
          bounds += name -> off
        case RecEof => inGlobals = false
        case _ =>
      }
      pos += 4 + len
    }

    // pass 2 — each sheet substream
    bounds.map { case (name, off) =>
      val cells = scala.collection.mutable.HashMap.empty[(Int, Int), String]
      var p = math.max(0, off) // corrupt negative offsets → empty sheet
      var done = false
      def put(r: Int, c: Int, v: String): Unit = cells((r, c)) = v
      while (!done && p + 4 <= stream.length) {
        val id = buf.getShort(p) & 0xFFFF
        val len = math.min(buf.getShort(p + 2) & 0xFFFF, stream.length - p - 4)
        val body = ByteBuffer.wrap(stream, p + 4, len).order(ByteOrder.LITTLE_ENDIAN)
        id match {
          case RecLabelSst =>
            val r = body.getShort & 0xFFFF
            val c = body.getShort & 0xFFFF
            body.getShort // ixfe
            val idx = body.getInt
            put(r, c, if (idx >= 0 && idx < sst.length) sst(idx) else "")
          case RecLabel =>
            val r = body.getShort & 0xFFFF
            val c = body.getShort & 0xFFFF
            body.getShort
            put(r, c, readXlString(body))
          case RecNumber =>
            val r = body.getShort & 0xFFFF
            val c = body.getShort & 0xFFFF
            body.getShort
            put(r, c, fmtNumber(body.getDouble))
          case RecRk =>
            val r = body.getShort & 0xFFFF
            val c = body.getShort & 0xFFFF
            body.getShort
            put(r, c, rkString(body.getInt))
          case RecMulRk =>
            val r = body.getShort & 0xFFFF
            val cFirst = body.getShort & 0xFFFF
            val nCells = (len - 6) / 6
            (0 until nCells).foreach { k =>
              body.getShort // ixfe
              put(r, cFirst + k, rkString(body.getInt))
            }
          case RecEof => done = true
          case _ =>
        }
        p += 4 + len
      }
      val maxRow = if (cells.isEmpty) -1 else cells.keys.map(_._1).max
      val rows = (0 to maxRow).map { r =>
        val rowCells = cells.collect { case ((`r`, c), v) => c -> v }
        if (rowCells.isEmpty) Seq.empty[String]
        else {
          val maxCol = rowCells.keys.max
          (0 to maxCol).map(c => rowCells.getOrElse(c, ""))
        }
      }
      XlsxSheet(name, rows)
    }.toSeq
  }
}
