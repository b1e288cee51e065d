package graft.formats

/** Minimal deterministic USTAR (POSIX.1-1988 tar) writer/reader — the
  * container WebDataset-style training shards ship in
  * ([[graft.pipeline.ShardExport.exportTarShards]]). Implemented from
  * the public ustar layout: 512-byte headers (name[100] mode[8] uid[8]
  * gid[8] size[12] mtime[12] chksum[8] typeflag[1] linkname[100]
  * magic"ustar\0" version"00" …), content zero-padded to 512, archive
  * terminated by two zero blocks. Writes are byte-DETERMINISTIC (fixed
  * mode 0644, uid/gid 0, mtime 0) so a shard's tar bytes — and
  * therefore its checksum — are a pure function of member names and
  * contents, which is what lets the export manifest pin them. The
  * reader exists for round-trip verification; it is total in the usual
  * codec discipline (None on malformed).
  */
object Tar {

  private val Block = 512

  private def octal(value: Long, width: Int): Array[Byte] = {
    // POSIX numeric field: zero-padded octal, NUL terminator
    val s = java.lang.Long.toOctalString(value)
    val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
    padded.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** One member's header block. `name` must fit the 100-byte field. */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameB.length <= 100, s"tar member name too long: $name")
    require(size >= 0 && size < (1L << 33), s"tar member too large: $size")
    val h = new Array[Byte](Block)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8)  // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8)    // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8)    // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12)  // mtime 0: deterministic
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'                                   // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    val ck = java.lang.Long.toOctalString(sum)
    val ckField = ("0" * (6 - ck.length)) + ck + "\u0000 "
    System.arraycopy(ckField.getBytes("US-ASCII"), 0, h, 148, 8)
    h
  }

  /** Serialize members in order; byte-deterministic. */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      out.write(header(name, data.length))
      out.write(data)
      val pad = (Block - (data.length % Block)) % Block
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive
    out.toByteArray
  }

  /** Exact archive size for a member-size list — the arithmetic the
    * export manifest (and its SQL oracle) recompute: 512-byte header +
    * content rounded up to 512 per member, + 1024 trailer.
    */
  def archiveBytes(memberSizes: Seq[Long]): Long =
    memberSizes.map(s => Block + ((s + Block - 1) / Block) * Block).sum + 2L * Block

  /** Total reader for round-trip verification: (name, bytes) in archive
    * order; None on malformed structure. Stops at the first zero block.
    */
  def list(bytes: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    if (bytes == null || bytes.length % Block != 0) return None
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + Block <= bytes.length) {
      if (bytes.slice(off, off + Block).forall(_ == 0)) return Some(out.result())
      val nameEnd = {
        var i = off
        while (i < off + 100 && bytes(i) != 0) i += 1
        i
      }
      val name = new String(bytes, off, nameEnd - off,
        java.nio.charset.StandardCharsets.UTF_8)
      val sizeStr = new String(bytes, off + 124, 12, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      if (sizeStr.isEmpty) return None
      val size = java.lang.Long.parseLong(sizeStr, 8)
      val dataStart = off + Block
      if (size < 0 || dataStart + size > bytes.length) return None
      out += ((name, java.util.Arrays.copyOfRange(bytes, dataStart,
        (dataStart + size).toInt)))
      off = dataStart + (((size + Block - 1) / Block) * Block).toInt
    }
    None // missing end-of-archive blocks
  }
}
