package graft.ext

/** Disposer-free ImageIO streams over in-memory payloads.
  *
  * `ImageIO.read(InputStream)` / `createImageInputStream` /
  * `createImageOutputStream` wrap every payload in a
  * `MemoryCacheImageInput/OutputStream`, and each of those constructors
  * registers a cleanup record with `sun.java2d.Disposer` — a JVM-GLOBAL
  * synchronized monitor. At one short-lived stream per record that
  * monitor becomes the hottest lock in the process: a thread dump of
  * the 32-wide JPEG re-encode kernel on the 100× replica showed 22 of
  * 32 executor threads BLOCKED on `Disposer.add` (and the same pattern
  * made the audio path 2.6× slower parallel than serial before its SPI
  * fix). A media payload already sitting in a byte array needs neither
  * a cache nor a disposer: these implementations index the array
  * directly through the PUBLIC `ImageInputStreamImpl` /
  * `ImageOutputStreamImpl` scaffolding (seek/mark/bit-IO inherited), so
  * per-record codec work touches no global state at all.
  */
private[ext] final class ByteArrayImageInputStream(buf: Array[Byte])
    extends javax.imageio.stream.ImageInputStreamImpl {

  override def read(): Int = {
    checkClosed()
    bitOffset = 0
    if (streamPos >= buf.length) -1
    else { val v = buf(streamPos.toInt) & 0xFF; streamPos += 1; v }
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    checkClosed()
    bitOffset = 0
    // contract (see FileImageInputStream): a zero-length read is 0 even
    // at EOF — only a real read attempt past the end signals -1
    if (len == 0) 0
    else if (streamPos >= buf.length) -1
    else {
      val n = math.min(len, buf.length - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n
      n
    }
  }

  override def length(): Long = buf.length.toLong
  override def isCached: Boolean = true
  override def isCachedMemory: Boolean = true
}

/** Growable in-memory `ImageOutputStream` (see the Disposer rationale
  * above). Fully seekable with readback — format writers patch headers
  * and length fields after the fact (GIF logical-screen sizes, JPEG
  * segment lengths), which is exactly why `OutputStream` alone is not
  * an `ImageOutputStream`.
  */
private[ext] final class ByteArrayImageOutputStream(initial: Int = 1024)
    extends javax.imageio.stream.ImageOutputStreamImpl {
  private var buf = new Array[Byte](math.max(16, initial))
  private var end = 0

  // streamPos is indexed as an Int throughout — a writer seeking past
  // 2 GB would otherwise wrap to a negative index (AIOOBE, or a silent
  // no-op ensure). Refuse it orderly, mirroring the bound the JDK
  // memory-cache streams enforce; per-record media blobs are MBs, so
  // this is a guard, not a limit anyone hits.
  private def checkIntPos(extra: Int): Int = {
    if (streamPos < 0L || streamPos + extra > Int.MaxValue.toLong)
      throw new java.io.IOException(
        s"in-memory image stream position out of range: $streamPos (+$extra)")
    streamPos.toInt
  }

  private def ensure(cap: Int): Unit =
    if (cap > buf.length) {
      // doubling can overflow Int near 2^31; fall back to the exact
      // requested capacity instead of looping forever on a negative n
      var n = buf.length << 1
      while (n > 0 && n < cap) n <<= 1
      buf = java.util.Arrays.copyOf(buf, if (n < cap || n <= 0) cap else n)
    }

  override def write(b: Int): Unit = {
    checkClosed()
    flushBits() // pending writeBits() bits land before byte writes
    val p = checkIntPos(1)
    ensure(p + 1)
    buf(p) = b.toByte
    streamPos += 1
    if (streamPos > end) end = streamPos.toInt
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    checkClosed()
    flushBits()
    val p = checkIntPos(len)
    ensure(p + len)
    System.arraycopy(b, off, buf, p, len)
    streamPos += len
    if (streamPos > end) end = streamPos.toInt
  }

  override def read(): Int = {
    checkClosed()
    bitOffset = 0
    if (streamPos >= end) -1
    else { val v = buf(streamPos.toInt) & 0xFF; streamPos += 1; v }
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    checkClosed()
    bitOffset = 0
    if (len == 0) 0 // zero-length read is 0 even at EOF (JDK contract)
    else if (streamPos >= end) -1
    else {
      val n = math.min(len, end - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n
      n
    }
  }

  override def length(): Long = end.toLong
  override def isCached: Boolean = true
  override def isCachedMemory: Boolean = true

  def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, end)
}
