package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The Disposer-free ImageIO streams must honor the full
  * `ImageInputStream`/`ImageOutputStream` contract the JDK's format
  * writers rely on — in particular SEEKABLE READBACK, because GIF and
  * JPEG writers patch headers and length fields after writing past
  * them. (The media specs exercise these end-to-end through real
  * codecs; this spec pins the stream semantics directly.)
  */
class ImageStreamsSpec extends AnyFunSuite {

  test("input stream: sequential reads, seek, mark/reset, length") {
    val data = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val in = new ByteArrayImageInputStream(data)
    assert(in.length() == 300L)
    assert(in.read() == (data(0) & 0xFF))
    val buf = new Array[Byte](10)
    assert(in.read(buf, 0, 10) == 10)
    assert(buf.toSeq == data.slice(1, 11).toSeq)
    in.mark()
    assert(in.read() == (data(11) & 0xFF))
    in.reset()
    assert(in.read() == (data(11) & 0xFF))
    in.seek(295L)
    assert(in.read(buf, 0, 10) == 5) // truncated at EOF
    assert(in.read() == -1)
    in.seek(4L)
    assert(in.readInt() == // big-endian default byte order
      (((data(4) & 0xFF) << 24) | ((data(5) & 0xFF) << 16) |
        ((data(6) & 0xFF) << 8) | (data(7) & 0xFF)))
    in.close()
    intercept[java.io.IOException](in.read())
  }

  test("output stream: write, seek-back patch, readback, growth") {
    val out = new ByteArrayImageOutputStream(initial = 4)
    out.write(Array.tabulate[Byte](100)(_.toByte), 0, 100) // forces growth
    assert(out.length() == 100L)
    // header patch: seek back, overwrite 4 bytes, length unchanged
    out.seek(10L)
    out.writeInt(0xCAFEBABE)
    assert(out.length() == 100L)
    // readback from an arbitrary position (what format writers do)
    out.seek(10L)
    assert(out.readInt() == 0xCAFEBABE)
    // writing past the end extends
    out.seek(100L)
    out.write(7)
    assert(out.length() == 101L)
    val bytes = out.toByteArray
    assert(bytes.length == 101)
    assert(bytes(9) == 9.toByte)
    assert((bytes(10) & 0xFF) == 0xCA && (bytes(13) & 0xFF) == 0xBE)
    assert(bytes(14) == 14.toByte) // bytes after the patch untouched
    assert(bytes(100) == 7.toByte)
  }

  test("output stream: bit-level writes flush before byte writes") {
    val out = new ByteArrayImageOutputStream()
    out.writeBit(1) // pending bits must land (padded) before write(int)
    out.write(0xFF)
    val bytes = out.toByteArray
    assert(bytes.length == 2)
    assert((bytes(0) & 0xFF) == 0x80) // the single 1-bit, left-aligned
    assert((bytes(1) & 0xFF) == 0xFF)
  }
}
