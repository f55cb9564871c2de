package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ByteBuilder, ByteRingBuffer, CharSeqIO, Encodings}

/** Driver-local Builder/Buffer utilities (charsequence.h:1371-1780,
  * 1782-2520) — the reference's documented edge cases: positional insert
  * clamping, encoding-converting ingest, C++ ostream float text,
  * geometric ring growth across wrapped state, and compound atomicity
  * under the shared lock. */
class BuildersSpec extends AnyFunSuite {

  test("builder: append/prepend/insert ordering and position clamp") {
    val b = new ByteBuilder()
    b.append("world").prepend("hello ").insert(6, "brave ")
    assert(b.result() == "hello brave world")
    // insert at/past size appends (charsequence.h:1450-1457)
    b.insert(9999, "!")
    assert(b.result() == "hello brave world!")
    assert(b.size == 18 && !b.isEmpty)
    // byte-level ops
    val raw = new ByteBuilder()
    raw.append(0x62.toByte).prepend(0x61.toByte).append(Array[Byte](0x63))
    assert(raw.result() == "abc")
  }

  test("builder: primitives render as decimal text, C++ ostream float form") {
    val b = new ByteBuilder()
    b.append(42L).append(true).append(-7)
    assert(b.result() == "42true-7")
    // C++ `ostream <<` default: 6 significant digits, trailing zeros
    // stripped, scientific iff exponent < -4 or >= 6
    val f = new ByteBuilder()
    assert(f.formatFloating(1.0) == "1")
    assert(f.formatFloating(0.1) == "0.1")
    assert(f.formatFloating(1.5) == "1.5")
    assert(f.formatFloating(100000.0) == "100000")
    assert(f.formatFloating(1e7) == "1e+07")
    assert(f.formatFloating(1234567.0) == "1.23457e+06")
    assert(f.formatFloating(0.00001) == "1e-05")
    assert(f.formatFloating(-2.25) == "-2.25")
  }

  test("builder: encoding-converting ingest and cross-encoding combine") {
    // utf16le source bytes into a utf8 builder — the reference's
    // Charsequence(source, sourceEncoding, storageEncoding) round-trip
    val b = new ByteBuilder("utf8")
    b.appendEncoded("héllo".getBytes("UTF-16LE"), "utf16le")
    assert(b.result() == "héllo")
    assert(b.getBytes.length == "héllo".getBytes("UTF-8").length)
    // code points encode with the STORAGE charset
    val wide = new ByteBuilder("utf16be")
    wide.appendPoint(0x1F600) // surrogate pair in utf16
    assert(wide.getBytes.length == 4)
    assert(wide.result() == new String(Character.toChars(0x1F600)))
    // ++= converts the other builder's bytes into this encoding
    val a8 = new ByteBuilder("utf8"); a8.append("ab ")
    val c16 = new ByteBuilder("utf16le"); c16.append("cd")
    a8 ++= c16
    assert(a8.result() == "ab cd")
    intercept[IllegalArgumentException](new ByteBuilder("klingon"))
  }

  test("buffer: FIFO read/write with wraparound across the ring boundary") {
    val buf = new ByteRingBuffer(8)
    assert(buf.write("abcde".getBytes("UTF-8")) == 5)
    assert(new String(buf.read(3), "UTF-8") == "abc") // readPos now 3
    assert(buf.write("fghij".getBytes("UTF-8")) == 5) // wraps past index 7
    assert(buf.size == 7 && buf.capacity == 8)
    assert(new String(buf.read(100), "UTF-8") == "defghij")
    assert(buf.size == 0)
    // peek does not consume; data returns everything
    buf.write("xyz")
    assert(new String(buf.peek(2), "UTF-8") == "xy")
    assert(new String(buf.data(), "UTF-8") == "xyz")
    assert(buf.size == 3)
  }

  test("buffer: geometric growth preserves wrapped content; shrinkToFit; clear") {
    val buf = new ByteRingBuffer(4)
    buf.write("abcd")
    buf.read(2) // readPos 2, wrapped layout after next write
    buf.write("ef") // count 4 again, physically wrapped
    // force growth: doubling (4→8) suffices here
    buf.write("ghij")
    assert(buf.capacity == 8 && buf.size == 8)
    // a demand beyond double jumps straight to the requirement
    val big = new Array[Byte](100); java.util.Arrays.fill(big, 'z'.toByte)
    buf.write(big)
    assert(buf.capacity == 108) // 8*2=16 < 108 → exact requirement
    assert(new String(buf.read(8), "UTF-8") == "cdefghij")
    assert(buf.size == 100)
    buf.shrinkToFit()
    assert(buf.capacity == 100 && buf.size == 100)
    assert(buf.read(100).forall(_ == 'z'.toByte))
    buf.clear()
    assert(buf.size == 0)
    // capacity <= 0 takes the 4096 default; string ctor sizes to source
    assert(new ByteRingBuffer(0).capacity == ByteRingBuffer.DefaultCapacity)
    assert(new ByteRingBuffer("hello").capacity == 5)
    assert(new ByteRingBuffer("").capacity == ByteRingBuffer.DefaultCapacity)
  }

  test("buffer: prepend lands before the read cursor") {
    val buf = new ByteRingBuffer(8)
    buf.write("world")
    buf.prepend("hello ".getBytes("UTF-8")) // forces growth too: 11 > 8
    assert(new String(buf.read(100), "UTF-8") == "hello world")
  }

  test("buffer: atomic compound ops are consistent under concurrent writers") {
    // invariant: each atomic block reads one byte and writes it back —
    // under the shared lock the total byte count never changes mid-flight
    // and no byte is lost, however many writers interleave
    val buf = new ByteRingBuffer(16)
    buf.write("0123456789")
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        (0 until 500).foreach { _ =>
          buf.atomic { b =>
            val one = b.read(1)
            assert(one.length == 1)
            b.write(one)
            assert(b.size == 10)
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val survivors = buf.read(100)
    assert(survivors.length == 10)
    assert(survivors.sorted.toSeq == "0123456789".getBytes("UTF-8").toSeq)
  }

  test("buffer: growth policy clamps with Long math — only required > Int.MaxValue rejects") {
    // doubling from a capacity past Int.MaxValue/2 must not fail while
    // the requirement itself fits (the pure policy is tested — allocating
    // 2 GiB arrays is not the point)
    val big = Int.MaxValue / 2 + 10
    assert(ByteRingBuffer.grownCapacity(big, big.toLong + 20) == Int.MaxValue)
    assert(ByteRingBuffer.grownCapacity(100, 300L) == 300)
    assert(ByteRingBuffer.grownCapacity(100, 150L) == 200) // doubling wins
    intercept[IllegalArgumentException] {
      ByteRingBuffer.grownCapacity(100, Int.MaxValue.toLong + 1)
    }
  }

  test("charsequence stream <</>>: writeTo emits storage-encoded bytes, readLine getlines") {
    // << writes the ENCODED bytes raw (charsequence.h:1337-1343): byte
    // output equals getBytes() in every reference charset
    val text = "héllo 世界 😀" // Latin-1, CJK, emoji
    for (cs <- Seq("ascii", "latin1", "utf8", "utf16le", "utf16be",
                   "utf32le", "utf32be")) {
      val bos = new java.io.ByteArrayOutputStream()
      CharSeqIO.writeTo(bos, text, cs)
      assert(bos.toByteArray.toSeq == text.getBytes(Encodings(cs)).toSeq,
        s"charset $cs")
    }
    // utf8 write → readLine round-trips text exactly, line by line;
    // '\r' is kept (getline splits on '\n' alone); empty lines survive;
    // a final unterminated line is returned; EOF → None
    val bos = new java.io.ByteArrayOutputStream()
    CharSeqIO.writeTo(bos, "first\nsecond\r\n\n世界 tail")
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    assert(CharSeqIO.readLine(in).contains("first"))
    assert(CharSeqIO.readLine(in).contains("second\r"))
    assert(CharSeqIO.readLine(in).contains(""))
    assert(CharSeqIO.readLine(in).contains("世界 tail"))
    assert(CharSeqIO.readLine(in).isEmpty)
    // >> decodes as UTF-8 with the U+FFFD policy for invalid sequences
    val bad = new java.io.ByteArrayInputStream(
      Array[Byte]('a', 0xff.toByte, 'b', '\n'))
    assert(CharSeqIO.readLine(bad).contains("a�b"))
    // drain loop: an empty stream yields no lines, not an empty line
    assert(CharSeqIO.readLines(new java.io.ByteArrayInputStream(Array.empty)) == Vector())
    assert(CharSeqIO.readLines(new java.io.ByteArrayInputStream("a\nb".getBytes))
      == Vector("a", "b"))
  }
}
