package graft.functions

import java.nio.charset.Charset

/** Driver/executor-LOCAL byte assembly utilities — the reference's
  * `Builder` (charsequence.h:1371-1780) and `Buffer`
  * (charsequence.h:1782-2520) re-expressed as plain Scala classes.
  *
  * These are deliberately NOT distributed operators: in the reference
  * they are executor-internal byte plumbing (a mutable deque builder and
  * a mutex-guarded ring buffer), and their distributed analogs are the
  * column functions in [[CharSeq]] / the Dataset pipeline itself. They
  * exist so a user porting reference code that assembles bytes inside a
  * UDF body, a custom source, or driver-side glue has the same surface
  * with the same documented semantics (encoding-converting inserts,
  * primitives rendered as decimal text, geometric ring growth,
  * compound ops under one lock).
  */
object Encodings {
  /** The reference's charset enum (charsequence.h:23-31) as JVM charsets. */
  val byName: Map[String, Charset] = Map(
    "ascii" -> Charset.forName("US-ASCII"),
    "latin1" -> Charset.forName("ISO-8859-1"),
    "utf8" -> Charset.forName("UTF-8"),
    "utf16le" -> Charset.forName("UTF-16LE"),
    "utf16be" -> Charset.forName("UTF-16BE"),
    "utf32le" -> Charset.forName("UTF-32LE"),
    "utf32be" -> Charset.forName("UTF-32BE"))

  def apply(name: String): Charset =
    byName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown encoding: $name"))
}

/** Mutable byte builder over a deque — prepend / positional insert /
  * append of bytes, encoded strings, code points, and primitives
  * rendered as decimal text (charsequence.h:1371-1780). The builder owns
  * a storage encoding; string inputs in another encoding are converted
  * on the way in (decode source, encode storage), exactly like the
  * reference's `Charsequence temp(source, sourceEncoding,
  * storageEncoding)` round-trip. Inserts at `position >= size` append
  * (charsequence.h:1450-1457). Not thread-safe, like the original. */
final class ByteBuilder(val encoding: String = "utf8") {
  private val storage = new scala.collection.mutable.ArrayDeque[Byte]()
  private val cs = Encodings(encoding)

  // a JVM String is already decoded text, so ingesting it just means
  // encoding with the storage charset; the reference's byte-level
  // (source bytes, source encoding) conversion path is appendEncoded
  private def encoded(s: String): Array[Byte] = s.getBytes(cs)

  /** The reference's conversion ingest (`Charsequence temp(source,
    * sourceEncoding, storageEncoding)`): raw bytes in `sourceEncoding`,
    * decoded and re-encoded into the builder's storage encoding. */
  def appendEncoded(bytes: Array[Byte], sourceEncoding: String): this.type =
    append(new String(bytes, Encodings(sourceEncoding)).getBytes(cs))

  /** C++ `ostream << double` default formatting: 6 significant digits,
    * trailing zeros dropped, scientific when the exponent is < -4 or
    * >= 6 (charsequence.h:1530-1543 renders floats through ostream). */
  def formatFloating(v: Double): String =
    if (v.isNaN) "nan"
    else if (v.isPosInfinity) "inf"
    else if (v.isNegInfinity) "-inf"
    else {
      val raw = String.format(java.util.Locale.ROOT, "%.6g", Double.box(v))
      val (mant, exp) = raw.indexOf('e') match {
        case -1 => (raw, "")
        case i => (raw.substring(0, i), raw.substring(i))
      }
      val trimmed =
        if (mant.contains('.'))
          mant.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
        else mant
      trimmed + exp
    }

  def append(b: Byte): this.type = { storage.append(b); this }
  def append(bytes: Array[Byte]): this.type = { storage.appendAll(bytes); this }
  def append(s: String): this.type = append(encoded(s))
  def appendPoint(codePoint: Int): this.type =
    append(new String(Character.toChars(codePoint)).getBytes(cs))
  def append(v: Boolean): this.type = append(if (v) "true" else "false")
  def append(v: Long): this.type = append(v.toString)
  def append(v: Int): this.type = append(v.toString)
  def append(v: Double): this.type = append(formatFloating(v))

  def prepend(b: Byte): this.type = { storage.prepend(b); this }
  def prepend(bytes: Array[Byte]): this.type = { storage.prependAll(bytes); this }
  def prepend(s: String): this.type = prepend(encoded(s))
  def prependPoint(codePoint: Int): this.type =
    prepend(new String(Character.toChars(codePoint)).getBytes(cs))

  def insert(position: Int, bytes: Array[Byte]): this.type = {
    val at = math.min(math.max(position, 0), storage.size) // >= size appends
    storage.insertAll(at, bytes)
    this
  }
  def insert(position: Int, b: Byte): this.type = insert(position, Array(b))
  def insert(position: Int, s: String): this.type =
    insert(position, encoded(s))
  def insertPoint(position: Int, codePoint: Int): this.type =
    insert(position, new String(Character.toChars(codePoint)).getBytes(cs))
  def insert(position: Int, v: Boolean): this.type =
    insert(position, (if (v) "true" else "false").getBytes(cs))
  def insert(position: Int, v: Long): this.type = insert(position, v.toString.getBytes(cs))
  def insert(position: Int, v: Double): this.type =
    insert(position, formatFloating(v).getBytes(cs))

  /** `operator+=` — append the other builder's bytes (converting if the
    * encodings differ, like `append(other.toCharsequence())`). */
  def ++=(other: ByteBuilder): this.type =
    if (other.encoding == encoding) append(other.getBytes)
    else append(other.result())

  def size: Int = storage.size
  def isEmpty: Boolean = storage.isEmpty
  def getBytes: Array[Byte] = storage.toArray
  /** `toCharsequence` — the assembled text, decoded from storage bytes. */
  def result(): String = new String(getBytes, cs)
}

/** Mutex-guarded growable ring buffer of bytes (charsequence.h:
  * 1782-2520): `write`/`append` at the write cursor, `prepend` before
  * the read cursor, consuming `read`, non-consuming `peek`/`data`, and
  * `atomic` for compound operations under the same lock a concurrent
  * writer takes. Capacity grows geometrically — double, or straight to
  * the requirement if doubling is short (charsequence.h:2507-2538) —
  * and growth linearizes the ring to offset zero. `capacity <= 0` takes
  * the reference's 4096 default. JVM monitor == the reference's
  * std::mutex. */
final class ByteRingBuffer(initialCapacity: Int = ByteRingBuffer.DefaultCapacity) {
  private var storage = new Array[Byte](
    if (initialCapacity > 0) initialCapacity else ByteRingBuffer.DefaultCapacity)
  private var readPos = 0
  private var writePos = 0
  private var count = 0

  // string ctor sizes the ring to the source (empty → default capacity,
  // charsequence.h:1790)
  def this(source: String) = {
    this({
      val n = source.getBytes("UTF-8").length
      if (n > 0) n else ByteRingBuffer.DefaultCapacity
    })
    write(source.getBytes("UTF-8"))
  }

  private def ensureCapacity(required: Long): Unit = {
    if (required <= storage.length) return
    val next = new Array[Byte](ByteRingBuffer.grownCapacity(storage.length, required))
    var remaining = count; var pos = readPos; var off = 0
    while (remaining > 0) {
      val chunk = math.min(remaining, storage.length - pos)
      System.arraycopy(storage, pos, next, off, chunk)
      pos = (pos + chunk) % storage.length
      off += chunk; remaining -= chunk
    }
    storage = next
    readPos = 0
    writePos = count % storage.length
  }

  def write(input: Array[Byte]): Int = synchronized {
    if (input.isEmpty) return 0
    if (input.length > storage.length - count) ensureCapacity(count.toLong + input.length)
    var written = 0
    while (written < input.length) {
      val chunk = math.min(input.length - written, storage.length - writePos)
      System.arraycopy(input, written, storage, writePos, chunk)
      writePos = (writePos + chunk) % storage.length
      written += chunk
    }
    count += written
    written
  }
  def write(s: String): Int = write(s.getBytes("UTF-8"))
  def write(b: Byte): Int = write(Array(b))
  def write(v: Boolean): Int = write(if (v) "true" else "false")
  def write(v: Long): Int = write(v.toString)
  /** `append` is the reference's alias for write-at-end. */
  def append(input: Array[Byte]): Int = write(input)

  /** Insert before the READ cursor: the next read returns these bytes
    * first (charsequence.h:2000-2045). */
  def prepend(input: Array[Byte]): Int = synchronized {
    if (input.isEmpty) return 0
    if (input.length > storage.length - count) ensureCapacity(count.toLong + input.length)
    var remaining = input.length
    while (remaining > 0) {
      readPos = (readPos - 1 + storage.length) % storage.length
      storage(readPos) = input(remaining - 1)
      remaining -= 1
    }
    count += input.length
    input.length
  }
  def prepend(s: String): Int = prepend(s.getBytes("UTF-8"))

  /** Consume up to `maxLength` bytes from the read cursor. */
  def read(maxLength: Int): Array[Byte] = synchronized {
    val length = math.min(math.max(maxLength, 0), count)
    val out = new Array[Byte](length)
    var off = 0
    while (off < length) {
      val chunk = math.min(length - off, storage.length - readPos)
      System.arraycopy(storage, readPos, out, off, chunk)
      readPos = (readPos + chunk) % storage.length
      off += chunk
    }
    count -= length
    out
  }

  /** Like read, without consuming. */
  def peek(maxLength: Int): Array[Byte] = synchronized {
    val length = math.min(math.max(maxLength, 0), count)
    val out = new Array[Byte](length)
    var off = 0; var pos = readPos
    while (off < length) {
      val chunk = math.min(length - off, storage.length - pos)
      System.arraycopy(storage, pos, out, off, chunk)
      pos = (pos + chunk) % storage.length
      off += chunk
    }
    out
  }

  /** Everything buffered, without consuming. */
  def data(): Array[Byte] = peek(Int.MaxValue)
  def size: Int = synchronized { count }
  def capacity: Int = synchronized { storage.length }
  def clear(): Unit = synchronized { readPos = 0; writePos = 0; count = 0 }

  /** Shrink storage to the element count (minimum 1), linearized. */
  def shrinkToFit(): Unit = synchronized {
    val linear = peek(count)
    storage = if (linear.isEmpty) new Array[Byte](1) else linear.clone()
    readPos = 0
    writePos = if (linear.isEmpty) 0 else count % storage.length
  }

  /** Run a compound operation under the SAME lock every other method
    * takes — the reference's `atomic(f(storage, readPos, writePos,
    * count))`. The function sees a consistent snapshot and its own
    * reads/writes through the buffer are not interleaved with
    * concurrent writers. */
  def atomic[T](f: ByteRingBuffer => T): T = synchronized { f(this) }
}

/** Charsequence stream I/O (charsequence.h:1337-1350) — the last §2.6
  * row. In the reference, `ostream << cs` writes the sequence's
  * STORAGE-ENCODED bytes raw to the stream, and `istream >> cs` getlines
  * one '\n'-terminated line and decodes it as UTF-8 (the target keeps its
  * storage encoding; re-emitting re-encodes). Our charsequence model is
  * (JVM String, charset name) — the same pair every [[CharSeq]] column
  * function and [[ByteBuilder]] uses — so the parity is a `writeTo` that
  * encodes-and-writes and a `readLine` factory with std::getline
  * semantics. Local-only by design, like Builder/Buffer: the distributed
  * twins are `encodeCharset`/`decodeCharset` columns and
  * `sources.Readers.lines`. */
object CharSeqIO {

  /** `ostream << charsequence` (charsequence.h:1337-1343): encode the
    * text in its storage charset and write the bytes raw — no newline
    * appended, no transcoding of the stream. */
  def writeTo(out: java.io.OutputStream, text: String,
              storageEncoding: String = "utf8"): Unit =
    out.write(text.getBytes(Encodings(storageEncoding)))

  /** `istream >> charsequence` (charsequence.h:1345-1351), which
    * std::getlines: consume bytes up to and including the next '\n' (the
    * delimiter is dropped, a '\r' before it is KEPT — getline splits on
    * '\n' alone), decode them as UTF-8 (invalid sequences → U+FFFD, the
    * reference's decode policy), and yield the line. A final unterminated
    * line is returned; end-of-stream with zero bytes read is the
    * reference's failbit → None. */
  def readLine(in: java.io.InputStream): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream()
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    Some(new String(buf.toByteArray, Encodings("utf8")))
  }

  /** Drain a whole stream through [[readLine]] — the `while (is >> cs)`
    * loop shape. */
  def readLines(in: java.io.InputStream): Vector[String] = {
    val out = Vector.newBuilder[String]
    var line = readLine(in)
    while (line.isDefined) { out += line.get; line = readLine(in) }
    out.result()
  }
}

object ByteRingBuffer {
  val DefaultCapacity = 4096

  /** Growth policy (charsequence.h:2507-2538): double, or straight to the
    * requirement if doubling is short — clamped with Long math so only
    * `required > Int.MaxValue` rejects. Doubling from a capacity past
    * Int.MaxValue/2 must NOT fail while the requirement itself fits. */
  private[graft] def grownCapacity(current: Int, required: Long): Int = {
    require(required <= Int.MaxValue, "buffer capacity overflow")
    math.min(math.max(current.toLong * 2, required), Int.MaxValue.toLong).toInt
  }
}
