package graft.wire

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal MessagePack codec (public spec:
  * github.com/msgpack/msgpack/blob/master/spec.md) — just the subset
  * the marketstore wire protocol uses: nil/bool/int/float/str/bin/
  * array/map. The reference speaks msgpack-encoded JSON-RPC 2.0 on
  * `/rpc` (utils/rpc/msgpack2/server.go:24-60); this codec lets the
  * engine serve the same byte format with zero added dependencies.
  *
  * Scala↔wire mapping: decode yields Long for every int family,
  * Double for both float widths, String for str, Array[Byte] for bin,
  * Vector[Any] for arrays and Map[Any, Any] for maps. Encode accepts
  * the same plus Int/Boolean/Float and null.
  */
object MsgPack {

  // ---------------------------------------------------------------- encode

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    write(out, v)
    out.toByteArray
  }

  private def write(out: ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case s: Short => writeLong(out, s.toLong)
    case b: Byte => writeLong(out, b.toLong)
    case f: Float => { out.write(0xca); writeBE(out, java.lang.Float.floatToIntBits(f), 4) }
    case d: Double => { out.write(0xcb); writeBE(out, java.lang.Double.doubleToLongBits(d), 8) }
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xda); writeBE(out, b.length.toLong, 2) }
      else { out.write(0xdb); writeBE(out, b.length.toLong, 4) }
      out.write(b, 0, b.length)
    case b: Array[Byte] =>
      if (b.length < 256) { out.write(0xc4); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xc5); writeBE(out, b.length.toLong, 2) }
      else { out.write(0xc6); writeBE(out, b.length.toLong, 4) }
      out.write(b, 0, b.length)
    case m: scala.collection.Map[_, _] =>
      val n = m.size
      if (n < 16) out.write(0x80 | n)
      else if (n < 65536) { out.write(0xde); writeBE(out, n.toLong, 2) }
      else { out.write(0xdf); writeBE(out, n.toLong, 4) }
      m.foreach { case (k, value) => write(out, k); write(out, value) }
    case s: scala.collection.Seq[_] =>
      val n = s.size
      if (n < 16) out.write(0x90 | n)
      else if (n < 65536) { out.write(0xdc); writeBE(out, n.toLong, 2) }
      else { out.write(0xdd); writeBE(out, n.toLong, 4) }
      s.foreach(write(out, _))
    case other =>
      throw new IllegalArgumentException(s"msgpack: unsupported type ${other.getClass}")
  }

  private def writeLong(out: ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0 && v <= 127) out.write(v.toInt)
    else if (v < 0 && v >= -32) out.write(0xe0 | (v.toInt & 0x1f))
    else if (v >= Byte.MinValue && v <= Byte.MaxValue) { out.write(0xd0); out.write(v.toInt & 0xff) }
    else if (v >= Short.MinValue && v <= Short.MaxValue) { out.write(0xd1); writeBE(out, v, 2) }
    else if (v >= Int.MinValue && v <= Int.MaxValue) { out.write(0xd2); writeBE(out, v, 4) }
    else { out.write(0xd3); writeBE(out, v, 8) }
  }

  private def writeBE(out: ByteArrayOutputStream, v: Long, width: Int): Unit = {
    var i = width - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Any = {
    val buf = ByteBuffer.wrap(bytes) // big-endian by default, per spec
    read(buf)
  }

  private def read(buf: ByteBuffer): Any = {
    val b = buf.get() & 0xff
    b match {
      case x if x <= 0x7f => x.toLong // positive fixint
      case x if x >= 0xe0 => (x - 256).toLong // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(buf, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => readArray(buf, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(buf, x & 0x1f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => readBin(buf, buf.get() & 0xff)
      case 0xc5 => readBin(buf, buf.getShort() & 0xffff)
      case 0xc6 => readBin(buf, buf.getInt())
      case 0xca => buf.getFloat().toDouble
      case 0xcb => buf.getDouble()
      case 0xcc => (buf.get() & 0xff).toLong
      case 0xcd => (buf.getShort() & 0xffff).toLong
      case 0xce => buf.getInt().toLong & 0xffffffffL
      case 0xcf => buf.getLong() // uint64 (values > Long.MaxValue wrap)
      case 0xd0 => buf.get().toLong
      case 0xd1 => buf.getShort().toLong
      case 0xd2 => buf.getInt().toLong
      case 0xd3 => buf.getLong()
      case 0xd9 => readStr(buf, buf.get() & 0xff)
      case 0xda => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb => readStr(buf, buf.getInt())
      case 0xdc => readArray(buf, buf.getShort() & 0xffff)
      case 0xdd => readArray(buf, buf.getInt())
      case 0xde => readMap(buf, buf.getShort() & 0xffff)
      case 0xdf => readMap(buf, buf.getInt())
      case other =>
        throw new IllegalArgumentException(f"msgpack: unsupported format byte 0x$other%02x")
    }
  }

  private def readStr(buf: ByteBuffer, n: Int): String = {
    val b = new Array[Byte](n); buf.get(b); new String(b, StandardCharsets.UTF_8)
  }
  private def readBin(buf: ByteBuffer, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); buf.get(b); b
  }
  private def readArray(buf: ByteBuffer, n: Int): Vector[Any] =
    Vector.fill(n)(read(buf))
  private def readMap(buf: ByteBuffer, n: Int): Map[Any, Any] = {
    val b = Map.newBuilder[Any, Any]
    var i = 0
    while (i < n) { val k = read(buf); val v = read(buf); b += (k -> v); i += 1 }
    b.result()
  }
}
