package graft.wire

import graft.streaming.{PushBus, SubscriptionSet}
import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import scala.collection.mutable
import scala.util.control.NonFatal

/** Minimal RFC 6455 websocket endpoint mirroring the reference's `/ws`
  * stream surface (frontend/stream/stream.go:105-147, 236-281):
  *
  *  - a client connects and sends a msgpack-binary SubscribeMessage
  *    `{streams: [&#42;/1Min/OHLCV, ...]}` (TBK globs, one level per
  *    '/'); an invalid stream gets `{error: ...}` back
  *    (stream.go:122-147);
  *  - the server pushes msgpack `{key: <TBK>, data: <payload map>}`
  *    binary frames to every subscriber whose glob matches
  *    (stream.go:236-244).
  *
  * The class IS a [[PushBus]]: hand it to a StreamTrigger and every
  * fired bar fans out to matching websocket subscribers — the
  * reference's streamtrigger → stream.Push wiring
  * (contrib/stream/streamtrigger/streamtrigger.go:158-164).
  *
  * Handshake + framing are the public RFC 6455 rules (the JDK HTTP
  * server can't upgrade connections, so this listens on its own
  * socket, like the reference's dedicated upgrade path).
  */
final class WsServer(port: Int = 0, metrics: Option[Metrics] = None)
    extends PushBus with AutoCloseable {
  private val server = new ServerSocket(port)
  @volatile private var running = true

  private final class Conn(val socket: Socket) {
    val out: OutputStream = socket.getOutputStream
    // reuse the engine's subscription semantics (compiled-glob match)
    val streams = new SubscriptionSet
    def subscribed(tbk: String): Boolean = streams.subscribed(tbk)
    def send(bytes: Array[Byte]): Unit = synchronized {
      WsServer.writeFrame(out, 0x2, bytes)
    }
  }

  private val conns = mutable.Set[Conn]()

  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock))
        t.setDaemon(true)
        t.start()
      } catch { case NonFatal(_) => /* closed */ }
    }
  })
  acceptor.setDaemon(true)

  def start(): Unit = acceptor.start()

  override def close(): Unit = {
    running = false
    conns.synchronized { conns.foreach(c => try c.socket.close() catch { case NonFatal(_) => }) }
    server.close()
  }

  /** PushBus: fan a fired bar out to matching subscribers. */
  override def push(tbk: String, payload: Map[String, Any]): Unit = {
    val frame = MsgPack.encode(Map("key" -> tbk, "data" -> payload))
    val targets = conns.synchronized { conns.toSeq }
    targets.foreach { c =>
      if (c.subscribed(tbk)) {
        try c.send(frame)
        catch { case NonFatal(_) => drop(c) }
      }
    }
  }

  private def drop(c: Conn): Unit = {
    // guard the gauge against double drops (push failure + loop exit)
    val removed = conns.synchronized { val r = conns.contains(c); conns -= c; r }
    if (removed) metrics.foreach(_.wsConnections.dec())
    try c.socket.close() catch { case NonFatal(_) => }
  }

  private def serve(sock: Socket): Unit = {
    try {
      val in = sock.getInputStream
      if (!WsServer.handshake(in, sock.getOutputStream)) { sock.close(); return }
      val conn = new Conn(sock)
      conns.synchronized { conns += conn }
      // the reference gauges live WS connections
      // (frontend/stream/stream.go:151-156 metrics.WSConnections)
      metrics.foreach(_.wsConnections.inc())
      var open = true
      while (open && running) {
        WsServer.readFrame(in) match {
          case Some((op, data)) if op == 0x1 || op == 0x2 =>
            try {
              val msg = MsgPack.decode(data).asInstanceOf[Map[Any, Any]]
              val requested = msg.getOrElse("streams", Vector.empty)
                .asInstanceOf[Seq[Any]].map(_.toString)
              val bad = requested.filterNot(_.split("/", -1).length == 3)
              if (bad.nonEmpty)
                conn.send(MsgPack.encode(Map("error" -> s"${bad.head} is an invalid stream")))
              else if (requested.nonEmpty) conn.streams.replaceAll(requested)
            } catch {
              case NonFatal(e) =>
                conn.send(MsgPack.encode(Map("error" ->
                  Option(e.getMessage).getOrElse("bad subscribe message"))))
            }
          case Some((0x9, data)) => // ping → pong
            conn.synchronized { WsServer.writeFrame(conn.out, 0xA, data) }
          case Some((0x8, _)) | None => // close
            open = false
          case Some(_) => // ignore pong/continuation
        }
      }
      drop(conn)
    } catch { case NonFatal(_) => try sock.close() catch { case NonFatal(_) => } }
  }
}

object WsServer {
  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** HTTP Upgrade handshake: parse headers, answer 101 with the
    * RFC 6455 accept key (base64(SHA1(key + GUID))).
    */
  private[wire] def handshake(in: InputStream, out: OutputStream): Boolean = {
    val sb = new StringBuilder
    // read byte-by-byte until CRLFCRLF so not a single byte of the
    // first websocket frame is consumed
    var done = false
    while (!done) {
      val b = in.read()
      if (b == -1) return false
      sb.append(b.toChar)
      if (sb.length >= 4 && sb.substring(sb.length - 4) == "\r\n\r\n") done = true
    }
    val headers = sb.toString
    val keyRe = "(?i)Sec-WebSocket-Key:\\s*(\\S+)".r
    keyRe.findFirstMatchIn(headers) match {
      case Some(m) =>
        val accept = Base64.getEncoder.encodeToString(
          MessageDigest.getInstance("SHA-1")
            .digest((m.group(1) + WsGuid).getBytes(StandardCharsets.UTF_8)))
        out.write(
          ("HTTP/1.1 101 Switching Protocols\r\n" +
            "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
            s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(StandardCharsets.UTF_8))
        out.flush()
        true
      case None => false
    }
  }

  /** Largest client frame accepted: subscribe messages are tiny, so a
    * client-declared multi-GB length is abuse, not traffic — the
    * connection is dropped instead of allocating.
    */
  private[wire] val MaxFramePayload: Long = 1L << 20

  /** One frame: returns (opcode, unmasked payload), or None on
    * EOF / oversized declared length (caller closes the connection).
    */
  private[wire] def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read(); if (b0 == -1) return None
    val b1 = in.read(); if (b1 == -1) return None
    val op = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    var len: Long = (b1 & 0x7f).toLong
    if (len == 126) {
      val h = in.read(); val l = in.read()
      if (h == -1 || l == -1) return None
      len = (h << 8 | l).toLong
    } else if (len == 127) {
      len = 0L
      var i = 0
      while (i < 8) {
        val b = in.read()
        if (b == -1) return None
        len = (len << 8) | b
        i += 1
      }
    }
    if (len < 0 || len > MaxFramePayload) return None
    val mask = new Array[Byte](4)
    if (masked) {
      var i = 0
      while (i < 4) {
        val b = in.read()
        if (b == -1) return None
        mask(i) = b.toByte
        i += 1
      }
    }
    val data = new Array[Byte](len.toInt)
    var off = 0
    while (off < data.length) {
      val n = in.read(data, off, data.length - off)
      if (n == -1) return None
      off += n
    }
    if (masked) {
      var i = 0
      while (i < data.length) { data(i) = (data(i) ^ mask(i % 4)).toByte; i += 1 }
    }
    Some((op, data))
  }

  /** Server frames are unmasked (RFC 6455 §5.1). */
  private[wire] def writeFrame(out: OutputStream, op: Int, data: Array[Byte]): Unit = {
    out.write(0x80 | op)
    if (data.length < 126) out.write(data.length)
    else if (data.length < 65536) {
      out.write(126); out.write(data.length >> 8); out.write(data.length & 0xff)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((data.length.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write(data)
    out.flush()
  }
}
