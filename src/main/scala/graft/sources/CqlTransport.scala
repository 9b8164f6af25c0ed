package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal CQL native-protocol v4 client — the read transport behind
  * [[CassandraV3Source.liveSpans]], written against the PUBLIC protocol
  * spec (apache/cassandra `doc/native_protocol_v4.spec`), no driver
  * library (none resolves in this sandbox — SURVEY §7.4). The same
  * in-house-transport move EsHttpTransport made for the ES backend: the
  * reference reads C* through the spark-cassandra-connector
  * (cassandra3/.../CassandraDependenciesJob.java:174-177); this client
  * speaks just the slice of the wire protocol that token-range scans
  * need — STARTUP/AUTH handshake, QUERY with result paging, RESULT Rows
  * decode — and nothing else.
  *
  * Scope, deliberately tight:
  *  - protocol version pinned to v4 (every 3.x/4.x/5.x server speaks it);
  *  - one in-flight request per connection (stream id 0) — each Spark task
  *    owns one connection and drains one range sequentially, exactly like
  *    a scroll slice in EsSpanSource, so multiplexing buys nothing;
  *  - no compression, no prepared statements, no events;
  *  - decode covers the types the `zipkin2.span` table uses (text/bigint/
  *    boolean/int/map/UDT/list/set/blob/uuid/inet/timestamp); unhandled
  *    PRIMITIVE type ids (bare [short], no nested metadata) surface their
  *    raw bytes rather than failing the row — only an unknown
  *    collection-range id (>= 0x0020), whose nested params can't be
  *    skipped, fails the scan.
  */
object Cql {
  // opcodes (spec §2.4)
  val OpError = 0x00
  val OpStartup = 0x01
  val OpReady = 0x02
  val OpAuthenticate = 0x03
  val OpQuery = 0x07
  val OpResult = 0x08
  val OpAuthResponse = 0x0F
  val OpAuthSuccess = 0x10

  val RequestVersion: Byte = 0x04
  val ResponseVersion: Byte = 0x84.toByte

  /** LOCAL_ONE — the analytics-scan consistency the reference's connector
    * path uses (one replica, local DC; a full-ring scan re-reads every row
    * anyway, so quorum buys nothing). */
  val ConsistencyLocalOne: Short = 0x000A

  // ---- CQL type descriptors (spec §6: [option] ids) -----------------------

  sealed trait CqlType
  object CqlType {
    case object Ascii extends CqlType
    case object Varchar extends CqlType
    case object Bigint extends CqlType // also counter / timestamp / time
    case object Int32 extends CqlType
    case object Smallint extends CqlType
    case object Tinyint extends CqlType
    case object Bool extends CqlType
    case object Dbl extends CqlType
    case object Flt extends CqlType
    case object Blob extends CqlType
    case object Uuid extends CqlType // also timeuuid
    case object Inet extends CqlType
    case object DateT extends CqlType
    final case class ListT(elem: CqlType) extends CqlType // also set
    final case class MapT(key: CqlType, value: CqlType) extends CqlType
    final case class Udt(keyspace: String, name: String,
        fields: Seq[(String, CqlType)]) extends CqlType
    final case class TupleT(elems: Seq[CqlType]) extends CqlType
    final case class Custom(className: String) extends CqlType
  }

  /** One page of a query: column metadata (absent pages after the first may
    * reuse the first page's via NO_METADATA), decoded rows, continuation. */
  final case class Page(columns: Seq[(String, CqlType)], rows: Seq[Array[Any]],
      pagingState: Option[Array[Byte]])

  // ---- body primitives (spec §3 notations) --------------------------------

  def readString(bb: ByteBuffer): String = {
    val n = bb.getShort & 0xFFFF
    val a = new Array[Byte](n); bb.get(a); new String(a, UTF_8)
  }

  def readBytes(bb: ByteBuffer): Array[Byte] = { // [bytes]; null -> null
    val n = bb.getInt
    if (n < 0) null else { val a = new Array[Byte](n); bb.get(a); a }
  }

  def writeString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); out.writeShort(b.length); out.write(b)
  }

  def writeLongString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); out.writeInt(b.length); out.write(b)
  }

  def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1) else { out.writeInt(b.length); out.write(b) }

  def readType(bb: ByteBuffer): CqlType = (bb.getShort & 0xFFFF) match {
    case 0x0000 => CqlType.Custom(readString(bb))
    case 0x0001 => CqlType.Ascii
    case 0x0002 | 0x0005 | 0x000B | 0x0012 => CqlType.Bigint // bigint/counter/timestamp/time
    case 0x0003 => CqlType.Blob
    case 0x0004 => CqlType.Bool
    case 0x0007 => CqlType.Dbl
    case 0x0008 => CqlType.Flt
    case 0x0009 => CqlType.Int32
    case 0x000C | 0x000F => CqlType.Uuid
    case 0x000D => CqlType.Varchar
    case 0x0010 => CqlType.Inet
    case 0x0011 => CqlType.DateT
    case 0x0013 => CqlType.Smallint
    case 0x0014 => CqlType.Tinyint
    case 0x0020 | 0x0022 => CqlType.ListT(readType(bb)) // list/set
    case 0x0021 => CqlType.MapT(readType(bb), readType(bb))
    case 0x0030 =>
      val ks = readString(bb); val name = readString(bb)
      val n = bb.getShort & 0xFFFF
      CqlType.Udt(ks, name, (0 until n).map(_ => (readString(bb), readType(bb))))
    case 0x0031 =>
      val n = bb.getShort & 0xFFFF
      CqlType.TupleT((0 until n).map(_ => readType(bb)))
    // every remaining v4 primitive id (decimal 0x0006, varint 0x000E, …)
    // is a bare [short] with no nested metadata to skip, so an unhandled
    // one decodes Blob-style — raw bytes surface instead of killing the
    // scan when a SELECT * crosses such a column. Ids at/above 0x0020 that
    // we don't know are NOT safe: they could carry nested type params this
    // reader can't skip, so those still fail loudly.
    case other if other < 0x0020 => CqlType.Blob
    case other => throw new IOException(f"unknown CQL type id 0x$other%04x")
  }

  /** Decode one serialized value. Unknown/custom types surface raw bytes. */
  def decode(t: CqlType, b: Array[Byte]): Any =
    if (b == null) null
    else t match {
      case CqlType.Ascii | CqlType.Varchar => new String(b, UTF_8)
      case CqlType.Bigint => ByteBuffer.wrap(b).getLong
      case CqlType.Int32 | CqlType.DateT => ByteBuffer.wrap(b).getInt
      case CqlType.Smallint => ByteBuffer.wrap(b).getShort
      case CqlType.Tinyint => b(0)
      case CqlType.Bool => b(0) != 0
      case CqlType.Dbl => ByteBuffer.wrap(b).getDouble
      case CqlType.Flt => ByteBuffer.wrap(b).getFloat
      case CqlType.Uuid =>
        val bb = ByteBuffer.wrap(b); new java.util.UUID(bb.getLong, bb.getLong).toString
      case CqlType.Inet => java.net.InetAddress.getByAddress(b).getHostAddress
      case CqlType.ListT(e) => // v4 collections: [int n] + n × [bytes]
        val bb = ByteBuffer.wrap(b)
        (0 until bb.getInt).map(_ => decode(e, readBytes(bb)))
      case CqlType.MapT(k, v) =>
        val bb = ByteBuffer.wrap(b)
        (0 until bb.getInt).map(_ => (decode(k, readBytes(bb)), decode(v, readBytes(bb)))).toMap
      case CqlType.Udt(_, _, fields) => // concatenated [bytes], trailing may be absent
        val bb = ByteBuffer.wrap(b)
        fields.iterator.takeWhile(_ => bb.remaining() > 0).map {
          case (name, ft) => name -> decode(ft, readBytes(bb))
        }.toMap
      case CqlType.TupleT(elems) =>
        val bb = ByteBuffer.wrap(b)
        elems.map(e => decode(e, readBytes(bb)))
      case CqlType.Blob | CqlType.Custom(_) => b
    }
}

/** One CQL connection: blocking handshake on construction, then sequential
  * `query` calls. AutoCloseable; a Spark task wraps its range drain in a
  * try/finally around one instance.
  *
  * `ssl = Some(ctx)` upgrades the connected socket to TLS before the CQL
  * handshake — the CASSANDRA_USE_SSL path
  * (CassandraDependenciesJob.java:71); production callers pass
  * `SSLContext.getDefault`, which honors the standard `javax.net.ssl.*`
  * system properties, and the scripted TLS spec injects its own trust. */
final class CqlClient(host: String, port: Int,
    username: Option[String] = None, password: Option[String] = None,
    timeoutMs: Int = 10000,
    ssl: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {
  import Cql._

  private val socket: Socket = {
    val plain = new Socket()
    plain.connect(new InetSocketAddress(host, port), timeoutMs)
    plain.setSoTimeout(timeoutMs)
    plain.setTcpNoDelay(true)
    ssl match {
      case Some(ctx) =>
        val tls = ctx.getSocketFactory.createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        tls.startHandshake() // fail now, at connect, not inside the CQL exchange
        tls
      case None => plain
    }
  }
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))

  handshake()

  private def send(opcode: Int, body: Array[Byte]): Unit = {
    out.writeByte(RequestVersion)
    out.writeByte(0) // flags: no compression
    out.writeShort(0) // stream id 0: one in-flight request per connection
    out.writeByte(opcode)
    out.writeInt(body.length)
    out.write(body)
    out.flush()
  }

  /** Read one response frame, unwrapping tracing/warning prefixes; returns
    * (opcode, body positioned past any prefixes). */
  private def receive(): (Int, ByteBuffer) = {
    val header = new Array[Byte](9)
    in.readFully(header)
    val hb = ByteBuffer.wrap(header)
    val version = hb.get()
    if (version != ResponseVersion)
      throw new IOException(f"unexpected protocol version byte 0x${version & 0xFF}%02x")
    val flags = hb.get()
    val stream = hb.getShort
    val opcode = hb.get() & 0xFF
    val len = hb.getInt
    if (stream != 0) throw new IOException(s"response for unknown stream $stream")
    if ((flags & 0x01) != 0) throw new IOException("compressed frame but compression never negotiated")
    val body = new Array[Byte](len)
    in.readFully(body)
    val bb = ByteBuffer.wrap(body)
    if ((flags & 0x02) != 0) { bb.getLong; bb.getLong } // tracing id: skip uuid
    if ((flags & 0x08) != 0) { // warnings: [string list], read & drop
      val n = bb.getShort & 0xFFFF
      (0 until n).foreach(_ => readString(bb))
    }
    if ((flags & 0x04) != 0) throw new IOException("unexpected custom payload flag")
    (opcode, bb)
  }

  private def fail(bb: ByteBuffer): Nothing = {
    val code = bb.getInt
    throw new IOException(f"CQL error 0x$code%04x: ${readString(bb)}")
  }

  private def handshake(): Unit = {
    val body = new ByteArrayOutputStream()
    val dos = new DataOutputStream(body)
    dos.writeShort(1) // [string map] of one option
    writeString(dos, "CQL_VERSION"); writeString(dos, "3.0.0")
    send(OpStartup, body.toByteArray)
    receive() match {
      case (OpReady, _) => ()
      case (OpAuthenticate, _) =>
        val (user, pass) = (username.getOrElse(""), password.getOrElse(""))
        // SASL PLAIN: 0x00 user 0x00 pass — what PasswordAuthenticator expects
        val token = (Array[Byte](0) ++ user.getBytes(UTF_8) ++
          Array[Byte](0) ++ pass.getBytes(UTF_8))
        val auth = new ByteArrayOutputStream(); val ad = new DataOutputStream(auth)
        writeBytes(ad, token)
        send(OpAuthResponse, auth.toByteArray)
        receive() match {
          case (OpAuthSuccess, _) => ()
          case (OpError, bb) => fail(bb)
          case (op, _) => throw new IOException(f"unexpected opcode 0x$op%02x during auth")
        }
      case (OpError, bb) => fail(bb)
      case (op, _) => throw new IOException(f"unexpected opcode 0x$op%02x to STARTUP")
    }
  }

  /** One page of `cql`. `pagingState` threads the continuation returned by
    * the previous page (spec §8: opaque bytes). */
  def query(cql: String, pageSize: Int, pagingState: Option[Array[Byte]] = None): Page = {
    val body = new ByteArrayOutputStream()
    val dos = new DataOutputStream(body)
    writeLongString(dos, cql)
    dos.writeShort(ConsistencyLocalOne)
    val flags = 0x04 | pagingState.fold(0)(_ => 0x08) // page_size [+ paging_state]
    dos.writeByte(flags)
    dos.writeInt(pageSize)
    pagingState.foreach(ps => writeBytes(dos, ps))
    send(OpQuery, body.toByteArray)
    receive() match {
      case (OpResult, bb) => decodeResult(bb)
      case (OpError, bb) => fail(bb)
      case (op, _) => throw new IOException(f"unexpected opcode 0x$op%02x to QUERY")
    }
  }

  /** Drain every row of `cql`, following pages lazily — the iterator shape
    * mapPartitions streams from, like EsSpanSource.scrollSlice. */
  def queryAll(cql: String, pageSize: Int): Iterator[(Seq[(String, Cql.CqlType)], Array[Any])] =
    new Iterator[Seq[(Seq[(String, Cql.CqlType)], Array[Any])]] {
      private var page: Page = query(cql, pageSize)
      private var done = false
      override def hasNext: Boolean = !done
      override def next(): Seq[(Seq[(String, Cql.CqlType)], Array[Any])] = {
        val out = page.rows.map(r => (page.columns, r))
        page.pagingState match {
          case Some(ps) => page = query(cql, pageSize, Some(ps))
          case None => done = true
        }
        out
      }
    }.flatten

  private def decodeResult(bb: ByteBuffer): Page = bb.getInt match {
    case 0x0001 => Page(Nil, Nil, None) // Void
    case 0x0002 => // Rows (spec §4.2.5.2)
      val flags = bb.getInt
      val columnCount = bb.getInt
      val pagingState =
        if ((flags & 0x0002) != 0) Option(readBytes(bb)) else None // Has_more_pages
      val globalSpec = (flags & 0x0001) != 0
      // this client never sets the QUERY skip-metadata flag, so a
      // metadata-less Rows response is a protocol violation, not a case
      // to limp through with undecodable raw bytes
      if ((flags & 0x0004) != 0)
        throw new IOException("NO_METADATA rows but SKIP_METADATA never requested")
      if (globalSpec) { readString(bb); readString(bb) } // ks, table
      val columns: Seq[(String, CqlType)] =
        (0 until columnCount).map { _ =>
          if (!globalSpec) { readString(bb); readString(bb) } // per-col ks, table
          (readString(bb), readType(bb))
        }
      val rowCount = bb.getInt
      val rows = (0 until rowCount).map { _ =>
        val vals = new Array[Any](columnCount)
        var c = 0
        while (c < columnCount) {
          vals(c) = decode(columns(c)._2, readBytes(bb))
          c += 1
        }
        vals
      }
      Page(columns, rows, pagingState)
    case kind => throw new IOException(f"unsupported RESULT kind 0x$kind%04x")
  }

  override def close(): Unit = {
    try socket.close() catch { case _: IOException => () }
  }
}
