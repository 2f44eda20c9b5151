package graft.avro

/** Confluent CP1 wire framing: `0x00 | 4-byte big-endian schema id |
  * avro binary body` — the `serializer.framing=cp1` configured in the
  * reference (`src/SchemaRegistry.cpp:25-28`).
  */
object ConfluentFraming {
  val Magic: Byte = 0x00
  val HeaderLen = 5

  sealed trait Unframed
  final case class Framed(schemaId: Int, body: Array[Byte], bodyOffset: Int, bodyLen: Int) extends Unframed
  case object BadMagic extends Unframed
  case object Truncated extends Unframed

  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + body.length)
    out(0) = Magic
    out(1) = ((schemaId >>> 24) & 0xff).toByte
    out(2) = ((schemaId >>> 16) & 0xff).toByte
    out(3) = ((schemaId >>> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(body, 0, out, HeaderLen, body.length)
    out
  }

  /** Zero-copy unframe: returns the region of `bytes` holding the body. */
  def unframe(bytes: Array[Byte]): Unframed = {
    if (bytes == null || bytes.length < HeaderLen) Truncated
    else if (bytes(0) != Magic) BadMagic
    else {
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      Framed(id, bytes, HeaderLen, bytes.length - HeaderLen)
    }
  }
}
