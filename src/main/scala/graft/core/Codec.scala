package graft.core

/** Posting-list compression kernels (pure Scala, no Spark).
  *
  * Delta-gap + variable-byte block coding of sorted docId runs, per the
  * PForDelta/VByte family. This is the engine's analog of the reference's
  * lossless/lossy vector compression stage (jvector
  * `pq/ProductQuantization.java:389-430` encode/decode pair) — here the
  * payload is monotone Long runs + small Int frequencies instead of float
  * vectors, so the right codec is gap+varbyte, not PQ.
  *
  * Layout invariants:
  *  - docIds within a block are strictly increasing; first value is stored
  *    as a delta from `base` (the previous block's last docId, or 0).
  *  - tfs are >= 1 and stored as (tf - 1) varbyte.
  *  - A block holds at most [[Codec.BlockSize]] postings.
  */
object Codec {
  /** Postings per block. 128 mirrors the classic block-max literature and
    * keeps skip granularity fine enough for WAND. */
  val BlockSize = 128

  // ---------------- varbyte ----------------

  /** Encoded byte size of a non-negative value under [[writeVLong]] —
    * shared by the manifest metaBytes accounting. */
  def vlen(v0: Long): Int = {
    var n = 1
    var v = v0 >>> 7
    while (v != 0) { n += 1; v >>>= 7 }
    n
  }

  /** Append v as LEB128-style varbyte (7 bits per byte, high bit = continue). */
  def writeVLong(buf: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varbyte requires non-negative, got $v0")
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      buf.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    buf.write(v.toInt)
  }

  /** Decode all varbyte longs from bytes. */
  def readVLongs(bytes: Array[Byte]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](BlockSize)
    var i = 0
    while (i < bytes.length) {
      var v = 0L; var shift = 0; var b = 0
      do {
        b = bytes(i) & 0xFF; i += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      out += v
    }
    out.toArray
  }

  /** Delta-gap + varbyte encode a strictly-increasing docId run.
    * @param base exclusive lower bound (previous block's last docId; -1 for first block)
    */
  def encodeDocIds(docIds: Array[Long], base: Long): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(docIds.length * 2)
    var prev = base
    var i = 0
    while (i < docIds.length) {
      val d = docIds(i)
      require(d > prev, s"docIds must be strictly increasing: $d after $prev")
      writeVLong(buf, d - prev - 1) // gap-1: consecutive ids cost 1 byte of 0
      prev = d
      i += 1
    }
    buf.toByteArray
  }

  def decodeDocIds(bytes: Array[Byte], base: Long): Array[Long] = {
    val gaps = readVLongs(bytes)
    val out = new Array[Long](gaps.length)
    var prev = base
    var i = 0
    while (i < gaps.length) {
      prev = prev + gaps(i) + 1
      out(i) = prev
      i += 1
    }
    out
  }

  /** Varbyte encode term frequencies (each >= 1; stored as tf-1). */
  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(tfs.length)
    var i = 0
    while (i < tfs.length) {
      require(tfs(i) >= 1, s"tf must be >= 1, got ${tfs(i)}")
      writeVLong(buf, (tfs(i) - 1).toLong)
      i += 1
    }
    buf.toByteArray
  }

  def decodeTfs(bytes: Array[Byte]): Array[Int] = {
    val vs = readVLongs(bytes)
    val out = new Array[Int](vs.length)
    var i = 0
    while (i < vs.length) { out(i) = (vs(i) + 1).toInt; i += 1 }
    out
  }
}
