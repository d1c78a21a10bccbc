package graft

import graft.multimodal.Mp3

/** The strict MPEG-1 Layer III metadata parser: spec arithmetic,
  * round-trips over the synthetic corpus, and loud rejection of every
  * malformation class the walker guards against.
  */
class Mp3Spec extends SparkTestBase {
  import spark.implicits._

  test("frame length and duration follow the ISO 11172-3 arithmetic") {
    // 128 kbps @ 44100 Hz: 144*128000/44100 = 417 (+1 padded)
    assert(Mp3.frameLength(128, 44100, 0) === 417)
    assert(Mp3.frameLength(128, 44100, 1) === 418)
    // 320 kbps @ 32000 Hz: 144*320000/32000 = 1440
    assert(Mp3.frameLength(320, 32000, 0) === 1440)
    val bytes = (0 until 4).toArray.flatMap(f =>
      Mp3.encodeFrame(9, 1, 0, 3, _ => 0)) // 128 kbps @ 48000, mono
    val m = Mp3.decodeMp3Meta(bytes).get
    assert(m.nFrames === 4L && m.sampleRate === 48000L &&
      m.bitrateKbps === 128L && m.channelMode === "mono")
    assert(m.durationUs === 4L * 1152L * 1000000L / 48000L) // 96000
    assert(m.id3Bytes === 0L && m.byteLen === bytes.length.toLong)
  }

  test("synthetic corpus round-trips: every parameter parses back " +
      "to its closed form") {
    (0L until 64L).foreach { id =>
      val bytes = Mp3.syntheticMp3Bytes(id)
      val m = Mp3.decodeMp3Meta(bytes).getOrElse(
        fail(s"id $id did not parse"))
      assert(m.nFrames === 3 + id % 6, s"id $id frames")
      assert(m.sampleRate === Mp3.SampleRates((id % 3).toInt).toLong)
      assert(m.bitrateKbps ===
        Mp3.BitratesKbps(1 + (id % 14).toInt).toLong)
      assert(m.channelMode === Mp3.ChannelModes((id % 4).toInt))
      assert(m.id3Bytes === (if (id % 4 == 0) 27 + id % 23 else 0L))
      assert(m.byteLen === bytes.length.toLong)
      assert(m.durationUs === m.nFrames * 1152L * 1000000L / m.sampleRate)
    }
  }

  test("malformed streams return None, never garbage") {
    val good = Mp3.syntheticMp3Bytes(5L)
    assert(Mp3.decodeMp3Meta(null) === None)
    assert(Mp3.decodeMp3Meta(Array[Byte](1, 2, 3)) === None)
    // truncated final frame
    assert(Mp3.decodeMp3Meta(good.dropRight(1)) === None)
    // trailing garbage after the last frame
    assert(Mp3.decodeMp3Meta(good :+ 0x00.toByte) === None)
    // broken sync on the first frame
    val badSync = good.clone(); badSync(0) = 0x7F.toByte
    assert(Mp3.decodeMp3Meta(badSync) === None)
    // free-format (bitrate index 0) and reserved (15) headers
    val free = Mp3.encodeFrame(1, 0, 0, 0, _ => 0)
    free(2) = (free(2) & 0x0F).toByte // bitrate idx -> 0
    assert(Mp3.decodeMp3Meta(free) === None)
    val res = Mp3.encodeFrame(1, 0, 0, 0, _ => 0)
    res(2) = (res(2) | 0xF0).toByte // bitrate idx -> 15
    assert(Mp3.decodeMp3Meta(res) === None)
    // reserved sample-rate index (3)
    val badSr = Mp3.encodeFrame(9, 0, 0, 0, _ => 0)
    badSr(2) = (badSr(2) | 0x0C).toByte
    assert(Mp3.decodeMp3Meta(badSr) === None)
    // MPEG-2 version bits / non-Layer-III are out of remit
    val v2 = Mp3.encodeFrame(9, 0, 0, 0, _ => 0)
    v2(1) = 0xF3.toByte // version 10 (MPEG-2), layer III
    assert(Mp3.decodeMp3Meta(v2) === None)
    val layer1 = Mp3.encodeFrame(9, 0, 0, 0, _ => 0)
    layer1(1) = 0xFF.toByte // layer 11 (Layer I)
    assert(Mp3.decodeMp3Meta(layer1) === None)
    // mid-stream bitrate change breaks the CBR contract
    val vbr = Mp3.encodeFrame(9, 1, 0, 0, _ => 0) ++
      Mp3.encodeFrame(10, 1, 0, 0, _ => 0)
    assert(Mp3.decodeMp3Meta(vbr) === None)
    // ID3 with a size running past EOF, or a non-syncsafe size byte
    val id3Long = Mp3.encodeId3v2(1000, _ => 0).take(50)
    assert(Mp3.decodeMp3Meta(id3Long) === None)
    val id3Bad = Mp3.encodeId3v2(5, _ => 0) ++
      Mp3.encodeFrame(9, 1, 0, 0, _ => 0)
    id3Bad(9) = 0x85.toByte // bit 7 set in a syncsafe byte
    assert(Mp3.decodeMp3Meta(id3Bad) === None)
    // an ID3 tag alone (no frames) is not an MP3
    assert(Mp3.decodeMp3Meta(Mp3.encodeId3v2(5, _ => 0)) === None)
  }

  test("extractMp3Meta fails loudly on a corrupt row (no silent drop)") {
    val rows = Seq(Mp3.Mp3Row(1L, Mp3.syntheticMp3Bytes(1L)),
      Mp3.Mp3Row(2L, Array[Byte](0, 1, 2, 3)))
    val e = intercept[org.apache.spark.SparkException] {
      Mp3.extractMp3Meta(spark.createDataset(rows)).collect()
    }
    assert(e.getMessage != null)
  }
}
