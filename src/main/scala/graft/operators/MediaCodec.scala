package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for two PUBLIC container formats — RIFF/WAVE with
  * 16-bit PCM samples and Windows BMP (24-bit uncompressed,
  * BITMAPINFOHEADER) — so the multimodal pipeline decodes REAL bytes
  * end to end instead of the historical `fakeDecode` stub. Both
  * formats are fully specified public layouts (the RIFF chunk
  * grammar and the BITMAPFILEHEADER/BITMAPINFOHEADER structs from
  * Microsoft's public documentation); the decoders here parse
  * headers strictly and throw IllegalArgumentException with the
  * offending field on malformed input, which the pipeline surfaces
  * as a per-row decode failure.
  *
  * Scale note: these run INSIDE `mapPartitions` batches
  * ([[Multimodal.extractFeatures]]) — per-row CPU, zero shuffle,
  * no driver involvement; the codec allocates only the decoded
  * sample/pixel arrays (media payloads are row-local by contract,
  * the bytes column never shuffles).
  */
object MediaCodec {

  /** Decoded WAV payload: PCM samples in file order (frames
    * interleave channels, `samples.length == frames·numChannels`).
    */
  final case class WavData(sampleRate: Int, numChannels: Int,
      samples: Array[Short])

  /** Decoded BMP payload: pixels ROW-MAJOR TOP-DOWN, packed
    * 0xRRGGBB — the raster order every downstream feature step
    * expects, regardless of the file's bottom-up storage.
    */
  final case class BmpData(width: Int, height: Int, pixels: Array[Int])

  private def le(cap: Int): ByteBuffer =
    ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)

  /** Canonical 44-byte-header RIFF/WAVE encoding of 16-bit PCM:
    * RIFF(size)/WAVE + "fmt "(16, PCM, channels, rate, byteRate,
    * blockAlign, 16bps) + "data"(2·n). Mono by default.
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
      numChannels: Int = 1): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate=$sampleRate must be positive")
    require(numChannels > 0, s"numChannels=$numChannels must be positive")
    require(samples.length % numChannels == 0,
      s"${samples.length} samples not a whole number of $numChannels-channel frames")
    val dataLen = samples.length * 2
    val buf = le(44 + dataLen)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(numChannels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * numChannels * 2) // byte rate
      .putShort((numChannels * 2).toShort)  // block align
      .putShort(16.toShort)                 // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Strict RIFF walk: verifies the RIFF/WAVE container, then scans
    * chunks (4-byte id, 4-byte LE size, payload, ODD SIZES PAD TO
    * EVEN per the RIFF grammar) until both "fmt " and "data" are
    * seen — chunk order is NOT assumed and unknown chunks (LIST,
    * fact, …) are skipped, so files from other writers decode too.
    * Only format 1 (integer PCM) at 16 bits is accepted.
    */
  def decodeWavPcm16(bytes: Array[Byte]): WavData = {
    require(bytes.length >= 12, s"${bytes.length} bytes: too short for RIFF")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "missing RIFF magic")
    buf.getInt // declared riff size; trust actual length instead
    val wave = new Array[Byte](4); buf.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "missing WAVE form type")
    var fmt: Option[(Int, Int)] = None // (channels, rate)
    var data: Option[Array[Short]] = None
    while ((fmt.isEmpty || data.isEmpty) && buf.remaining >= 8) {
      val idb = new Array[Byte](4); buf.get(idb)
      val id = new String(idb, "US-ASCII")
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining,
        s"chunk '$id' declares $size bytes, ${buf.remaining} remain")
      val next = buf.position() + size + (size & 1) // RIFF even padding
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk of $size bytes, need >= 16")
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"audio format $audioFormat, need PCM(1)")
          val channels = buf.getShort.toInt
          require(channels > 0, s"channel count $channels")
          val rate = buf.getInt
          require(rate > 0, s"sample rate $rate")
          buf.getInt   // byte rate (derived)
          buf.getShort // block align (derived)
          val bits = buf.getShort
          require(bits == 16, s"$bits bits per sample, need 16")
          fmt = Some((channels, rate))
        case "data" =>
          require(size % 2 == 0, s"data chunk of $size bytes not 16-bit aligned")
          val out = new Array[Short](size / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          data = Some(out)
        case _ => // skip unknown chunk
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(fmt.isDefined, "no fmt chunk")
    require(data.isDefined, "no data chunk")
    val (channels, rate) = fmt.get
    require(data.get.length % channels == 0,
      s"${data.get.length} samples not a whole number of $channels-channel frames")
    WavData(rate, channels, data.get)
  }

  /** 24-bit uncompressed BMP: 14-byte BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER, pixel rows stored BOTTOM-UP in BGR order,
    * each row padded to a 4-byte boundary. `pixels` is row-major
    * top-down 0xRRGGBB.
    */
  def encodeBmp24(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate ${width}x$height bitmap")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val rowBytes = (width * 3 + 3) & ~3
    val imageSize = rowBytes * height
    val buf = le(54 + imageSize)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + imageSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort)   // planes
      .putShort(24.toShort)  // bpp
      .putInt(0)             // BI_RGB (uncompressed)
      .putInt(imageSize).putInt(0).putInt(0).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up storage
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        buf.put((p & 0xff).toByte)         // B
          .put(((p >> 8) & 0xff).toByte)   // G
          .put(((p >> 16) & 0xff).toByte)  // R
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Strict BMP parse: BM magic, BITMAPINFOHEADER (biSize >= 40 —
    * the V4/V5 header extensions are skipped via biSize), 24 bpp,
    * BI_RGB only; honors the file's pixel-array offset, row padding,
    * and BOTH row orders (positive height = bottom-up, negative =
    * top-down), normalizing to top-down 0xRRGGBB.
    */
  def decodeBmp24(bytes: Array[Byte]): BmpData = {
    require(bytes.length >= 54, s"${bytes.length} bytes: too short for BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "missing BM magic")
    buf.getInt // declared file size; trust actual length instead
    buf.getInt // reserved
    val pixelOffset = buf.getInt
    val headerSize = buf.getInt
    require(headerSize >= 40, s"info header of $headerSize bytes, need >= 40")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"degenerate ${width}x$rawHeight bitmap")
    val planes = buf.getShort
    require(planes == 1, s"$planes planes, need 1")
    val bpp = buf.getShort
    require(bpp == 24, s"$bpp bits per pixel, need 24")
    val compression = buf.getInt
    require(compression == 0, s"compression $compression, need BI_RGB(0)")
    val rowBytes = (width * 3 + 3) & ~3
    require(pixelOffset >= 14 + headerSize &&
      pixelOffset.toLong + rowBytes.toLong * height <= bytes.length,
      s"pixel array [$pixelOffset, +${rowBytes.toLong * height}) outside " +
        s"${bytes.length}-byte file")
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val y = if (topDown) row else height - 1 - row // normalize top-down
      var off = pixelOffset + row * rowBytes
      var x = 0
      while (x < width) {
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        off += 3
        x += 1
      }
      row += 1
    }
    BmpData(width, height, pixels)
  }
}
