package graft

import graft.operators.MediaDecoder

/** [[MediaDecoder]]: the PNG path must decode REAL pixels (true raster
  * dims + luminance histogram over decoded RGB), and non-PNG payloads must
  * keep the deterministic byte-histogram stub semantics the q71 oracle
  * replays. The PNG fixture is synthesized in-test (the container ships no
  * media files) via the same ImageIO writer a staging job would use. */
class MediaDecodeSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "no PNG writer")
    out.toByteArray
  }

  test("PNG payloads decode real raster dimensions and luminance histogram") {
    // Horizontal gray gradient: pixel (x, y) = gray level x * 16 → luma
    // x * 16 exactly (equal RGB channels), so bin = x >> 1 and each of the
    // 8 bins receives exactly 2 columns × 9 rows = 18 of the 144 pixels.
    val bytes = pngBytes(16, 9) { (x, _) =>
      val g = x * 16; (g << 16) | (g << 8) | g
    }
    val d = new MediaDecoder().decode(bytes)
    assert(d.width == 16 && d.height == 9,
      s"expected real raster 16x9, got ${d.width}x${d.height}")
    assert(d.features.toSeq == Seq.fill(8)(18.0f / 144.0f),
      s"expected uniform 8-bin luminance histogram, got ${d.features.toSeq}")
  }

  test("PNG decode is per-pixel, not byte-level: a solid image fills one bin") {
    val bytes = pngBytes(7, 5)((_, _) => 0xffffff) // white → luma 255 → bin 7
    val d = new MediaDecoder().decode(bytes)
    assert(d.width == 7 && d.height == 5)
    assert(d.features.toSeq == Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1.0f),
      s"got ${d.features.toSeq}")
  }

  test("PNG thumbnail resamples real pixels (nearest-neighbor luminance)") {
    // 16x9 gray gradient (level = x*16) → 4x3 thumb: pixel (x, y) samples
    // src (x*16/4, y*9/3) = (4x, 3y), luma = 4x*16 = 64x, every row.
    val bytes = pngBytes(16, 9) { (x, _) =>
      val g = x * 16; (g << 16) | (g << 8) | g
    }
    val thumb = new MediaDecoder().thumbnail(bytes, 4, 3)
    val expected = Array.fill(3)(Seq(0, 64, 128, 192)).flatten.map(_.toByte)
    assert(thumb.toSeq == expected.toSeq, s"got ${thumb.toSeq}")
  }

  test("non-PNG thumbnail falls back to the byte-level resize stub") {
    val payload = "hello graft".getBytes("UTF-8")
    val d = new MediaDecoder()
    assert(d.thumbnail(payload, 4, 3).toSeq == d.resize(payload, 12).toSeq)
  }

  test("non-PNG payloads keep the deterministic byte-histogram stub semantics") {
    val payload = "hello graft".getBytes("UTF-8")
    val d = new MediaDecoder().decode(payload)
    // Independent replay of the stub formula (the q71 oracle's arithmetic).
    val codes = payload.map(_ & 0xff)
    val sum = codes.map(_.toLong).sum
    assert(d.width == (sum % 640).toInt + 1 && d.height == (sum % 480).toInt + 1)
    val expected = (0 until 8).map(b =>
      codes.count(c => (c >> 5) == b).toFloat / payload.length)
    assert(d.features.toSeq == expected)
  }

  test("a sniffed-PNG prefix with corrupt body falls back to the stub, not a crash") {
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val corrupt = magic ++ "not really a png".getBytes("UTF-8")
    val d = new MediaDecoder().decode(corrupt)
    val sum = corrupt.map(b => (b & 0xff).toLong).sum
    assert(d.width == (sum % 640).toInt + 1, "fallback should use the stub formula")
  }
}
