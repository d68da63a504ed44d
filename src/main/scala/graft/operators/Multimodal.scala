package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch kernels.
  *
  * The reference is text-only; this is the training-data-pipeline extension
  * for 100 TB multimodal corpora. Two tiers of realness here:
  *
  *  - REAL decode ([[decodeMeta]]): uncompressed formats parseable in pure
  *    JVM code — BMP (BITMAPINFOHEADER, 24bpp, bottom-up rows with 4-byte
  *    stride padding), binary PPM (P6 ASCII header incl. `#` comments), and
  *    WAV (RIFF chunk walk, PCM 16-bit). width/height/duration_ms plus a
  *    content checksum over the actual pixel/sample payload are computed
  *    columns, oracle-checked end-to-end by `q_multimodal_meta`
  *    (PipelineQueries): the blobs are built by [[mediaForDoc]] as a pure
  *    function of doc_id, so DuckDB recomputes every parsed value
  *    closed-form and a writer OR parser bug breaks the hash.
  *  - REAL compressed decode ([[decodeImageIo]]): PNG, baseline JPEG and
  *    (r7) animated GIF through the JDK's own ImageIO codecs
  *    (java.desktop, headless) — real dims and decoded-pixel checksums,
  *    oracle-checked by `q_multimodal_codec` / `q_gif_frames` (PNG and
  *    the ≤256-gray GIF losslessly exact, JPEG dims exact + sum within a
  *    measured bound), real decoded-pixel features in [[extractFeatures]]
  *    and perceptual hashes in [[dHash64]]/[[audioFingerprint]].
  *  - DETERMINISTIC FAKE ([[fakeDecode]]): audio/video codecs (MP3/H.264)
  *    don't ship in the JDK or this container, so their feature extraction
  *    derives pseudo-features from the byte content, clearly marked below.
  *    Swap `fakeDecode` for a real codec (javacv / a Pandas UDF in
  *    PySpark) and everything downstream keeps its shape.
  *
  * Scale notes: media rows are large — partition by size
  * (`maxPartitionBytes`), never collect, and keep features (small) in a
  * separate narrow table keyed by media_id so analytic scans skip the bytes
  * entirely (Parquet column pruning does this for free once features are
  * written to their own files).
  */
object Multimodal {

  /** Parsed media header + payload checksum. Numeric fields use -1 (never
    * NULL) for not-applicable slots per the catalog determinism contract. */
  final case class MediaMeta(kind: String, width: Long, height: Long,
      duration_ms: Long, content_sum: Long, size_bytes: Long)

  // ---- little-endian byte helpers (shared by encoder and parser) --------
  private def wrLE(b: Array[Byte], off: Int, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }
  private def rdLE(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  // ======================================================================
  // Encoders: real on-disk formats, payload bytes a pure function of a
  // seed so the oracle can recompute the checksum without reading bytes.
  // pixel byte i = (seed*3 + i) % 251; sample i = (seed*7 + i) % 4001 - 2000
  // ======================================================================

  /** 24bpp uncompressed BMP, bottom-up rows padded to 4-byte stride. */
  def encodeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"bad bmp dims ${w}x$h")
    val rowBytes = ((3 * w + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size) // zero-filled => padding bytes are 0
    b(0) = 'B'; b(1) = 'M'
    wrLE(b, 2, size, 4); wrLE(b, 10, 54, 4) // file size, pixel data offset
    wrLE(b, 14, 40, 4) // BITMAPINFOHEADER
    wrLE(b, 18, w, 4); wrLE(b, 22, h, 4) // positive height = bottom-up
    wrLE(b, 26, 1, 2); wrLE(b, 28, 24, 2) // planes, bpp
    wrLE(b, 30, 0, 4); wrLE(b, 34, rowBytes * h, 4) // BI_RGB, image size
    var idx = 0L; var y = 0
    while (y < h) {
      var x = 0
      while (x < 3 * w) {
        b(54 + y * rowBytes + x) = ((seed * 3 + idx) % 251).toByte
        idx += 1; x += 1
      }
      y += 1
    }
    b
  }

  /** Binary PPM (P6): ASCII header, then w*h*3 unpadded RGB bytes. */
  def encodePpm(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"bad ppm dims ${w}x$h")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, b, 0, header.length)
    var i = 0
    while (i < 3 * w * h) {
      b(header.length + i) = ((seed * 3 + i) % 251).toByte
      i += 1
    }
    b
  }

  /** WAV: 44-byte canonical RIFF/fmt/data layout, PCM mono 16-bit. */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0, s"bad wav shape $nSamples@$sampleRate")
    val dataBytes = 2 * nSamples
    val b = new Array[Byte](44 + dataBytes)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    wrLE(b, 4, 36 + dataBytes, 4)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    wrLE(b, 16, 16, 4); wrLE(b, 20, 1, 2); wrLE(b, 22, 1, 2) // PCM, mono
    wrLE(b, 24, sampleRate, 4); wrLE(b, 28, sampleRate * 2L, 4) // byte rate
    wrLE(b, 32, 2, 2); wrLE(b, 34, 16, 2) // block align, bits
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    wrLE(b, 40, dataBytes, 4)
    var i = 0
    while (i < nSamples) {
      wrLE(b, 44 + 2 * i, ((seed * 7 + i) % 4001 - 2000) & 0xffffL, 2)
      i += 1
    }
    b
  }

  // ======================================================================
  // REAL compressed codecs via the JDK's own ImageIO (java.desktop ships
  // baseline JPEG and PNG codecs, headless-safe — verified in this
  // container): decode below is genuinely the codec, not a stub. PNG is
  // lossless, so its decoded checksum is oracle-predictable closed-form;
  // JPEG is lossy, so the oracle pins dims exactly and the checksum to a
  // measured bound (worst 0.7% on the q_multimodal_codec dims; bound 5%).
  // MP3/H.264 stay out — the JDK carries no audio/video codec — and
  // [[fakeDecode]] still stands in for those, clearly marked.
  // ======================================================================

  private lazy val imageIoInit: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
  }

  /** Deterministic RGB source image: byte i of the row-major RGB raster is
    * (seed*3 + i) % 251 — the SAME pixel formula as [[encodeBmp]]/
    * [[encodePpm]], so oracles recompute the lossless sum closed-form. */
  private def srcImage(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    imageIoInit
    require(w > 0 && h > 0, s"bad image dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var idx = 0L; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 3 + idx) % 251).toInt
        val g = ((seed * 3 + idx + 1) % 251).toInt
        val b = ((seed * 3 + idx + 2) % 251).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        idx += 3; x += 1
      }
      y += 1
    }
    img
  }

  private def writeImage(img: java.awt.image.BufferedImage,
                         fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO $fmt writer")
    bos.toByteArray
  }

  /** Real PNG bytes (lossless — decode reproduces the source raster). */
  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] =
    writeImage(srcImage(w, h, seed), "png")

  /** Real baseline-JPEG bytes (lossy — dims survive exactly, pixels
    * approximately). */
  def encodeJpeg(w: Int, h: Int, seed: Long): Array[Byte] =
    writeImage(srcImage(w, h, seed), "jpg")

  /** Decode-allocation guard for every ImageIO path: 16 megapixels.
    * A corrupt-but-plausible header can DECLARE absurd dimensions and
    * make the decoder allocate a multi-GB raster before any pixel data
    * is validated — an OutOfMemoryError, which is FATAL and escapes the
    * streaming tier's null-on-error wrappers (they catch NonFatal only),
    * so without this bound a crafted header still kills the query the
    * SAFE UDFs promise to protect. 16 MP covers every sane frame (4K is
    * 8.3 MP) at a ≤ 64 MB raster; genuinely larger media should be
    * tiled upstream, not decoded whole on an executor. */
  private val MaxDecodePixels = 16L * 1024 * 1024

  /** [[javax.imageio.ImageIO.read]] with the declared dimensions checked
    * BEFORE the raster is allocated (reader.getWidth/getHeight are
    * header reads): oversized or undecodable input throws an ordinary
    * (NonFatal, catchable) exception instead of OOMing the executor. */
  private def boundedImageIoRead(b: Array[Byte],
                                 what: String): java.awt.image.BufferedImage = {
    imageIoInit
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    // createImageInputStream can return NULL (no suitable SPI, cache-dir
    // failure) — getImageReaders(null) would throw IllegalArgumentException
    // and the finally block would NPE on close; both still NonFatal, but a
    // clean "could not decode" beats a confusing NPE in the quarantine log
    require(iis != null, s"$what: ImageIO could not open the blob")
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"$what: ImageIO could not decode the blob")
      val rd = readers.next()
      try {
        rd.setInput(iis, false)
        val (w, h) = (rd.getWidth(0), rd.getHeight(0))
        require(w > 0 && h > 0 && w.toLong * h <= MaxDecodePixels,
          s"$what: declared raster ${w}x$h exceeds the " +
            s"$MaxDecodePixels-pixel decode guard")
        rd.read(0)
      } finally rd.dispose()
    } finally iis.close()
  }

  /** ImageIO decode path shared by PNG/JPEG: real dims + checksum over the
    * DECODED RGB raster. Malformed input throws (same policy as the
    * pure-JVM parsers). */
  private def decodeImageIo(b: Array[Byte], kind: String): MediaMeta = {
    val img = boundedImageIoRead(b, kind)
    var sum = 0L; var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    MediaMeta(kind, img.getWidth.toLong, img.getHeight.toLong, -1L, sum, b.length)
  }

  /** Nearest-neighbor resize for ImageIO formats (the compressed twin of
    * [[resizeBmp]]): decode, resample with the SAME index arithmetic
    * (dst (r,x) ← src (r*srcH/dstH, x*srcW/dstW)), re-encode in the
    * input's own format. Deterministic: NN picks pixels, never blends. */
  def resizeImage(b: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    imageIoInit
    require(dstW > 0 && dstH > 0, s"bad resize dims ${dstW}x$dstH")
    val fmt =
      if (b.length >= 4 && b(0) == 0x89.toByte && b(1) == 'P') "png"
      else if (b.length >= 3 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) "jpg"
      else sys.error("resizeImage handles PNG/JPEG blobs only")
    val img = boundedImageIoRead(b, fmt)
    val out = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var r = 0
    while (r < dstH) {
      val sr = r * img.getHeight / dstH
      var x = 0
      while (x < dstW) {
        out.setRGB(x, r, img.getRGB(x * img.getWidth / dstW, sr))
        x += 1
      }
      r += 1
    }
    writeImage(out, fmt)
  }

  /** Position-weighted sum over the DECODED RGB raster (row-major, R G B
    * per pixel): Σ byte_j * (j+1) — the layout-pinning checksum
    * [[weightedPixelSum]] computes for BMP payloads, here for codec
    * formats. No modulus: raster sizes here keep the sum ≪ 2^63. */
  def rasterWeightedSum(b: Array[Byte]): Long = {
    val img = boundedImageIoRead(b, "rasterWeightedSum")
    var sum = 0L; var j = 1L; var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) * j + ((p >> 8) & 0xff) * (j + 1) +
          (p & 0xff) * (j + 2)
        j += 3; x += 1
      }
      y += 1
    }
    sum
  }

  /** Real ANIMATED GIF via the JDK's own ImageIO GIF codec
    * (writeToSequence) — the compressed-container analog of [[encodeY4m]]:
    * `nFrames` full TYPE_BYTE_GRAY frames whose pixel i (row-major,
    * frames concatenated) is (seed*5 + i) % 241, the Y4M payload formula.
    * 241 < 256 distinct gray values fit the GIF palette, so the LZW
    * encoding is LOSSLESS here and the oracle replays every frame sum
    * closed-form — real compression, exact arithmetic. */
  def encodeGif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    imageIoInit
    require(w > 0 && h > 0, s"bad gif dims ${w}x$h")
    require(nFrames > 0, s"bad frame count $nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no ImageIO gif writer")
    val wr = writers.next()
    // explicit 256-entry gray palette: a bare TYPE_BYTE_GRAY image makes
    // the JDK writer derive (and quantize through) its own color table —
    // measured value drift on small rasters. With the identity gray ICM
    // the palette IS the byte value.
    val g = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, g, g, g)
    try {
      wr.setOutput(ios)
      // interlace OFF: the JDK writer's interlaced (progressive) output
      // row-shuffles frames whose height is not a multiple of the pass
      // structure (probed: 4x3 frames came back with a zeroed middle row);
      // non-interlaced output round-trips bit-exact at every dim
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      wr.prepareWriteSequence(null)
      var idx = 0L; var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            r.setSample(x, y, 0, ((seed * 5 + idx) % 241).toInt)
            idx += 1; x += 1
          }
          y += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
        f += 1
      }
      wr.endWriteSequence()
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** [[encodeGif]]'s twin with HASH-MIXED pixels on a caller-chosen
    * per-frame index stride: frame f's pixel (x, y) carries
    * ((seed + f·frameStride + y·w + x)·2654435761 mod 1e9+7) mod 241.
    * With frameStride = the Y4M frame size (3wh/2), frame f's raster is
    * value-identical to [[encodeY4mMix]]'s LUMA plane for the same seed
    * — the cross-CONTAINER video-dedup fixture: the same clip as raw
    * Y4M and as real LZW-compressed GIF, byte-unrelated blobs whose
    * decoded frames agree. */
  def encodeGifMix(w: Int, h: Int, nFrames: Int, seed: Long,
                   frameStride: Int): Array[Byte] = {
    imageIoInit
    require(w > 0 && h > 0, s"bad gif dims ${w}x$h")
    require(nFrames > 0 && frameStride > 0,
      s"bad frame count $nFrames / stride $frameStride")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no ImageIO gif writer")
    val wr = writers.next()
    val g = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, g, g, g)
    try {
      wr.setOutput(ios)
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      wr.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = seed + f.toLong * frameStride + y.toLong * w + x
            r.setSample(x, y, 0,
              ((i * 2654435761L % 1000000007L) % 241L).toInt)
            x += 1
          }
          y += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
        f += 1
      }
      wr.endWriteSequence()
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** One sampled GIF frame's stats: dims + exact gray sum over the
    * genuinely LZW-decoded raster ([[FrameStat]]'s shape; GIF frames here
    * are gray, so there is no chroma plane). */
  final case class GifFrameStat(frame_idx: Long, width: Long, height: Long,
      gray_sum: Long)

  /** Frame walk + sampling over real GIF bytes via the ImageIO reader:
    * every `stride`-th frame decoded (reader.read is per-index — an
    * unsampled frame's raster is never materialized, the frame-sampling
    * contract at 100 TB), per-frame dims + exact gray sum. Each stored
    * frame is written full by [[encodeGif]], so read(i) needs no
    * disposal-method compositing. Malformed input throws, same policy as
    * the other walkers. */
  def gifFrameStats(b: Array[Byte], stride: Int): Array[GifFrameStat] = {
    imageIoInit
    require(stride > 0, s"bad stride $stride")
    require(b != null && b.length >= 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F', "not a GIF")
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "no ImageIO gif reader")
    val rd = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      rd.setInput(iis, false)
      val n = rd.getNumImages(true)
      require(n > 0, "gif: no frames")
      val out = scala.collection.mutable.ArrayBuffer.empty[GifFrameStat]
      var f = 0
      while (f < n) {
        if (f % stride == 0) {
          // dims are header reads — guard BEFORE the raster allocation
          // (see boundedImageIoRead: a corrupt header OOM is fatal and
          // escapes the streaming tier's NonFatal wrappers)
          val (gw, gh) = (rd.getWidth(f), rd.getHeight(f))
          require(gw > 0 && gh > 0 && gw.toLong * gh <= MaxDecodePixels,
            s"gif frame $f: declared ${gw}x$gh exceeds the decode guard")
          val img = rd.read(f)
          var s = 0L; var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { s += (img.getRGB(x, y) & 0xff); x += 1 }
            y += 1
          }
          out += GifFrameStat(f.toLong, img.getWidth.toLong,
            img.getHeight.toLong, s)
        }
        f += 1
      }
      out.toArray
    } finally { rd.dispose(); iis.close() }
  }

  /** 64-bit DIFFERENCE HASH (dHash) over the genuinely DECODED raster —
    * the perceptual image-dedup primitive (the multimodal sibling of the
    * text MinHash): re-encodes, format conversions and integer-factor
    * resizes of the same picture collapse to one hash while byte-level
    * hashes see unrelated blobs.
    *
    * Definition (all integer arithmetic, so the oracle replays it
    * closed-form from the pixel formula): sample a 9-column × 8-row grid
    * over the storage raster — sx = c·W/9, sr = r·H/8, integer division,
    * the exact nearest-neighbor mapping [[resizeBmp]] uses — with
    * gray(c, r) = the pixel's CHANNEL SUM (permutation-invariant, so
    * BGR-ordered BMPs and RGB PNGs of the same picture agree);
    * bit(r, c) = gray(c+1, r) > gray(c, r), packed at position r·8+c.
    *
    * Resize invariance is arithmetic, not approximate: for a k×
    * nearest-neighbor upscale, floor(floor(a·k)/k) = floor(a), so the
    * upscaled image's sample grid reads exactly the original's samples
    * (spec-pinned for 2× and 3×). Dispatch on magic bytes: BMP and PPM
    * parse directly (same strict-layout contract as the other walkers);
    * PNG/GIF/JPEG decode through the real ImageIO codecs. */
  def dHash64(b: Array[Byte]): Long = {
    val (w, h, gray) = grayRaster(b)
    var hash = 0L
    var r = 0
    while (r < 8) {
      val sr = r * h / 8
      var prev = gray(0, sr) // c = 0 column
      var c = 0
      while (c < 8) {
        val cur = gray((c + 1) * w / 9, sr)
        if (cur > prev) hash |= 1L << (r * 8 + c)
        prev = cur
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Channel-sum gray histogram over pixel-index buckets: bucket j =
    * Σ gray(p) over pixel indices p ≡ j (mod `dim`), exact BIGINTs — the
    * deterministic integer IMAGE ENCODER behind q_crossmodal_match (the
    * real encoder is an external model, DEVIATIONS #1; this stand-in
    * keeps the retrieval machinery exactly oracle-replayable). Decodes
    * through the same dispatch as [[dHash64]]. */
  def imageGrayBuckets(b: Array[Byte], dim: Int): Array[Long] = {
    require(dim > 0, s"bad dim $dim")
    val (w, h, gray) = grayRaster(b)
    val out = new Array[Long](dim)
    var p = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(p % dim) += gray(x, y); p += 1; x += 1 }
      y += 1
    }
    out
  }

  /** Shared decode dispatch: (width, height, gray(x, y) = channel sum at
    * storage position). BMP and PPM parse directly (strict-layout
    * contract, as the other walkers); PNG/GIF/JPEG decode through the
    * real ImageIO codecs. Malformed input throws. */
  private def grayRaster(b: Array[Byte]): (Int, Int, (Int, Int) => Int) = {
    require(b != null && b.length >= 2, "grayRaster: empty blob")
      if (b(0) == 'B' && b(1) == 'M') {
        val (bw, bh, stride, _) =
          bmp24Header(b, "grayRaster", fixedDataOff = true)
        (bw, bh, (x, y) => {
          val p = 54 + y * stride + 3 * x
          (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
        })
      } else if (b(0) == 'P' && b(1) == '6') {
        val (pw, ph, off) = ppmHeader(b, "grayRaster")
        (pw, ph, (x, y) => {
          val q = off + 3 * (y * pw + x)
          (b(q) & 0xff) + (b(q + 1) & 0xff) + (b(q + 2) & 0xff)
        })
      } else if (isImageIoMagic(b)) {
        val img = boundedImageIoRead(b, "grayRaster")
        (img.getWidth, img.getHeight, (x, y) => {
          val rgb = img.getRGB(x, y)
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        })
      } else throw new IllegalArgumentException(
        "grayRaster: unrecognized image magic")
  }

  /** [[encodeWav]]'s twin with HASH-MIXED samples:
    * s_i = ((seed+i)·2654435761 mod 1e9+7) mod 4001 − 2000. The linear
    * (seed·7 + i) stream is periodic mod 4001, so any seed merely
    * phase-shifts the same waveform and per-frame energy envelopes of
    * different seeds correlate heavily — fine for DSP-arithmetic checks
    * (q_audio_features), fatal for a DEDUP fixture, where 240 "different"
    * recordings collapsed to 28 fingerprints. The multiplicative mix
    * decorrelates seeds (238/240 distinct fingerprints, measured) while
    * staying exactly replayable in BIGINT arithmetic. */
  def encodeWavMix(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val b = encodeWav(nSamples, sampleRate, 0L)
    var i = 0
    while (i < nSamples) {
      val v = ((seed + i) * 2654435761L % 1000000007L) % 4001L - 2000L
      wrLE(b, 44 + 2 * i, v & 0xffffL, 2)
      i += 1
    }
    b
  }

  /** Gain transform over real WAV bytes: parse the RIFF/PCM payload
    * ([[wavPcm]] — LIST/INFO chunks and all), multiply every sample by
    * `num`, re-encode in the canonical 44-byte layout. The simplest real
    * audio DSP transform; callers must keep |sample·num| ≤ 32767 — loud
    * failure beats silent clipping, which would corrupt every later
    * energy statistic invisibly. */
  def wavGain(b: Array[Byte], num: Int): Array[Byte] = {
    val (s, rate) = wavPcm(b)
    val out = new Array[Byte](44 + 2 * s.length)
    System.arraycopy(encodeWav(1, rate.toInt, 0L), 0, out, 0, 44)
    wrLE(out, 4, 36 + 2 * s.length, 4)
    wrLE(out, 40, 2 * s.length, 4)
    var i = 0
    while (i < s.length) {
      val v = s(i) * num
      require(v >= -32768 && v <= 32767,
        s"wavGain: sample $i overflows 16-bit at gain $num")
      wrLE(out, 44 + 2 * i, v & 0xffffL, 2)
      i += 1
    }
    out
  }

  /** 33-bit audio difference fingerprint — [[dHash64]]'s sibling for the
    * audio tier: exact integer energies of the first 34 non-overlapping
    * `frameLen`-sample frames, bit f = energy(f+1) > energy(f), packed at
    * positions 0..32 (33 bits, sign bit never used — replays in any
    * engine; chunking callers must size bits ≥ 33, q_audio_neardup uses
    * bits=36 = 3×12).
    * GAIN-invariant by arithmetic (energy scales by gain² uniformly, so
    * every comparison is preserved — no clipping by [[wavGain]]'s
    * contract) and TAIL-invariant (a longer take with the same prefix
    * fingerprints identically), which is exactly what collapses the same
    * recording at different master volumes or cut lengths. Fails loudly
    * when the clip is shorter than 34 frames. */
  def audioFingerprint(b: Array[Byte], frameLen: Int): Long = {
    require(frameLen > 0, s"bad frame length $frameLen")
    val (s, _) = wavPcm(b)
    require(s.length >= 34 * frameLen,
      s"audioFingerprint needs >= ${34 * frameLen} samples, got ${s.length}")
    val energies = new Array[Long](34)
    var f = 0
    while (f < 34) {
      var e = 0L; var i = f * frameLen
      val end = i + frameLen
      while (i < end) { e += s(i).toLong * s(i); i += 1 }
      energies(f) = e
      f += 1
    }
    var fp = 0L; var k = 0
    while (k < 33) {
      if (energies(k + 1) > energies(k)) fp |= 1L << k
      k += 1
    }
    fp
  }

  /** q_audio_dedup's fixture writer: ONE recording per base id as three
    * byte-different takes — the base WAV (+0), the same take at 2× master
    * gain through the real [[wavGain]] parse-transform-encode path
    * (+20000), and a longer cut with the same prefix (+40000). All three
    * carry the same [[audioFingerprint]]. */
  def audioVariantForDoc(clipId: Long): Array[Byte] = {
    require(clipId >= 0, s"negative clip id $clipId")
    val base = clipId % 20000
    val n = (34 * 256 + 128 * (base % 3)).toInt
    (clipId / 20000) match {
      case 0 => encodeWavMix(n, 8000, base)
      case 1 => wavGain(encodeWavMix(n, 8000, base), 2)
      case 2 => encodeWavMix(n + 1024, 8000, base)
      case v => throw new IllegalArgumentException(s"bad audio variant $v")
    }
  }

  /** [[encodePpm]] / [[encodePng]] twins over the HASH-MIXED raster (the
    * [[encodeBmpMix]] formula) — needed so the image-dedup fixture's
    * format variants carry the same decorrelated picture as its BMP
    * base. The PNG goes through the REAL deflate writer via a mixed
    * source image. */
  def encodePpmMix(w: Int, h: Int, seed: Long): Array[Byte] = {
    val b = encodePpm(w, h, 0L)
    val off = b.length - 3 * w * h
    var i = 0
    while (i < 3 * w * h) {
      b(off + i) = (((seed + i) * 2654435761L % 1000000007L) % 251L).toByte
      i += 1
    }
    b
  }

  def encodePngMix(w: Int, h: Int, seed: Long): Array[Byte] = {
    imageIoInit
    require(w > 0 && h > 0, s"bad image dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    def v(i: Long): Int = (((seed + i) * 2654435761L % 1000000007L) % 251L).toInt
    var idx = 0L; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (v(idx) << 16) | (v(idx + 1) << 8) | v(idx + 2))
        idx += 3; x += 1
      }
      y += 1
    }
    writeImage(img, "png")
  }

  /** q_audio_neardup's fixture writer: base hash-mixed WAV (+0) and its
    * PERTURBED near-dup twin (+80000) — one bounded edit, overwriting
    * frame 17's 256 samples with a constant 500, so only the two energy
    * comparisons touching frame 17 (fingerprint bits 16 and 17) can
    * flip: a hamming ≤ 2 pair by construction, the audio analog of
    * [[nearImageForDoc]]'s single-pixel edit. */
  def nearAudioForDoc(clipId: Long): Array[Byte] = {
    require(clipId >= 0, s"negative clip id $clipId")
    val base = clipId % 80000
    val n = (34 * 256 + 128 * (base % 3)).toInt
    val b = encodeWavMix(n, 8000, base)
    if (clipId >= 80000) {
      var i = 17 * 256
      while (i < 18 * 256) { wrLE(b, 44 + 2 * i, 500L & 0xffffL, 2); i += 1 }
    }
    b
  }

  /** q_image_dedup's fixture writer: ONE picture per base id rendered
    * through byte-DIFFERENT containers and scales — base 24bpp BMP (+0),
    * its 2× nearest-neighbor upscale (+20000), the same raster as binary
    * PPM (+40000), and as real deflate-compressed PNG (+60000). All four
    * decode to rasters whose [[dHash64]] samples agree (channel-sum gray
    * is BGR/RGB-order-blind; the 2× upscale is exactly sample-invariant),
    * so the perceptual hash collapses them while any byte hash sees four
    * unrelated blobs. Rasters are HASH-MIXED ([[encodeBmpMix]]): under
    * the linear gradient formula 240 pictures shared only 134 distinct
    * hashes, conflating codec-collapse groups with accidental collisions
    * (221/240 distinct mixed). */
  def imageVariantForDoc(imgId: Long): Array[Byte] = {
    require(imgId >= 0, s"negative image id $imgId")
    val base = imgId % 20000
    val w = (8 + base % 5).toInt; val h = (8 + base % 3).toInt
    (imgId / 20000) match {
      case 0 => encodeBmpMix(w, h, base)
      case 1 => resizeBmp(encodeBmpMix(w, h, base), 2 * w, 2 * h)
      case 2 => encodePpmMix(w, h, base)
      case 3 => encodePngMix(w, h, base)
      case v => throw new IllegalArgumentException(s"bad image variant $v")
    }
  }

  /** [[encodeBmp]]'s twin with HASH-MIXED pixel bytes
    * (((seed+i)·2654435761 mod 1e9+7) mod 251) — the [[encodeWavMix]]
    * argument applied to pixels: the linear gradient raster makes every
    * picture's dHash a near-all-ones pattern (over half of all image
    * PAIRS landed under hamming 3 — a degenerate near-dup fixture), the
    * mix decorrelates pictures while staying exactly BIGINT-replayable. */
  def encodeBmpMix(w: Int, h: Int, seed: Long): Array[Byte] = {
    val b = encodeBmp(w, h, 0L)
    val stride = ((3 * w + 3) / 4) * 4
    var idx = 0L; var y = 0
    while (y < h) {
      var x = 0
      while (x < 3 * w) {
        b(54 + y * stride + x) =
          (((seed + idx) * 2654435761L % 1000000007L) % 251L).toByte
        idx += 1; x += 1
      }
      y += 1
    }
    b
  }

  /** q_image_neardup's fixture writer: base hash-mixed BMP (+0) and its
    * PERTURBED near-dup twin (+80000) — one real decoded-pixel edit,
    * overwriting the single pixel that only [[dHash64]]'s (r=7, c=8)
    * sample reads (sx(8) and sr(7) are hit by no other sample at these
    * dims) with max gray, so the twin's hash differs from the base in AT
    * MOST bit 63: a bounded-hamming pair by construction. */
  def nearImageForDoc(imgId: Long): Array[Byte] = {
    require(imgId >= 0, s"negative image id $imgId")
    val base = imgId % 80000
    val w = (8 + base % 5).toInt; val h = (8 + base % 3).toInt
    val bmp = encodeBmpMix(w, h, base)
    if (imgId >= 80000) {
      val stride = ((3 * w + 3) / 4) * 4
      val px = 54 + (7 * h / 8) * stride + 3 * (8 * w / 9)
      bmp(px) = 250.toByte; bmp(px + 1) = 250.toByte; bmp(px + 2) = 250.toByte
    }
    bmp
  }

  /** q_dedup_cap_audit's monochrome tier: a genuinely decoded CONSTANT
    * raster (binary PPM) — the letterbox-bar / blank-thumbnail shape
    * whose [[dHash64]] is exactly 0 (no rising gray anywhere), i.e. the
    * mega-bucket population the engaged maxBucket cap exists for. */
  def monoImageForDoc(imgId: Long): Array[Byte] = {
    require(imgId >= 0, s"negative image id $imgId")
    val w = (9 + imgId % 3).toInt; val h = 9
    val v = ((imgId % 5) * 40).toInt
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      Array.fill(3 * w * h)(v.toByte)
  }

  /** q_dedup_cap_recall's planted twin INSIDE the mega-bucket: a
    * [[monoImageForDoc]]-family constant raster with ONE bright pixel at
    * exactly the sample position only [[dHash64]]'s (r = editId%8, c = 8)
    * grid read touches — sx(8) = 8·w/9 is hit by no other column sample
    * at these dims, so the decoded hash is EXACTLY 1 << (r·8 + 7): a
    * genuine hamming-1 near-dup of every monochrome thumbnail, whose
    * every zero chunk lands in the all-zero mega-bucket. This is the
    * pair the plain maxBucket cap loses SILENTLY and the salvage tier
    * ([[Dedup.hammingSalvageEdges]]) must recover. */
  def monoEditImageForDoc(editId: Long): Array[Byte] = {
    require(editId >= 0, s"negative image id $editId")
    val b = monoImageForDoc(editId)
    val w = (9 + editId % 3).toInt; val h = 9
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII").length
    val x0 = 8 * w / 9; val y0 = ((editId % 8) * h / 8).toInt
    val px = hdr + 3 * (y0 * w + x0)
    b(px) = 250.toByte; b(px + 1) = 250.toByte; b(px + 2) = 250.toByte
    b
  }

  /** Compressed-codec blob for a document (q_multimodal_codec's writer):
    * PNG for even ids, JPEG for odd; dims 16+doc%13 × 16+doc%7 — large
    * enough that JPEG's DCT error stays well under the oracle's 5% sum
    * bound (1-pixel images measured up to 33%). */
  def codecMediaForDoc(docId: Long): Array[Byte] = {
    require(docId >= 0, s"negative doc_id $docId")
    val w = (16 + docId % 13).toInt; val h = (16 + docId % 7).toInt
    if (docId % 2 == 0) encodePng(w, h, docId) else encodeJpeg(w, h, docId)
  }

  /** Deterministic media blob for a document: doc_id % 3 picks the format,
    * dims/duration derive from doc_id — the same arithmetic the
    * q_multimodal_meta oracle evaluates in SQL. */
  def mediaForDoc(docId: Long): Array[Byte] = {
    require(docId >= 0, s"negative doc_id $docId")
    val w = (1 + docId % 13).toInt; val h = (1 + docId % 7).toInt
    (docId % 3) match {
      case 0 => encodeBmp(w, h, docId)
      case 1 => encodePpm(w, h, docId)
      case _ => encodeWav((8 * (100 + docId % 100)).toInt, 8000, docId)
    }
  }

  // ======================================================================
  // REAL decoder: format dispatch on magic bytes, strict header parsing.
  // Malformed input throws — silent zeros would poison a 100 TB metadata
  // table invisibly, and a decode error must surface as a task failure.
  // ======================================================================

  /** Parse header metadata + payload checksum from real BMP/PPM/WAV bytes. */
  def decodeMeta(b: Array[Byte]): MediaMeta = {
    require(b != null && b.length >= 12, "media blob too short for any magic")
    if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
             b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      decodeWav(b)
    else if (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      decodeImageIo(b, "png")
    else if (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte)
      decodeImageIo(b, "jpeg")
    else sys.error(f"unrecognized media magic 0x${b(0)}%02x 0x${b(1)}%02x")
  }

  /** ONE validated 24bpp-BMP header read for every BMP consumer (decode,
    * raster access, resize, layout checksum) — the parsing previously
    * lived in three divergent copies, and the Long-overflow hardening
    * had landed in exactly one of them: a crafted width near 2^31/3
    * wrapped `3*w` NEGATIVE in Int, sailed past the truncation require
    * (RHS negative), skipped the pixel loops entirely, and returned
    * silent zeros — the "silent zeros poison the table" class this
    * section's contract forbids. All size arithmetic here is Long; every
    * violation throws. Returns (w, h, stride, dataOff); `fixedDataOff`
    * callers additionally pin the 54-byte-header layout their pixel
    * loops assume. */
  private def bmp24Header(b: Array[Byte], what: String,
                          fixedDataOff: Boolean): (Int, Int, Int, Int) = {
    require(b.length >= 54, s"$what: bmp truncated header")
    val dataOff = rdLE(b, 10, 4).toInt
    val bpp = rdLE(b, 28, 2).toInt
    val compression = rdLE(b, 30, 4)
    require(bpp == 24 && compression == 0,
      s"$what: bmp bpp=$bpp comp=$compression (only uncompressed 24bpp)")
    if (fixedDataOff)
      require(dataOff == 54,
        s"$what: bmp pixel data at $dataOff, not 54 — larger DIB header/" +
          "palette layouts are unsupported here")
    else require(dataOff >= 54 && dataOff <= b.length,
      s"$what: bmp data offset $dataOff out of range")
    val w = rdLE(b, 18, 4).toInt; val h = rdLE(b, 22, 4).toInt
    require(w > 0 && h > 0, s"$what: bad BMP dims ${w}x$h")
    val strideL = ((3L * w + 3L) / 4L) * 4L
    require(b.length.toLong >= dataOff.toLong + strideL * h,
      s"$what: bmp truncated pixel payload")
    // a payload that fits the array bounds fits Int arithmetic
    (w, h, strideL.toInt, dataOff)
  }

  /** The PPM (P6) header parse shared by [[decodePpm]] and
    * [[grayRaster]] — previously two verbatim copies, both with the
    * Int-overflowing payload check [[bmp24Header]]'s doc describes.
    * Returns (w, h, payloadOffset). */
  private def ppmHeader(b: Array[Byte], what: String): (Int, Int, Int) = {
    var p = 2
    // header tokens separated by whitespace; '#' starts a comment to EOL
    def nextInt(): Int = {
      while (p < b.length && (b(p) == ' ' || b(p) == '\n' || b(p) == '\r' ||
             b(p) == '\t' || b(p) == '#')) {
        if (b(p) == '#') { while (p < b.length && b(p) != '\n') p += 1 }
        else p += 1
      }
      val start = p
      while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
      require(p > start, s"$what: ppm header expected integer at byte $start")
      new String(b, start, p - start, "US-ASCII").toInt
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(w > 0 && h > 0 && maxv == 255, s"$what: ppm ${w}x$h maxval=$maxv")
    p += 1 // exactly one whitespace byte between maxval and binary payload
    require(b.length.toLong >= p.toLong + 3L * w * h,
      s"$what: ppm truncated pixel payload")
    (w, h, p)
  }

  private def decodeBmp(b: Array[Byte]): MediaMeta = {
    val (w, h, rowBytes, dataOff) =
      bmp24Header(b, "decodeBmp", fixedDataOff = false)
    var sum = 0L; var y = 0
    while (y < h) { // checksum skips the padding tail of each row
      var x = 0
      while (x < 3 * w) { sum += b(dataOff + y * rowBytes + x) & 0xff; x += 1 }
      y += 1
    }
    MediaMeta("bmp", w, h, -1L, sum, b.length)
  }

  private def decodePpm(b: Array[Byte]): MediaMeta = {
    val (w, h, p) = ppmHeader(b, "decodePpm")
    var sum = 0L; var i = 0
    while (i < 3 * w * h) { sum += b(p + i) & 0xff; i += 1 }
    MediaMeta("ppm", w, h, -1L, sum, b.length)
  }

  /** PCM payload of a mono 16-bit WAV as signed samples + sample rate —
    * the RIFF chunk walk shared by [[decodeWav]] and [[audioFeatures]].
    * Unknown chunks are skipped (odd sizes pad one byte), so files with
    * LIST/INFO chunks between fmt and data still parse. */
  private def wavPcm(b: Array[Byte]): (Array[Int], Long) = {
    var p = 12; var rate = -1L; var bits = -1L; var channels = -1L
    var dataOff = -1; var dataLen = -1
    while (p + 8 <= b.length) {
      val sz = rdLE(b, p + 4, 4).toInt
      // corrupt chunk sizes: sz = -8 (or -9) would make the cursor
      // advance by ZERO and hang the walk forever — non-termination is
      // not an exception and escapes the streaming tier's null-on-error
      // wrappers; sz near Int.MaxValue would overflow the data-chunk
      // bound check below and drive a multi-GB allocation (a FATAL OOM,
      // same escape). Any chunk claiming to be negative or larger than
      // the file is corrupt: throw, which the SAFE UDFs map to null.
      require(sz >= 0 && sz <= b.length,
        s"wav: corrupt chunk size $sz at byte $p (file is ${b.length} bytes)")
      val id = new String(b, p, 4, "US-ASCII")
      if (id == "fmt ") {
        // the field reads below assume a full 16-byte PCM fmt block; a
        // chunk declaring less would read the NEXT chunk's header bytes
        // as format fields (garbage sample rate downstream) or die as a
        // raw AIOOBE at EOF instead of the clean reject
        require(sz >= 16 && p + 8 + sz <= b.length,
          s"wav: corrupt fmt chunk (size $sz at byte $p)")
        require(rdLE(b, p + 8, 2) == 1, "wav: only PCM (format tag 1)")
        channels = rdLE(b, p + 10, 2); rate = rdLE(b, p + 12, 4)
        bits = rdLE(b, p + 22, 2)
      } else if (id == "data") { dataOff = p + 8; dataLen = sz }
      p += 8 + sz + (sz & 1)
    }
    require(rate > 0 && bits == 16 && channels == 1 && dataOff >= 0,
      s"wav: rate=$rate bits=$bits ch=$channels dataOff=$dataOff (PCM mono 16-bit only)")
    require(b.length >= dataOff + dataLen && dataLen % 2 == 0, "wav truncated data chunk")
    val n = dataLen / 2
    val s = new Array[Int](n)
    var i = 0
    while (i < n) { // int16 LE, sign via Byte->Int extension of the high byte
      s(i) = (b(dataOff + 2 * i + 1).toInt << 8) | (b(dataOff + 2 * i) & 0xff)
      i += 1
    }
    (s, rate)
  }

  private def decodeWav(b: Array[Byte]): MediaMeta = {
    val (s, rate) = wavPcm(b)
    var sum = 0L; var i = 0
    while (i < s.length) { sum += s(i); i += 1 }
    MediaMeta("wav", -1L, -1L, s.length * 1000L / rate, sum, b.length)
  }

  // ======================================================================
  // Video, REAL uncompressed tier: Y4M (YUV4MPEG2) — ASCII stream header,
  // then per frame an ASCII "FRAME\n" marker + raw C420 planes
  // (w*h luma + 2 quarter-size chroma). The one video container a pure
  // JVM can parse byte-exactly; H.264 remains the documented codec stub.
  // ======================================================================

  /** Y4M writer: payload byte i of the CONCATENATED frame planes (all
    * frames, Y then U then V per frame) is (seed*5 + i) % 241 — one
    * formula, so oracles recompute sums closed-form. C420 needs even
    * dims; 25:1 frame rate → 40 ms per frame. */
  def encodeY4m(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"y4m C420 needs even dims, got ${w}x$h")
    require(nFrames > 0, s"bad frame count $nFrames")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](
      header.length + nFrames * (marker.length + frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length; var i = 0L; var f = 0
    while (f < nFrames) {
      System.arraycopy(marker, 0, out, p, marker.length)
      p += marker.length
      var j = 0
      while (j < frameBytes) {
        out(p) = ((seed * 5 + i) % 241).toByte
        p += 1; i += 1; j += 1
      }
      f += 1
    }
    out
  }

  /** Parsed Y4M stream: real dims, frame count from the actual FRAME
    * markers, duration from the header's rate, payload checksum plus the
    * max per-frame LUMA-plane sum (the framing proof — wrong plane sizes
    * or marker handling shifts every later frame's luma window). */
  final case class VideoMeta(width: Long, height: Long, n_frames: Long,
      duration_ms: Long, content_sum: Long, max_frame_luma: Long)

  /** parsed stream header + the byte offset where frame data starts —
    * shared by [[videoMeta]] and [[videoFrameStats]] */
  private final case class Y4mHead(w: Int, h: Int, fNum: Long, fDen: Long,
      payloadStart: Int) {
    // Long first: a crafted W/H near Int.MaxValue wraps w*h to a small
    // NEGATIVE frameBytes in Int, and the frame walks advance their
    // cursor by frameBytes — a zero/negative advance is NON-TERMINATION,
    // not an exception, so it escapes the streaming tier's null-on-error
    // wrappers (the wavPcm chunk-size hazard on the video axis). A frame
    // that cannot fit in an Int cannot fit in any real blob: refuse.
    private val frameBytesL: Long = 1L * w * h + 2L * (w / 2) * (h / 2)
    require(frameBytesL > 0 && frameBytesL <= Int.MaxValue,
      s"y4m: frame size $frameBytesL bytes out of range for W$w H$h")
    val lumaBytes: Int = w * h
    val frameBytes: Int = frameBytesL.toInt
  }

  private def y4mHead(b: Array[Byte]): Y4mHead = {
    require(b.length >= 10 &&
      new String(b, 0, 9, "US-ASCII") == "YUV4MPEG2", "not a Y4M stream")
    var nl = 9
    while (nl < b.length && b(nl) != '\n') nl += 1
    require(nl < b.length, "y4m: unterminated stream header")
    var w = -1; var h = -1; var fNum = -1L; var fDen = -1L
    for (tok <- new String(b, 9, nl - 9, "US-ASCII").trim.split(" ")
         if tok.nonEmpty) tok.charAt(0) match {
      case 'W' => w = tok.drop(1).toInt
      case 'H' => h = tok.drop(1).toInt
      case 'F' =>
        val Array(n, d) = tok.drop(1).split(":"); fNum = n.toLong; fDen = d.toLong
      case 'C' => require(tok == "C420", s"y4m: only C420 supported, got $tok")
      case _ => () // interlacing/aspect/extensions: irrelevant to the walk
    }
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0 && fNum > 0 && fDen > 0,
      s"y4m header: W$w H$h F$fNum:$fDen")
    Y4mHead(w, h, fNum, fDen, nl + 1)
  }

  def videoMeta(b: Array[Byte]): VideoMeta = {
    val hd = y4mHead(b)
    val w = hd.w; val h = hd.h; val fNum = hd.fNum; val fDen = hd.fDen
    val lumaBytes = hd.lumaBytes
    val frameBytes = hd.frameBytes
    var p = hd.payloadStart; var frames = 0L; var sum = 0L; var maxLuma = 0L
    while (p < b.length) {
      require(p + 6 <= b.length &&
        new String(b, p, 5, "US-ASCII") == "FRAME", s"y4m: no FRAME marker at $p")
      var q = p + 5 // frame params (none written here) end at the newline
      while (q < b.length && b(q) != '\n') q += 1
      require(q + frameBytes < b.length, "y4m: truncated frame payload")
      var j = 0; var luma = 0L
      while (j < frameBytes) {
        val v = (b(q + 1 + j) & 0xff).toLong
        sum += v
        if (j < lumaBytes) luma += v
        j += 1
      }
      if (luma > maxLuma) maxLuma = luma
      frames += 1
      p = q + 1 + frameBytes
    }
    require(frames > 0, "y4m: no frames")
    VideoMeta(w.toLong, h.toLong, frames,
      frames * 1000L * fDen / fNum, sum, maxLuma)
  }

  /** One sampled frame's integer stats: exact luma- and chroma-plane sums
    * (the per-frame brightness/color energy every sampling-based video
    * filter — scene change, black-frame drop, thumbnail pick — builds on). */
  final case class FrameStat(frame_idx: Long, luma_sum: Long, chroma_sum: Long)

  /** Frame sampling: walk the stream like [[videoMeta]] but keep every
    * `stride`-th frame's plane sums (frame 0, stride, 2*stride, ...).
    * Sampling happens INSIDE the per-row kernel — a 2-hour clip never
    * materializes its unsampled frames into the row, which is the whole
    * point of frame-sampling at 100 TB. Malformed input throws, same
    * policy as the other walkers. */
  def videoFrameStats(b: Array[Byte], stride: Int): Array[FrameStat] = {
    require(stride > 0, s"bad stride $stride")
    val hd = y4mHead(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameStat]
    var p = hd.payloadStart; var f = 0L
    while (p < b.length) {
      require(p + 6 <= b.length &&
        new String(b, p, 5, "US-ASCII") == "FRAME", s"y4m: no FRAME marker at $p")
      var q = p + 5
      while (q < b.length && b(q) != '\n') q += 1
      require(q + hd.frameBytes < b.length, "y4m: truncated frame payload")
      if (f % stride == 0) {
        var j = 0; var luma = 0L; var chroma = 0L
        while (j < hd.frameBytes) {
          val v = (b(q + 1 + j) & 0xff).toLong
          if (j < hd.lumaBytes) luma += v else chroma += v
          j += 1
        }
        out += FrameStat(f, luma, chroma)
      }
      f += 1
      p = q + 1 + hd.frameBytes
    }
    require(f > 0, "y4m: no frames")
    out.toArray
  }

  /** 64-bit video CLIP fingerprint — [[dHash64]] lifted to the time axis
    * (temporal-mean difference hash): walk the Y4M stream like
    * [[videoFrameStats]], and for every `stride`-th frame accumulate the
    * luma value at each of dHash's 8×9 grid positions (x = j·w/9,
    * y = r·h/8 — the same integer-division sample map, so the resize
    * identity carries over); bit (r,c) = colSum(r,c+1) > colSum(r,c).
    * Comparing per-position SUMS over an equal frame count is comparing
    * temporal MEANS, so the signature is a mean-frame dHash: stable under
    * per-frame noise that a per-frame-hash XOR fold would amplify, and a
    * bounded single-pixel edit in ONE sampled frame can move only the one
    * grid sum that reads it (at most one bit flips when the edited pixel
    * is read by a single grid position — the PropertiesSpec pin).
    * Unsampled frames never leave the walk, same contract as the frame
    * walkers; chunk via [[graft.operators.Dedup.hammingPairs]] with
    * bits=64. Malformed input throws.
    *
    * CONTAINER-INVARIANT by construction: dispatch on magic bytes — raw
    * Y4M reads the luma plane directly, GIF decodes each sampled frame
    * through the real ImageIO LZW codec and reads the CHANNEL SUM at the
    * same grid. For the same underlying frames, channel-sum gray is
    * exactly 3× the luma value (gray palette), and dHash bits are
    * order comparisons — invariant under any positive scaling — so the
    * same clip rendered as raw Y4M and as compressed GIF carries ONE
    * fingerprint (spec-pinned over random dims/seeds), while byte hashes
    * see two unrelated blobs. */
  def videoFingerprint(b: Array[Byte], stride: Int): Long = {
    require(stride > 0, s"bad stride $stride")
    require(b != null && b.length >= 6, "videoFingerprint: empty blob")
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      return videoFingerprintGif(b, stride)
    val hd = y4mHead(b)
    val w = hd.w; val h = hd.h
    val sums = Array.ofDim[Long](8, 9)
    var p = hd.payloadStart; var f = 0L; var sampled = 0L
    while (p < b.length) {
      require(p + 6 <= b.length &&
        new String(b, p, 5, "US-ASCII") == "FRAME", s"y4m: no FRAME marker at $p")
      var q = p + 5
      while (q < b.length && b(q) != '\n') q += 1
      require(q + hd.frameBytes < b.length, "y4m: truncated frame payload")
      if (f % stride == 0) {
        var r = 0
        while (r < 8) {
          val y = r * h / 8
          var j = 0
          while (j < 9) {
            sums(r)(j) += (b(q + 1 + y * w + j * w / 9) & 0xff).toLong
            j += 1
          }
          r += 1
        }
        sampled += 1
      }
      f += 1
      p = q + 1 + hd.frameBytes
    }
    require(sampled > 0, "y4m: no frames")
    foldGrid(sums)
  }

  /** The 8x8 order-comparison bit fold over the temporal-mean 8x9 grid —
    * ONE body for the Y4M and GIF fingerprint branches: the documented
    * container invariance (one fingerprint across containers) holds only
    * while the two folds are bit-identical, which two hand-maintained
    * copies cannot guarantee. */
  private def foldGrid(sums: Array[Array[Long]]): Long = {
    var hash = 0L; var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r)(c + 1) > sums(r)(c)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** [[videoFingerprint]]'s GIF branch: the identical temporal-mean grid
    * fold over ImageIO-decoded frames (channel-sum gray — 3× luma for a
    * gray palette, dHash-bit-equivalent since bits are order
    * comparisons). reader.read is per-index, so unsampled frames never
    * decode — the frame-sampling contract at 100 TB. */
  private def videoFingerprintGif(b: Array[Byte], stride: Int): Long = {
    imageIoInit
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "no ImageIO gif reader")
    val rd = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      rd.setInput(iis, false)
      val n = rd.getNumImages(true)
      require(n > 0, "gif: no frames")
      val sums = Array.ofDim[Long](8, 9)
      var f = 0
      while (f < n) {
        if (f % stride == 0) {
          // same pre-allocation dim guard as gifFrameStats
          val (gw, gh) = (rd.getWidth(f), rd.getHeight(f))
          require(gw > 0 && gh > 0 && gw.toLong * gh <= MaxDecodePixels,
            s"gif frame $f: declared ${gw}x$gh exceeds the decode guard")
          val img = rd.read(f)
          val w = img.getWidth; val h = img.getHeight
          var r = 0
          while (r < 8) {
            val y = r * h / 8
            var j = 0
            while (j < 9) {
              val rgb = img.getRGB(j * w / 9, y)
              sums(r)(j) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)
              j += 1
            }
            r += 1
          }
        }
        f += 1
      }
      foldGrid(sums)
    } finally { rd.dispose(); iis.close() }
  }

  /** q_video_dedup's fixture writer: ONE clip per base id rendered
    * through byte-DIFFERENT containers — raw hash-mixed Y4M (+0) and the
    * same frames as real LZW-compressed GIF (+20000, [[encodeGifMix]]
    * with the Y4M frame stride so frame rasters are value-identical to
    * the Y4M luma plane). Both decode to frames whose
    * [[videoFingerprint]] grid comparisons agree, so the perceptual
    * fingerprint collapses them while any byte hash sees two unrelated
    * files — [[imageVariantForDoc]]'s story lifted to the time axis. */
  def videoVariantForDoc(mediaId: Long): Array[Byte] = {
    require(mediaId >= 0, s"negative media id $mediaId")
    val base = mediaId % 20000
    val w = (10 + 2 * (base % 4)).toInt
    val h = (8 + 2 * (base % 3)).toInt
    val nf = (3 + base % 4).toInt
    (mediaId / 20000) match {
      case 0 => encodeY4mMix(w, h, nf, base)
      case 1 => encodeGifMix(w, h, nf, base, 3 * w * h / 2)
      case v => throw new IllegalArgumentException(s"bad video variant $v")
    }
  }

  /** [[encodeY4m]]'s twin with HASH-MIXED payload bytes — the
    * [[encodeBmpMix]]/[[encodeWavMix]] argument applied to video: the
    * linear (seed·5 + i) % 241 payload makes every clip a phase-shift of
    * the same periodic stream, so clips sharing dims would collide en
    * masse under any temporal-sum fingerprint (the documented dedup-
    * fixture trap); the multiplicative mix decorrelates seeds while
    * staying exactly BIGINT-replayable in the oracle. */
  def encodeY4mMix(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val b = encodeY4m(w, h, nFrames, 0L)
    val hd = y4mHead(b)
    var f = 0; var i = 0L
    while (f < nFrames) {
      val base = hd.payloadStart + f * (6 + hd.frameBytes) + 6
      var j = 0
      while (j < hd.frameBytes) {
        b(base + j) = (((seed + i) * 2654435761L % 1000000007L) % 241L).toByte
        i += 1; j += 1
      }
      f += 1
    }
    b
  }

  /** q_video_neardup's fixture writer: base hash-mixed Y4M (+0) and its
    * PERTURBED near-dup twin (+80000) — one bounded decoded-pixel edit,
    * overwriting the single luma pixel of SAMPLED frame 2 that only
    * [[videoFingerprint]]'s (r=7, j=8) grid position reads (x = 8w/9 and
    * y = 7h/8 are hit by no other sample at these dims — verified for
    * every (w, h) the id formula produces) with near-max luma, so the
    * twin's fingerprint differs from the base in AT MOST bit 63: the
    * video analog of [[nearImageForDoc]]'s single-pixel edit. */
  def nearVideoForDoc(mediaId: Long): Array[Byte] = {
    require(mediaId >= 0, s"negative media id $mediaId")
    val base = mediaId % 80000
    val w = (10 + 2 * (base % 4)).toInt
    val h = (8 + 2 * (base % 3)).toInt
    val nf = (3 + base % 4).toInt
    val b = encodeY4mMix(w, h, nf, base)
    if (mediaId >= 80000) {
      val hd = y4mHead(b)
      val off = hd.payloadStart + 2 * (6 + hd.frameBytes) + 6 +
        (7 * h / 8) * w + 8 * w / 9
      b(off) = 240.toByte
    }
    b
  }

  /** Real DSP over the PCM payload (the audio analog of the decoded-pixel
    * work): sign-change count over the whole clip, exact integer energy
    * (Σ s²) total and per non-overlapping `frame`-sample frame (max
    * reported; the tail short frame is excluded from the max, included in
    * the total). All integer arithmetic — 2000² × clip length ≪ 2⁶³ —
    * so the q_audio_features oracle replays every value closed-form. */
  final case class AudioFeatures(n_frames: Long, zero_crossings: Long,
      max_frame_energy: Long, total_energy: Long)

  def audioFeatures(b: Array[Byte], frame: Int): AudioFeatures = {
    require(frame > 0, s"bad frame size $frame")
    val (s, _) = wavPcm(b)
    var zcr = 0L; var i = 1
    while (i < s.length) {
      if ((s(i - 1) < 0) != (s(i) < 0)) zcr += 1
      i += 1
    }
    val k = s.length / frame
    var maxE = 0L; var f = 0
    while (f < k) {
      var e = 0L; var j = 0
      while (j < frame) {
        val v = s(f * frame + j).toLong; e += v * v; j += 1
      }
      if (e > maxE) maxE = e
      f += 1
    }
    var tot = 0L; i = 0
    while (i < s.length) { tot += s(i).toLong * s(i); i += 1 }
    AudioFeatures(k.toLong, zcr, maxE, tot)
  }

  // ======================================================================
  // Real pixel work: nearest-neighbor BMP resize + a position-weighted
  // payload checksum. Both operate in STORAGE order (BMP bottom-up rows):
  // resize maps storage row r to source storage row r*srcH/dstH — a
  // uniform flip of both spaces is the same mapping, so nearest-neighbor
  // in storage coordinates IS nearest-neighbor in image coordinates.
  // ======================================================================

  /** Nearest-neighbor resize of a 24bpp bottom-up BMP to dstW x dstH.
    * Output stride re-pads to 4 bytes; header dims/sizes patched. */
  def resizeBmp(b: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    require(b.length >= 2 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    require(dstW > 0 && dstH > 0, s"bad resize dims ${dstW}x$dstH")
    // shared header discipline ([[bmp24Header]]) — the old inline checks
    // never validated srcW/srcH, so a zero-width source was silently
    // "resized" into a structurally valid image fabricated from header
    // bytes (every sx mapped to pixel 0 = bytes 54..56)
    val (srcW, srcH, srcStride, _) =
      bmp24Header(b, "resizeBmp", fixedDataOff = true)
    val dstStrideL = ((3L * dstW + 3L) / 4L) * 4L
    require(54L + dstStrideL * dstH <= Int.MaxValue,
      s"resizeBmp: output ${dstW}x$dstH does not fit a byte array")
    val dstStride = dstStrideL.toInt
    val out = new Array[Byte](54 + dstStride * dstH) // zero pad bytes
    System.arraycopy(b, 0, out, 0, 54)
    wrLE(out, 2, out.length, 4)
    wrLE(out, 18, dstW, 4); wrLE(out, 22, dstH, 4)
    wrLE(out, 34, dstStride * dstH, 4)
    var r = 0
    while (r < dstH) {
      val sr = r * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        var c = 0
        while (c < 3) {
          out(54 + r * dstStride + 3 * x + c) = b(54 + sr * srcStride + 3 * sx + c)
          c += 1
        }
        x += 1
      }
      r += 1
    }
    out
  }

  /** Position-weighted BMP payload checksum: Σ byte_j * (j+1) mod P over
    * the un-padded payload in storage-raster order. Unlike content_sum's
    * plain sum this pins the exact pixel LAYOUT — a transposed, flipped or
    * stride-corrupted resize changes it. */
  def weightedPixelSum(b: Array[Byte]): Long = {
    val P = 1000000007L
    // shared validated header ([[bmp24Header]]): the old raw reads had
    // zero checks, so a corrupt blob yielded a silent 0 (Int-overflowed
    // 3*w skipped the loop) or a bare AIOOBE — defeating the loud
    // layout-pinning purpose of this checksum
    val (w, h, stride, _) =
      bmp24Header(b, "weightedPixelSum", fixedDataOff = true)
    var acc = 0L
    var j = 0L
    var r = 0
    while (r < h) {
      var k = 0
      while (k < 3 * w) {
        val v = (b(54 + r * stride + k) & 0xff).toLong
        acc = (acc + v * ((j + 1) % P)) % P
        j += 1; k += 1
      }
      r += 1
    }
    acc
  }

  import org.apache.spark.sql.functions.udf
  /** Kernel UDFs for q_multimodal_meta: per-row pure byte work (format
    * encode/parse) — imperative loops over binary, the documented UDF
    * carve-out (no Catalyst expression operates inside a byte array). */
  val mediaForDocUdf = udf((docId: Long) => mediaForDoc(docId))
  val codecMediaForDocUdf = udf((docId: Long) => codecMediaForDoc(docId))
  val resizeImageUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeImage(b, w, h))
  val rasterWeightedSumUdf = udf((b: Array[Byte]) => rasterWeightedSum(b))
  val audioFeaturesUdf = udf((b: Array[Byte], frame: Int) => audioFeatures(b, frame))
  val y4mForDocUdf = udf((docId: Long) => {
    require(docId >= 0, s"negative doc_id $docId")
    encodeY4m((2 * (1 + docId % 6)).toInt, (2 * (1 + docId % 3)).toInt,
      (3 + docId % 5).toInt, docId)
  })
  val videoMetaUdf = udf((b: Array[Byte]) => videoMeta(b))
  val videoFrameStatsUdf =
    udf((b: Array[Byte], stride: Int) => videoFrameStats(b, stride))
  val gifForDocUdf = udf((docId: Long) => {
    require(docId >= 0, s"negative doc_id $docId")
    encodeGif((3 + docId % 6).toInt, (2 + docId % 4).toInt,
      (3 + docId % 5).toInt, docId)
  })
  val gifFrameStatsUdf =
    udf((b: Array[Byte], stride: Int) => gifFrameStats(b, stride))
  val dHash64Udf = udf((b: Array[Byte]) =>
    if (b == null) null else java.lang.Long.valueOf(dHash64(b)))
  val imageVariantForDocUdf = udf((imgId: Long) => imageVariantForDoc(imgId))
  val nearImageForDocUdf = udf((imgId: Long) => nearImageForDoc(imgId))
  val imageGrayBucketsUdf =
    udf((b: Array[Byte], dim: Int) => imageGrayBuckets(b, dim))
  val nearAudioForDocUdf = udf((clipId: Long) => nearAudioForDoc(clipId))
  val videoFingerprintUdf =
    udf((b: Array[Byte], stride: Int) => videoFingerprint(b, stride))
  val nearVideoForDocUdf = udf((mediaId: Long) => nearVideoForDoc(mediaId))
  val videoVariantForDocUdf = udf((mediaId: Long) => videoVariantForDoc(mediaId))
  val monoImageForDocUdf = udf((imgId: Long) => monoImageForDoc(imgId))
  val monoEditImageForDocUdf = udf((editId: Long) => monoEditImageForDoc(editId))
  val audioVariantForDocUdf = udf((clipId: Long) => audioVariantForDoc(clipId))
  val audioFingerprintUdf =
    udf((b: Array[Byte], frameLen: Int) => audioFingerprint(b, frameLen))
  /** FAULT-TOLERANT fingerprint UDFs for STREAMING ingest: a corrupt
    * blob (truncated container, wrong magic, garbage bytes) maps to
    * NULL instead of throwing — the strict UDFs above fail the task and
    * a single undecodable row would terminate the whole streaming query
    * (the one-dirty-row class ADVICE r9 flagged for null embeddings;
    * corruption is the non-null half of it, and at continuous-ingest
    * scale corrupt blobs are routine, not exceptional). The streaming
    * near-dup wrappers pair these with their fp-null ingest filter, so
    * dirty rows drop silently IN FLIGHT; batch pipelines keep the STRICT
    * UDFs — offline, a decode failure should stop the job loudly so the
    * corrupt partition is quarantined, not silently under-fingerprinted
    * (count dropped rows with `…SafeUdf IS NULL` when triage needs it). */
  private def nullOnError(f: Array[Byte] => Long): Array[Byte] => java.lang.Long =
    b => if (b == null) null
         else try java.lang.Long.valueOf(f(b))
         catch { case scala.util.control.NonFatal(_) => null }
  val dHash64SafeUdf = udf(nullOnError(dHash64))
  // parameter errors are CONFIG, not data: checked OUTSIDE the
  // null-on-error wrapper, so a misconfigured constant (stride/frameLen
  // <= 0) fails the query loudly instead of mapping 100% of rows to
  // null — which the fp-null ingest filters would then drop as "corrupt
  // blobs", making a pipeline typo indistinguishable from total data
  // corruption
  val audioFingerprintSafeUdf =
    udf((b: Array[Byte], frameLen: Int) => {
      require(frameLen > 0, s"audioFingerprint: frameLen=$frameLen <= 0 " +
        "is a configuration error, not a data error")
      nullOnError(audioFingerprint(_, frameLen))(b)
    })
  val videoFingerprintSafeUdf =
    udf((b: Array[Byte], stride: Int) => {
      require(stride > 0, s"videoFingerprint: stride=$stride <= 0 is a " +
        "configuration error, not a data error")
      nullOnError(videoFingerprint(_, stride))(b)
    })

  val metaUdf = udf((b: Array[Byte]) => decodeMeta(b))
  val resizeBmpUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeBmp(b, w, h))
  val weightedPixelSumUdf = udf((b: Array[Byte]) => weightedPixelSum(b))

  /** canonical media table schema */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))))))

  // ======================================================================
  // STUB: deterministic fake decoder. A real implementation would invoke an
  // image/audio codec here; none ships in this environment. The fake is a
  // pure function of the bytes, so tests and oracle runs are reproducible.
  // ======================================================================
  private[operators] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < content.length) {
      h = (h ^ (content(i) & 0xffL)) * 1099511628211L
      out((i % dim + dim) % dim) += ((h >>> 33) % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** REAL image features for ImageIO-decodable blobs: mean gray luminance
    * (integer 299/587/114 weights) over `dim` equal pixel-index buckets —
    * a fixed, deterministic featurizer running on genuinely decoded
    * pixels. Empty buckets (fewer pixels than dim) stay 0. */
  private[operators] def imageFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    val img = boundedImageIoRead(content, "imageFeatures")
    val out = new Array[Float](dim)
    val cnt = new Array[Int](dim)
    val total = img.getWidth * img.getHeight
    var y = 0; var idx = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        val gray = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000
        val b = (idx.toLong * dim / total).toInt
        out(b) += gray; cnt(b) += 1
        idx += 1; x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { if (cnt(i) > 0) out(i) /= cnt(i); i += 1 }
    out
  }

  private def isImageIoMagic(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 &&
      ((b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N') ||
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))

  /** Batch feature extraction: content bytes → `dim`-float feature vector.
    * Typed Dataset mapPartitions (not a per-row UDF, not an RDD drop-down):
    * a real decoder amortizes codec init per partition — the same batch
    * shape Pandas UDFs give PySpark — while rows stay Tungsten-encoded
    * end-to-end and the plan stays a single DeserializeToObject →
    * MapPartitions → SerializeFromObject pipeline Catalyst can place.
    * PNG/JPEG blobs get REAL decoded-pixel features ([[imageFeatures]]);
    * formats with no JVM codec (mp3/h264) keep the marked fake. */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, model weights, ...)
        imageIoInit
        rows.map { case (id, kind, content) =>
          (id, kind,
            if (isImageIoMagic(content)) imageFeatures(content, dim)
            else fakeDecode(content, dim))
        }
      }
      .toDF("media_id", "kind", "feature")
  }

  /** Video frame sampling: one row per sampled frame timestamp — a pure
    * generator (explode over a sequence), no decode needed until the frame
    * is actually fetched. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("kind") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)))
          .as("frame_ts_ms"))

  /** Resize request plumbing: records the target geometry next to the
    * metadata. For BMP media the pixel work is REAL ([[resizeBmp]],
    * oracle-backed by q_multimodal_resize); compressed formats would
    * decode first (no codecs in this environment). */
  def withResizeSpec(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("resize_spec",
      struct(lit(w).as("width"), lit(h).as("height"),
        (col("meta.width") * col("meta.height")).isNotNull.as("known_source")))
}
