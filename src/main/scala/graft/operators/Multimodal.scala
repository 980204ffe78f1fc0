package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column operators (north-star extension, SURVEY §2.3): media
  * payloads are opaque `BinaryType` columns + typed metadata; decode /
  * feature-extract / frame-sample run as batched per-partition functions.
  *
  * Decode runs through [[MediaDecoder]]: REAL pixels for PNG (the JVM's
  * built-in ImageIO codec), a clearly-marked deterministic stub for formats
  * this container ships no codec for (jpeg/video/audio); everything around it —
  * schema, binary columns, partition-batched iteration, feature array shape,
  * byte-level ops — is real Spark and tested. Swapping the stub for a JNI /
  * onnx decoder changes one function, not the pipeline.
  *
  * Byte-level operators (q70) are pure SQL expressions with an exact DuckDB
  * oracle; the payload here is the document text re-encoded as bytes (the
  * fixtures ship no true media blobs).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** documents with a fake binary payload column, standing in for a media
    * blob: payload = utf-8 bytes of `text` (ASCII fixture ⇒ 1 byte/char). */
  def withPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        lit("fake/plain").as("format"),
        length(col("text")).as("n_bytes")))

  /** Byte-level metadata + frame sampling via native
    * [[graft.functions.BytePoly]] expressions (per-char HOF lambdas were
    * interpreted): payload size, additive checksum mod 997, every-16th-byte
    * "frame" sample count and sum. */
  private val q70: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    withPayload(s, d)
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        expr("graft_checksum997(text)").as("checksum"),
        ceil(length(col("text")) / 16.0).cast("int").as("n_frames"),
        expr("graft_frame_sum16(text)").as("frame_sum"))
      .orderBy(col("doc_id"))
  }

  /** Decode + feature-extract through the batched partition path (the
    * mapInPandas-shaped plumbing): binary payload → MediaDecoder → fixed-width
    * feature vector. The fixture payloads take the stub path (text bytes,
    * not PNG), which is deterministic integer/float32 arithmetic
    * over the payload bytes, so even this path carries a full DuckDB oracle;
    * the pipeline — BinaryType in, ArrayType(FloatType) out, batched per
    * partition — is the real thing. */
  private val q71: Q = (s, d) => {
    val src = withPayload(s, d).select(col("doc_id"), col("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType)),
      StructField("thumb", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    src.mapPartitions { (it: Iterator[Row]) =>
      // Batched iteration: one decoder instance per partition, reused across
      // rows — the expensive-init shape a real codec needs.
      val decoder = new MediaDecoder
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = decoder.decode(bytes)
        Row(id, img.width, img.height, img.features, decoder.resize(bytes, 32))
      }
    }(enc)
      // Canonicalize the array/binary columns to strings so the driver's
      // rows check (pandas-based, cannot hash arrays) can consume the dump;
      // the typed shape above is what a downstream pipeline would consume.
      .select(col("doc_id"), col("width"), col("height"),
        expr("array_join(transform(features, x -> cast(cast(round(cast(x as double), 6) as decimal(12,6)) as string)), ',')")
          .as("features"),
        hex(col("thumb")).as("thumb"))
      .orderBy(col("doc_id"))
  }

  /** Frame-table extraction — the video-pipeline shape q70/q71 don't cover:
    * one payload row explodes into one row PER sampled frame (here: 16-byte
    * "frames" of the stand-in payload), each carrying its own bytes-length
    * and checksum. At 100 TB this is the map-side row expansion feeding a
    * per-frame feature extractor; frame count rides the metadata so the
    * explode needs no second scan. */
  private val q72: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    withPayload(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(expr("sequence(0, cast(ceil(length(text) / 16.0) as int) - 1)"))
          .as("frame_no"),
        col("text"))
      .select(col("doc_id"), col("frame_no"),
        expr("substring(text, frame_no * 16 + 1, 16)").as("frame"))
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).as("n_bytes"),
        expr("graft_checksum997(frame)").as("checksum"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** Stages each document's payload as its own `doc_<id>.bin` file.
    *
    * Idempotence is CONTENT-ADDRESSED: the fingerprint is the fixture
    * file's (size, md5) — (size, mtime) alone would reuse stale blobs when
    * a regenerated fixture lands with identical size and a preserved mtime
    * (e.g. restored from an archive). Hashing the fixture is a bounded
    * driver read: it is test-fixture prep, sized by the fixture, never by
    * a production corpus.
    *
    * Writes are EXECUTOR-SIDE (`foreachPartition` straight from the scan —
    * no driver collect; each task writes only its partition's rows), into a
    * fresh temp dir that is atomically renamed into place once its
    * `_STAGED` marker is written. A crash mid-stage therefore leaves only
    * an orphaned temp dir — never a half-staged dir the binaryFile glob
    * would match — and a regen can never serve rows the new fixture
    * dropped, because a new fingerprint is a new directory (stale
    * fingerprints of the same fixture path are deleted). On a real cluster
    * point this at shared storage (all executors must reach the dir). */
  private def binaryStageDir(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val (srcSize, md5hex) =
      graft.Tables.fixtureFingerprint(Paths.get(d, "documents.parquet"))
    val fp = s"${srcSize}_${md5hex.take(16)}"
    val safe = d.replaceAll("[^A-Za-z0-9.]", "_")
    val base = Paths.get(sys.props("java.io.tmpdir"))
    // '-' cannot appear in `safe` (the sanitizer maps it to '_'), so it is
    // an unambiguous path/fingerprint separator: without it, the stale
    // reclaim below would prefix-match ANOTHER fixture whose sanitized
    // path extends this one (…/sf1 vs …/sf1_v2) and delete its staging
    val dir = base.resolve(s"graft_bin_$safe-$fp")
    val marker = dir.resolve("_STAGED")
    if (!Files.exists(marker)) {
      // Reclaim dirs staged for OLDER contents of this same fixture path.
      val stale = base.toFile.listFiles()
      if (stale != null) stale.filter { f =>
        f.isDirectory && f.getName.startsWith(s"graft_bin_$safe-") &&
          f.getName != dir.getFileName.toString
      }.foreach(deleteRecursively)
      val tmp = Files.createTempDirectory(base, s"graft_bin_stage_")
      val tmpPath = tmp.toString
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val out = java.nio.file.Paths.get(tmpPath)
          it.foreach { r =>
            java.nio.file.Files.write(out.resolve(s"doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        }
      Files.write(tmp.resolve("_STAGED"), Array.emptyByteArray)
      // A half-staged target (crash before ITS marker) is dead weight: drop
      // it, then move the fully-staged temp dir into place atomically. If a
      // concurrent stager won the race, keep the winner and drop ours.
      if (Files.exists(dir) && !Files.exists(marker)) deleteRecursively(dir.toFile)
      try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      // DirectoryNotEmptyException is Linux's actual signal for this race:
      // rename(2) onto an existing non-empty dir fails ENOTEMPTY, not EEXIST
      catch { case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.AccessDeniedException |
                   _: java.nio.file.DirectoryNotEmptyException =>
        if (Files.exists(marker)) deleteRecursively(tmp.toFile)
        else throw new IllegalStateException(
          s"binaryStageDir: $dir exists without a _STAGED marker after move race")
      }
    }
    dir.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** The raw-media ingestion path a multimodal corpus actually starts from:
    * one FILE per blob, read through Spark's built-in `binaryFile` source
    * (path/modificationTime/length/content columns; `pathGlobFilter`
    * prunes at listing time — no content is opened for non-matching
    * files). Identity (doc_id) parses from the path, integrity is the
    * payload digest; the oracle recomputes both from the documents table
    * the staging wrote, so the gate certifies byte-exact round-trip
    * through the filesystem. At 100 TB this is the pattern for image/audio
    * shards: list → prune by glob/size → read bytes once, map-side. */
  private val q146: Q = (s, d) => {
    val dir = binaryStageDir(s, d)
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("digest"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual near-duplicate detection over the binary payload — the
    * MEDIA twin of q105's token simhash: fingerprint the payload's
    * fixed-size FRAME stream (the q72 unit), simhash the frame-hash
    * multiset into one 60-bit signature, and pair via
    * [[Dedup.simHashPairsFromSig]]'s 4×15-bit Hamming banding. Robust to
    * local frame edits — a re-encoded clip sharing most frames lands
    * within the Hamming radius — which byte-exact md5 dedup (q146's
    * digest) cannot see. The payload here is the documents stand-in
    * ([[withPayload]]: utf-8 text bytes, so `textCol` feeds the frame
    * slicer directly, the q70 equivalence); a real pipeline feeds decoded
    * frame bytes.
    *
    * Per-frame hash is the corpus-standard md5 60-bit fold (the Dedup
    * h60), bit votes tie to 0 exactly as q52's SimHash60 does (`> 0`
    * sets the bit), so the signature algebra is replayable integer-exact
    * in the oracle. Signature construction is ONE map-side projection
    * (nested HOF: 60 bits × n_frames votes, no shuffle); the only
    * exchanges are the banding join's — candidates are band-equality
    * collisions under the same `maxBandDf` skew valve, never all pairs. */
  def frameSimHashNearDup(df: DataFrame, idCol: String, textCol: String,
      frameBytes: Int = 16, maxHamming: Int = 3): DataFrame = {
    require(frameBytes >= 1, s"frameSimHashNearDup: frameBytes must be >= 1, got $frameBytes")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // Native codegen'd signature — the HOF form (60-bit lambda × per-frame
    // aggregate, interpreted) priced this gate at 14 s of pure expression
    // interpretation at sf0.1; the one-pass byte loop is ~20× cheaper and
    // byte-identical (FrameSimHash60 parity-locked in Round17OpsSpec).
    val sig = df.filter(length(col(textCol)) > 0)
      .select(col(idCol),
        expr(s"graft_frame_simhash60($textCol, $frameBytes)").as("simhash"))
      .localCheckpoint()
    Dedup.simHashPairsFromSig(sig, idCol, maxHamming, Dedup.MaxBandDf)
  }

  private val q235: Q = (s, d) =>
    frameSimHashNearDup(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("id1"), col("id2"))

  val queries: Map[String, Q] = Map(
    "q70_binary_meta" -> q70,
    "q71_decode_features" -> q71,
    "q72_frame_table" -> q72,
    "q146_binary_source" -> q146,
    "q235_frame_simhash" -> q235,
  )

  val oracles: Map[String, String] = Map(
    // Replays frameSimHashNearDup end-to-end in exact integer algebra:
    // the q72 frame slicing, the corpus-standard md5 60-bit fold per
    // frame, the q52 bit-vote convention (s > 0 sets the bit), 4x15-bit
    // banding with the same maxBandDf = 1000 valve, bit_count(xor)
    // Hamming <= 3.
    "q235_frame_simhash" -> """
      WITH f0 AS (SELECT doc_id, text,
                         CAST(ceil(length(text) / 16.0) AS BIGINT) AS nf
                  FROM documents WHERE length(text) > 0),
      fr AS (SELECT doc_id,
                    substr(text, CAST(f * 16 + 1 AS INT), 16) AS fr
             FROM (SELECT doc_id, text, unnest(range(0, nf)) AS f FROM f0)),
      th AS (SELECT doc_id,
                    list_reduce(list_concat([CAST(0 AS BIGINT)],
                      list_transform(range(1, 16),
                        i -> CAST(strpos('0123456789abcdef',
                               substr(md5(fr), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                      (acc, c) -> acc * 16 + c) AS hv
             FROM fr),
      votes AS (SELECT doc_id, j,
                       sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
                GROUP BY doc_id, j),
      sig AS (SELECT doc_id,
                     CAST(sum(CASE WHEN s > 0
                                   THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                                   ELSE 0 END) AS BIGINT) AS simhash
              FROM votes GROUP BY doc_id),
      bands AS (SELECT doc_id, simhash, CAST(j AS INT) AS band,
                       (simhash >> (CAST(j AS INT) * 15)) & 32767 AS bv
                FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
      capped AS (SELECT * FROM
                   (SELECT *, count(*) OVER (PARTITION BY band, bv) AS df_
                    FROM bands)
                 WHERE df_ <= 1000),
      cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
                      x.simhash AS h1, y.simhash AS h2
               FROM capped x JOIN capped y
                 ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
      SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      ORDER BY id1, id2""",
    // The staged files hold exactly each document's utf-8 text bytes, so
    // file length and payload md5 must equal the table-side recomputation —
    // a byte-exact filesystem round-trip gate.
    "q146_binary_source" -> """
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
             md5(text) AS digest
      FROM documents ORDER BY doc_id""",
    // Replays q72: same 16-byte frame slicing, same additive mod-997
    // checksum over the frame's ascii codes.
    "q72_frame_table" -> """
      WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS frame_no
        FROM documents WHERE length(text) > 0),
      fr AS (SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
                    substr(text, CAST(frame_no * 16 + 1 AS INT), 16) AS frame
             FROM f)
      SELECT doc_id, frame_no,
             CAST(length(frame) AS INT) AS n_bytes,
             list_reduce(list_concat([CAST(0 AS BIGINT)],
               list_transform(range(1, length(frame) + 1),
                 i -> CAST(ascii(substr(frame, CAST(i AS INT), 1)) AS BIGINT))),
               (acc, x) -> (acc + x) % 997) AS checksum
      FROM fr ORDER BY doc_id, frame_no""",
    "q70_binary_meta" -> """
      WITH c AS (SELECT doc_id, text,
                        list_transform(range(1, length(text) + 1),
                          i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
                 FROM documents)
      SELECT doc_id,
             CAST(length(text) AS INT) AS n_bytes,
             list_reduce(list_concat([CAST(0 AS BIGINT)], codes),
                         (acc, x) -> (acc + x) % 997) AS checksum,
             CAST(len(list_filter(range(1, length(text) + 1), i -> i % 16 = 1)) AS INT)
               AS n_frames,
             CAST(list_sum(list_transform(list_filter(range(1, length(text) + 1),
                    i -> i % 16 = 1),
                    i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))) AS BIGINT)
               AS frame_sum
      FROM c ORDER BY doc_id""",
    // Replays MediaDecoder's stub path byte-for-byte over the ASCII
    // payload (text bytes never sniff as PNG): byte-sum
    // dims (sum % 640/480 + 1), 8-bin byte histogram (code >> 5) divided in
    // float32 then fixed at decimal(12,6), and the nearest-neighbor 32-byte
    // thumb sample (i*n/32 integer index) hex-encoded.
    "q71_decode_features" -> """
      WITH c AS (SELECT doc_id, text, length(text) AS n,
                        list_transform(range(1, length(text) + 1),
                          i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
                 FROM documents),
      f AS (SELECT doc_id, text, n,
                   COALESCE(list_sum(codes), 0) AS s,
                   list_transform(range(0, 8),
                     b -> len(list_filter(codes, x -> x // 32 = b))) AS cnts
            FROM c)
      SELECT doc_id,
             CAST(s % 640 + 1 AS INT) AS width,
             CAST(s % 480 + 1 AS INT) AS height,
             array_to_string(list_transform(cnts,
               k -> CAST(CAST(round(CAST(CAST(k AS FLOAT) / CAST(greatest(n, 1) AS FLOAT)
                         AS DOUBLE), 6) AS DECIMAL(12,6)) AS VARCHAR)), ',') AS features,
             CASE WHEN n = 0 THEN '' ELSE
               array_to_string(list_transform(range(0, 32),
                 i -> lpad(upper(to_hex(ascii(substr(text, CAST(i * n // 32 AS INT) + 1, 1)))), 2, '0')), '')
             END AS thumb
      FROM f ORDER BY doc_id""",
  )
}

/** Media decoder with one REAL codec path and an honest stub for the rest.
  *
  * PNG payloads (8-byte magic sniff) decode real pixels through the JVM's
  * built-in `javax.imageio` reader — true raster width/height and an 8-bin
  * REC-709 luminance histogram over the decoded pixels, i.e. the actual
  * image-pipeline feature shape. Formats the JVM ships no codec for
  * (JPEG-2000, video, audio — this container has no libjpeg/ffmpeg) fall
  * back to the deterministic byte-histogram fake below, so tests stay
  * stable and the stub surface is exactly "formats ImageIO cannot read".
  * The q71 fixture payloads are text bytes, never PNG, so the fixture
  * oracle exercises the stub path; MediaDecodeSpec drives the PNG path on
  * a synthesized image. Swapping in a JNI/onnx decoder for the remaining
  * formats changes one function, not the pipeline. */
final class MediaDecoder {
  final case class Decoded(width: Int, height: Int, features: Array[Float])

  private val PngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(payload: Array[Byte]): Boolean =
    payload.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(payload, 8), PngMagic)

  /** Real decode: raster dimensions + 8-bin luminance histogram
    * (REC-709 integer weights, bin = luma >> 5) normalized by pixel count.
    * Exact integer bin counts, float only at the final divide — same
    * discipline as the stub path. */
  private def decodePng(payload: Array[Byte]): Option[Decoded] = {
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case _: java.io.IOException => null }
    if (img == null) return None // corrupt/unsupported: caller falls back
    val (w, h) = (img.getWidth, img.getHeight)
    val counts = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff)
          + 722 * (rgb & 0xff)) / 10000
        counts(lum >> 5) += 1L
        x += 1
      }
      y += 1
    }
    val n = math.max(w.toLong * h, 1L)
    val hist = new Array[Float](8)
    var j = 0
    while (j < 8) { hist(j) = counts(j).toFloat / n.toFloat; j += 1 }
    Some(Decoded(w, h, hist))
  }

  def decode(payload: Array[Byte]): Decoded = {
    if (isPng(payload)) decodePng(payload) match {
      case Some(d) => return d
      case None => () // sniffed PNG but unreadable: deterministic fallback
    }
    // STUB path — byte-level stand-in for formats without a JVM codec.
    var sum = 0L
    // Exact integer bin counts; float only at the final divide — a float
    // accumulator saturates at ~2^24 increments per bin on large payloads
    // and would drift from the oracle's exact-count-then-divide arithmetic.
    val counts = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      sum += payload(i) & 0xff
      counts((payload(i) & 0xff) >> 5) += 1L
      i += 1
    }
    val n = math.max(payload.length, 1)
    val hist = new Array[Float](8)
    var j = 0
    while (j < 8) { hist(j) = counts(j).toFloat / n.toFloat; j += 1 }
    Decoded(width = (sum % 640).toInt + 1, height = (sum % 480).toInt + 1, features = hist)
  }

  /** Real thumbnail for decodable payloads: nearest-neighbor resample of
    * the DECODED raster to `w × h` 8-bit luminance bytes (row-major, the
    * same REC-709 weights as [[decode]]) — the actual image-resize step of
    * a multimodal pipeline. Non-decodable formats fall back to the
    * byte-level [[resize]] stub with the same `w·h` output size, so the
    * pipeline shape is format-independent. */
  def thumbnail(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"thumbnail: bad dims ${w}x$h")
    if (isPng(payload)) {
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
      if (img != null) {
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x * img.getWidth / w, y * img.getHeight / h)
            val lum = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff)
              + 722 * (rgb & 0xff)) / 10000
            out(y * w + x) = lum.toByte
            x += 1
          }
          y += 1
        }
        return out
      }
    }
    resize(payload, w * h)
  }

  /** STUB resize: nearest-neighbor downsample of the payload to `target`
    * bytes (a real decoder would resample pixels; the sampling arithmetic
    * and output shape are what the pipeline contract needs). */
  def resize(payload: Array[Byte], target: Int): Array[Byte] = {
    // ??? ← a real implementation would resample decoded pixels here.
    if (payload.isEmpty) return new Array[Byte](0)
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = payload((i.toLong * payload.length / target).toInt)
      i += 1
    }
    out
  }
}
