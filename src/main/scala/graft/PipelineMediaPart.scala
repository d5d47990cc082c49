package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** multimodal image/audio/video decode and media shards — the Media slice of the [[Pipeline]]
  * catalog (round-13 split: pure moves out of the former
  * single-file Pipeline.scala; composed back via
  * `object Pipeline extends ...`). */
private[graft] trait PipelineMediaPart extends Serializable { this: Pipeline.type =>
  /** Frame sampling over media payloads (the video → keyframe pattern):
    * one row fans out to its every-3rd 64-byte frame with per-frame
    * features — generator semantics inside the partition, so decode
    * runs where the bytes live (operators.Multimodal.frameSample). */
  private[graft] def frameSampleQ(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "text/plain", asciiBytes(id, t)) }
    graft.operators.Multimodal.frameSample(media, 3).toDF()
      .orderBy("media_id", "frame_idx")
  }
  /** Multimodal feature extraction: text bytes stand in for media payloads
    * (decode step stubbed — operators.Multimodal); byte plumbing, per-
    * partition batching and the feature schema are real. */
  private[graft] def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "text/plain", asciiBytes(id, t)) }
    graft.operators.Multimodal.extractFeatures(media)
      .toDF()
      .orderBy("media_id")
  }
  /** REAL-decoder image path: documents encode into actual 24-bit BMP
    * containers (dims derived from text length), and the extractor
    * parses the real BITMAPINFOHEADER back out — the oracle predicts
    * dims and container size arithmetically, so a header-layout bug
    * fails the hash check. */
  private[graft] def multimodalDecodeBmp(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        graft.operators.MediaRow(id, "image/bmp",
          graft.operators.Multimodal.encodeBmp(w, h, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"))
      .orderBy("media_id")
  }
  /** Perceptual image hash (aHash) over REAL decoded BMP containers —
    * the image-side near-dup primitive (pHash/aHash dedup is the
    * multimodal twin of minhash/simhash for text): 8×8
    * nearest-neighbor luminance samples, mean-thresholded into a 64-bit
    * signature, emitted as two 32-bit halves (bit 63 in one BIGINT
    * would wrap signed on both engines). The Spark side walks the real
    * container (magic, pixel-array offset and dims read from the
    * BITMAPINFOHEADER it just encoded; samples fetched from the actual
    * pixel bytes, rows in file order); the oracle reproduces every
    * sampled byte arithmetically from the text fixture, so a header,
    * stride, or sampling bug fails the hash check. Luminance is the
    * integer mean of the three channels; the threshold compare
    * `64·lum > Σlum` stays in exact integers.
    *
    * 100 TB shape: pure map over the media scan (constant 64 samples
    * per image regardless of resolution), hash-equality or band joins
    * downstream — never pixel joins. */
  private[graft] def imageAhash(s: SparkSession, dir: String): DataFrame =
    ahashRows(s, dir).orderBy("media_id")
  /** The unordered aHash table (media_id, dims, hi/lo halves) shared by
    * the per-image readout and the banded near-dup join. */
  private[graft] def ahashRows(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        val bmp = graft.operators.Multimodal.encodeBmp(w, h,
          asciiBytes(id, t))
        val bb = java.nio.ByteBuffer.wrap(bmp)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte, s"bad BMP $id")
        val off = bb.getInt(10)
        val dw = bb.getInt(18)
        val dh = math.abs(bb.getInt(22))
        val rowSize = ((dw * 3 + 3) / 4) * 4
        val lum = Array.tabulate(64) { k =>
          val x = (k % 8) * dw / 8
          val y = (k / 8) * dh / 8
          val base = off + y * rowSize + x * 3
          ((bmp(base) & 0xff) + (bmp(base + 1) & 0xff) +
            (bmp(base + 2) & 0xff)) / 3
        }
        val tot = lum.map(_.toLong).sum
        var hi = 0L; var lo = 0L
        var k = 0
        while (k < 64) {
          val bit = if (64L * lum(k) > tot) 1L else 0L
          if (k < 32) lo |= bit << k else hi |= bit << (k - 32)
          k += 1
        }
        (id, dw, dh, hi, lo)
      }
      .toDF("media_id", "decoded_w", "decoded_h", "ahash_hi", "ahash_lo")
  }
  /** Shared oracle CTE chain ending in
    * `hx(media_id, decoded_w, decoded_h, ahash_hi, ahash_lo)` — the
    * DuckDB twin of [[ahashRows]]: sampled pixel byte c of grid cell k
    * is text byte (y·rowSize + x·3 + c) mod len, with x = (k%8)·w//8,
    * y = (k//8)·h//8, rowSize = 4-padded 3·w. */
  private[graft] def ahashOracleCtes: String = {
    def lumK: String =
      """(ascii(substr(text, CAST(((((k // 8) * h // 8) * (((w * 3 + 3) // 4) * 4)
        |      + ((k % 8) * w // 8) * 3 + 0)) % len AS INT) + 1, 1))
        | + ascii(substr(text, CAST(((((k // 8) * h // 8) * (((w * 3 + 3) // 4) * 4)
        |      + ((k % 8) * w // 8) * 3 + 1)) % len AS INT) + 1, 1))
        | + ascii(substr(text, CAST(((((k // 8) * h // 8) * (((w * 3 + 3) // 4) * 4)
        |      + ((k % 8) * w // 8) * 3 + 2)) % len AS INT) + 1, 1))) // 3"""
        .stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len,
       |    1 + length(text) % 32 AS w,
       |    1 + (length(text) // 32) % 32 AS h
       |  FROM documents WHERE length(text) = strlen(text) AND length(text) > 0),
       |p AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, 64), k -> $lumK) AS lum
       |  FROM d),
       |s AS (
       |  SELECT doc_id, w, h, lum,
       |    CAST(list_sum(lum) AS BIGINT) AS tot FROM p),
       |b AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, 64), k ->
       |      CASE WHEN 64 * lum[CAST(k AS INT) + 1] > tot
       |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bits
       |  FROM s),
       |hx AS (
       |  SELECT doc_id AS media_id, CAST(w AS INT) AS decoded_w,
       |    CAST(h AS INT) AS decoded_h,
       |    CAST(list_sum(list_transform(range(32, 64), k ->
       |      bits[CAST(k AS INT) + 1] * (CAST(1 AS BIGINT) << (k - 32))))
       |      AS BIGINT) AS ahash_hi,
       |    CAST(list_sum(list_transform(range(0, 32), k ->
       |      bits[CAST(k AS INT) + 1] * (CAST(1 AS BIGINT) << k)))
       |      AS BIGINT) AS ahash_lo
       |  FROM b)""".stripMargin
  }
  /** Banded aHash near-dup — the image twin of [[minhashLsh]]'s
    * band-bucket candidate generation: the 64-bit signature splits into
    * four 16-bit bands; images sharing ANY band value become
    * candidates (a shuffle on (band, value) buckets — sub-quadratic by
    * construction, candidates ∝ Σ C(bucket, 2), never C(N, 2)), and
    * each candidate pair is verified by exact Hamming distance
    * (`bit_count(xor)` on the two halves — codegen'd integer ops). The
    * top-[[AhashPanelTop]] closest pairs ship as the review panel via
    * TakeOrdered, never a global sort. On this corpus the signatures
    * are effectively random (distinct images), so the panel documents
    * the EXPECTED collision background — distances cluster at 32±4 —
    * exactly what a curator needs to see before trusting a threshold. */
  /** The production 4×16-bit band candidate pairs with their
    * signatures, deduped on bare id pairs. PERSISTED per (session,
    * dir): the near-dup panel and the recall readout both ride it. */
  private[graft] def ahashCandPairs(s: SparkSession, dir: String): DataFrame =
    ScanCache.get(s, s"ahash-cands:$dir") {
      val h = ahashRows(s, dir).selectExpr("media_id", "ahash_hi", "ahash_lo")
      val bands = h.select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
        posexplode(array(
          expr("ahash_lo & 65535"), expr("shiftright(ahash_lo, 16) & 65535"),
          expr("ahash_hi & 65535"), expr("shiftright(ahash_hi, 16) & 65535")))
          .as(Seq("band", "bv")))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          col("a.ahash_hi").as("hi_a"), col("a.ahash_lo").as("lo_a"),
          col("b.ahash_hi").as("hi_b"), col("b.ahash_lo").as("lo_b"))
        .distinct()
    }
  private[graft] def imageNeardupAhash(s: SparkSession, dir: String): DataFrame =
    ahashCandPairs(s, dir)
      .selectExpr("id_a", "id_b",
        "CAST(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) AS BIGINT) " +
          "AS hamming")
      .orderBy(asc("hamming"), asc("id_a"), asc("id_b"))
      .limit(AhashPanelTop)
  /** Analytic recall of the 4×16 banding per Hamming distance d, under
    * uniform random placement of the d differing bits, in exact ppm:
    * P(≥1 band clean) = Σ_{k=1..4} (−1)^(k+1)·C(4,k)·C(64−16k,d)/C(64,d)
    * (inclusion–exclusion over clean-band subsets). Computed once in
    * BigInt rationals and embedded as the same literal CASE table in
    * BOTH engines, so no runtime arithmetic can diverge. */
  private[graft] lazy val ahashRecallCase: String = {
    def comb(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0 until k).foldLeft(BigInt(1))((a, i) => a * (n - i) / (i + 1))
    val ppm = (0 to AhashRecallRadius).map { d =>
      val den = comb(64, d)
      val num = (1 to 4).foldLeft(BigInt(0)) { (a, k) =>
        val t = comb(4, k) * comb(64 - 16 * k, d)
        if (k % 2 == 1) a + t else a - t
      }
      ((num * 1000000 + den / 2) / den).toLong
    }
    "CASE hamming " + ppm.zipWithIndex.map { case (p, d) =>
      s"WHEN $d THEN CAST($p AS BIGINT) " }.mkString +
      "ELSE CAST(0 AS BIGINT) END"
  }
  /** MEASURED recall of the banded image near-dup — the
    * [[minhashRecall]] twin for the multimodal family: how many TRUE
    * close pairs (exact Hamming ≤ [[AhashRecallRadius]]) does the
    * production 4×16 banding actually surface? Truth candidates come
    * from a FINER 8×8-bit banding, which pigeonhole makes complete at
    * this radius — a band-bucket shuffle, never an all-pairs join
    * (candidates ∝ Σ C(bucket, 2); at corpus scale 8-bit buckets run
    * hot, so a production measurement would sample the table first —
    * the minhash_recall df-cap argument). `expected_recall` is the
    * inclusion–exclusion analytic averaged over true pairs, embedded
    * as an identical literal table in both engines
    * ([[ahashRecallCase]]); the measured number sits beside it exactly
    * as minhash_recall's does. */
  private[graft] def imageNeardupRecall(s: SparkSession, dir: String): DataFrame = {
    val h = ahashRows(s, dir).selectExpr("media_id", "ahash_hi", "ahash_lo")
    val tBands = h.select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
      posexplode(array((0 until 8).map { b =>
        if (b < 4) expr(s"shiftright(ahash_lo, ${8 * b}) & 255")
        else expr(s"shiftright(ahash_hi, ${8 * (b - 4)}) & 255")
      }: _*)).as(Seq("band", "bv")))
    val truth = tBands.as("a").join(tBands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash_hi").as("hi_a"), col("a.ahash_lo").as("lo_a"),
        col("b.ahash_hi").as("hi_b"), col("b.ahash_lo").as("lo_b"))
      .distinct()
      .selectExpr("id_a", "id_b",
        "CAST(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) AS BIGINT) " +
          "AS hamming")
      .filter(col("hamming") <= AhashRecallRadius)
    val found = ahashCandPairs(s, dir).select("id_a", "id_b")
      .withColumn("hit", lit(1L))
    truth.join(found, Seq("id_a", "id_b"), "left")
      .selectExpr("hamming", "coalesce(hit, CAST(0 AS BIGINT)) AS hit",
        s"$ahashRecallCase AS p_ppm")
      .agg(count(lit(1)).as("n_true"), sum("hit").as("n_caught"),
        sum("p_ppm").as("sp"))
      // greatest(n_true, 1): an empty truth set reads 0/0 → 0.0
      // deterministically on both engines, never NaN
      .selectExpr("n_true", "coalesce(n_caught, CAST(0 AS BIGINT)) AS n_caught",
        "round(coalesce(n_caught, CAST(0 AS BIGINT)) " +
          "/ CAST(greatest(n_true, 1) AS DOUBLE), 4) AS recall",
        "round(CAST(coalesce(sp, CAST(0 AS BIGINT)) AS DOUBLE) " +
          "/ greatest(n_true, 1) / 1000000.0, 4) AS expected_recall")
  }
  /** REAL-decoder compressed-image path: documents encode into real
    * JPEG containers (SOI/APP0/COM/SOF0/SOS/EOI marker stream; the COM
    * segment carries the text bytes, so the SOF sits after a
    * variable-length segment) and the extractor walks the marker list to
    * the frame header — JPEG DIMENSIONS without a codec library. The
    * oracle predicts dims and container size arithmetically, so a
    * marker-walk bug fails the hash check. */
  private[graft] def multimodalDecodeJpeg(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        graft.operators.MediaRow(id, "image/jpeg",
          graft.operators.Multimodal.encodeJpegHeader(w, h, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"))
      .orderBy("media_id")
  }
  /** REAL-decoder PNG path: documents encode into real PNG containers
    * (signature → IHDR with true CRC32s → a payload-carrying ancillary
    * chunk → IEND) and the extractor validates the signature + first
    * chunk and reads the big-endian IHDR dims. Oracle predicts dims and
    * the 57 + len container size arithmetically. */
  private[graft] def multimodalDecodePng(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        graft.operators.MediaRow(id, "image/png",
          graft.operators.Multimodal.encodePng(w, h, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"))
      .orderBy("media_id")
  }
  /** REAL-decoder GIF path: documents encode into real GIF89a streams
    * (logical screen descriptor + a comment extension carrying the text
    * in ≤255-byte sub-blocks) and the extractor reads the little-endian
    * screen dims. Container size is 17 + len + ceil(len/255) — the
    * sub-block framing makes the size prediction non-trivial on both
    * sides. */
  private[graft] def multimodalDecodeGif(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        graft.operators.MediaRow(id, "image/gif",
          graft.operators.Multimodal.encodeGif(w, h, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"))
      .orderBy("media_id")
  }
  /** FULL-pixel-decode path: documents encode into real DEFLATE-
    * compressed truecolor PNGs whose scanlines cycle through all five
    * PNG filter types, and the extractor actually inflates (JDK
    * java.util.zip) and defilters to recover the pixels. The oracle
    * predicts the per-channel sums from first principles (pixel bytes
    * are the text bytes cycled over w×3×h positions), so any filter or
    * inflate bug fails the hash check — the container size itself is
    * compression-dependent and deliberately NOT part of the contract. */
  private[graft] def multimodalDecodePngPixels(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        graft.operators.MediaRow(id, "image/png",
          graft.operators.Multimodal.encodePngPixels(w, h, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** Adam7-INTERLACED PNG decode path: the same raster content as
    * multimodal_decode_png_pixels, emitted as the seven progressive
    * passes — the decoder must walk the pass geometry, defilter each
    * sub-image independently (filters reference only the pass's own
    * scanlines) and scatter pixels back into the full raster. The
    * oracle is IDENTICAL to the sequential query's: the decoded
    * raster must not depend on the interlace layout. ImageIO
    * cross-validates exactness (ImageIoDifferentialSpec). */
  private[graft] def multimodalDecodePngAdam7(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        graft.operators.MediaRow(id, "image/png",
          graft.operators.Multimodal.encodePngPixelsAdam7(w, h,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** FULL GIF pixel decode path: documents become real GIF89a images —
    * 256-entry global color table on three different affine ramps
    * (index i → (i, 2i mod 256, 3i mod 256)), indexed pixels = the text
    * bytes cycled, LZW-compressed by a REAL greedy encoder — and the
    * extractor runs the full GIF LZW decoder (variable-width codes,
    * table growth, KwKwK) plus the palette map. The oracle predicts the
    * per-channel sums from first principles through the palette ramps,
    * so an LZW or color-table bug fails the hash check; a grayscale
    * table would hide a channel swap, the ramps don't. */
  private[graft] def multimodalDecodeGifPixels(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        graft.operators.MediaRow(id, "image/gif",
          graft.operators.Multimodal.encodeGifPixels(w, h, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** FULL TIFF pixel decode path: documents become real baseline
    * Compression=1 RGB TIFFs (IFD with the nine baseline tags, external
    * value arrays, 4-row strips so every fixture beyond 4 rows walks
    * multiple StripOffsets/ByteCounts) — ENDIANNESS ALTERNATES by
    * document parity — and the extractor re-walks the IFD, validates
    * the format tags and reassembles the strips. Pixel bytes cycle the
    * text over (3k+c) positions, the PNG-pixels convention, so the same
    * first-principles channel-sum oracle applies. */
  private[graft] def multimodalDecodeTiffPixels(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        graft.operators.MediaRow(id, "image/tiff",
          graft.operators.Multimodal.encodeTiffPixels(w, h, id % 2 == 0,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** FULL JPEG pixel decode path: documents become real interleaved
    * baseline JPEGs (SOF0, 4:4:4, quantizer 1, generated canonical
    * Huffman tables) whose Y blocks are the text bytes as per-8×8-block
    * constants, Cb=128, Cr=133 — the operators.Jpeg scaladoc proves the
    * round trip is bit-exact with no FP rounding ties, so the oracle
    * predicts per-channel sums as 64·Σ(v+7 | v−4 | v) in pure integer
    * arithmetic while the decoder runs the whole baseline pipeline:
    * marker walk, DHT canonical Huffman, DC prediction, byte
    * unstuffing, dequant, IDCT, BT.601 color convert. A Huffman, IDCT,
    * predictor or channel-order bug fails the hash check. */
  private[graft] def multimodalDecodeJpegPixels(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    // spread before the full encode+Huffman-decode+IDCT chain (the
    // videoFrameSample note applies)
    val media = asciiDocs(s, dir).repartition(col("doc_id"))
      .map { case (id, t) =>
        val bw = 1 + (t.length % 8)
        val bh = 1 + ((t.length / 8) % 8)
        graft.operators.MediaRow(id, "image/jpeg",
          graft.operators.Jpeg.encodePixels(bw, bh, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** FULL PROGRESSIVE JPEG pixel decode path: the same constant-block
    * color construction as the baseline twin but re-encoded as an
    * 8-scan SOF2 stream — DC quantizer 8 keeps live low bits flowing
    * through TWO successive-approximation DC refinement scans, and the
    * split AC bands decode as spectral-selection EOBn runs. Decoded
    * pixels are exactly (v+7, v−4, v), so the oracle stays pure
    * integer arithmetic while the decoder exercises the whole
    * progressive path: multi-scan coefficient accumulation, DC
    * first/refine, AC first with EOBRUN, dequant, IDCT, color
    * convert. Dims run on /6 arithmetic so the two JPEG fixtures
    * don't share shapes. */
  private[graft] def multimodalDecodeJpegProgressive(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    // spread before the multi-scan progressive decode (the
    // videoFrameSample note applies)
    val media = asciiDocs(s, dir).repartition(col("doc_id"))
      .map { case (id, t) =>
        val bw = 1 + (t.length % 6)
        val bh = 1 + ((t.length / 6) % 6)
        graft.operators.MediaRow(id, "image/jpeg",
          graft.operators.Jpeg.encodeProgressivePixels(bw, bh,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** REAL-decoder compressed-audio path: documents encode into valid
    * MPEG1 Layer III frame streams (1 + len % 16 frames at
    * 128 kbps / 44100 Hz; bodies carry the text bytes) and the
    * extractor walks the frame headers — stream format, frame count
    * and exact integer duration without a codec library. The oracle
    * predicts every field arithmetically (frame length 417, duration
    * frames × 1152000 // 44100). */
  private[graft] def multimodalDecodeMp3(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/mpeg",
          graft.operators.Multimodal.encodeMp3(
            1 + (t.length % 16), asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractMp3Features(media).toDF()
      .orderBy("media_id")
  }
  /** REAL-decoder TIFF path: documents encode into valid baseline TIFF
    * (byte-order mark, magic 42, one IFD with LONG-typed dimension
    * tags) — ENDIANNESS ALTERNATES by document parity, so every corpus
    * pass exercises both II and MM reads of the same IFD walk. */
  private[graft] def multimodalDecodeTiff(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        graft.operators.MediaRow(id, "image/tiff",
          graft.operators.Multimodal.encodeTiff(w, h, id % 2 == 0,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"))
      .orderBy("media_id")
  }
  /** REAL-decoder video-container path: documents encode into valid
    * ISO-BMFF (MP4) structures — ftyp → moov(mvhd + trak(tkhd)) →
    * mdat carrying the text — and the extractor walks the box tree for
    * the movie facts: mvhd timescale/duration, tkhd 16.16 fixed-point
    * dimensions. The oracle predicts every field arithmetically
    * (container size 240 + len; duration len × 40 ms at timescale
    * 1000). */
  private[graft] def multimodalDecodeMp4(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        graft.operators.MediaRow(id, "video/mp4",
          graft.operators.Multimodal.encodeMp4(w, h, 1000, t.length * 40,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractMp4Features(media).toDF()
      .orderBy("media_id")
  }
  /** REAL-decoder audio path: documents encode into actual RIFF/WAVE
    * 8-bit mono PCM (one sample per char), and the extractor walks the
    * chunk list and folds whole-stream amplitude statistics. */
  private[graft] def multimodalDecodeWav(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/wav",
          graft.operators.Multimodal.encodeWavPcm8(8000, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractAudioFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** FULL µ-law sample decode path: documents become companded G.711
    * WAVs (format code 7, the text bytes as the code stream) and the
    * extractor expands every byte to linear PCM through the real
    * complement/bias/segment-shift formula. The expansion is closed-
    * form per byte, so the oracle recomputes the identical arithmetic
    * in DuckDB — exact signed sum, abs sum and peak, no tolerance. */
  private[graft] def multimodalDecodeUlaw(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/basic",
          graft.operators.Multimodal.encodeWavG711(8000, aLaw = false,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractG711Features(media).toDF()
      .orderBy("media_id")
  }
  /** FULL A-law sample decode path: the G.711 twin with format code 6
    * and the even-bit-inversion segment expansion. */
  private[graft] def multimodalDecodeAlaw(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/basic",
          graft.operators.Multimodal.encodeWavG711(8000, aLaw = true,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractG711Features(media).toDF()
      .orderBy("media_id")
  }
  /** REAL image resize path: PNG pixel fixtures → full pixel decode →
    * 2×2 floor-average box downsample → PNG re-encode → decode AGAIN
    * for the feature row, so the query proves the whole resize round
    * trip (two codec passes bracketing the kernel). Images without a
    * complete 2×2 block drop out on both engines. The oracle recomputes
    * every output pixel from first principles: the four cycled text
    * bytes of each box, floor-averaged in integer arithmetic. */
  private[graft] def imageResizeBox(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        graft.operators.MediaRow(id, "image/png",
          graft.operators.Multimodal.encodePngPixels(w, h, asciiBytes(id, t)))
      }
    val resized = graft.operators.Multimodal.resizeBox(media, 2)
    graft.operators.Multimodal.extractPixelFeatures(resized).toDF()
      .orderBy("media_id")
  }
  /** TYPED METADATA path (images): fixtures carry a real EXIF APP1
    * segment (Exif header + embedded TIFF IFD with the Orientation
    * SHORT) and the extractor walks marker → APP1 → IFD under either
    * byte order. Orientation drives mirror/rotate decisions in any
    * image ingest; the oracle predicts it arithmetically. */
  private[graft] def multimodalExifOrientation(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        val bytes = graft.operators.Multimodal.encodeJpegExif(
          w, h, 1 + (t.length % 8), asciiBytes(id, t))
        val (dw, dh) = graft.operators.Multimodal.decodeJpegDims(bytes)
          .getOrElse((-1, -1))
        val ori = graft.operators.Multimodal.jpegExifOrientation(bytes)
          .getOrElse(-1)
        (id, ori, dw, dh)
      }
      .toDF("media_id", "orientation", "decoded_w", "decoded_h")
      .orderBy("media_id")
  }
  /** TYPED METADATA path (audio): fixtures prepend a real ID3v2.3 block
    * (syncsafe size, ISO-8859-1 T-frames) to a real MPEG frame stream;
    * the extractor walks the frame list for TIT2/TPE1 while the
    * EXISTING mp3 frame walk still sees the audio through the ID3 skip
    * — one fixture, two independent decoders. */
  private[graft] def multimodalId3Tags(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val title = t.substring(0, math.min(16, t.length))
        val artist = t.substring(math.max(0, t.length - 8))
        val bytes = graft.operators.Multimodal.encodeId3v2(
          Seq("TIT2" -> title, "TPE1" -> artist),
          graft.operators.Multimodal.encodeMp3(
            1 + (t.length % 16), asciiBytes(id, t)))
        val tags = graft.operators.Multimodal.id3v2TextFrames(bytes)
        val frames = graft.operators.Multimodal.mp3Stats(bytes)
          .map(_.nFrames).getOrElse(-1)
        (id, tags.getOrElse("TIT2", ""), tags.getOrElse("TPE1", ""), frames)
      }
      .toDF("media_id", "title", "artist", "n_frames")
      .orderBy("media_id")
  }
  /** VAD-style activity gate: 256-sample frame energies over decoded
    * PCM, integer activity rule (mean |amplitude| > 20), so the oracle
    * reproduces the gate exactly. The corpus-filter shape: a pure map
    * emitting per-document activity stats a training pipeline keys
    * retention on. */
  /** Pitch detection over REAL WAV containers
    * (operators/Multimodal.extractPitchAutocorr): each doc becomes a
    * 128-sample 8-bit PCM square wave of period 2·(1 + len mod 8),
    * and the extractor must recover that period as the smallest even
    * lag with PERFECT integer autocorrelation (exact: a square wave
    * is lag-invariant iff the lag is a multiple of its period). The
    * oracle predicts the period and the correlation mass at it in
    * closed form. Pure map pass. */
  private[graft] def audioPitchAutocorr(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = Tables.documents(s, dir)
      .selectExpr("doc_id", "length(text) AS len").as[(Long, Long)]
      .map { case (id, len) =>
        val q = (1 + len % 8).toInt
        val pcm = Array.tabulate(128)(i =>
          (if ((i / q) % 2 == 0) 228 else 28).toByte)
        graft.operators.MediaRow(id, "audio/wav",
          graft.operators.Multimodal.encodeWavPcm8(8000, pcm))
      }
    graft.operators.Multimodal.extractPitchAutocorr(media, 16).toDF()
      .orderBy("media_id")
  }
  private[graft] def audioFrameEnergy(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/wav",
          graft.operators.Multimodal.encodeWavPcm8(8000, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFrameEnergy(media, 256).toDF()
      .orderBy("media_id")
  }
  /** REAL FLAC round trip: documents become 16-bit mono PCM (sample
    * i = (byte−79)·400, exercising negative values and both FIXED
    * predictors and Rice parameters across docs), encode to a real
    * .flac stream (STREAMINFO + fixed-blocksize frames, CRC-8/16),
    * and decode back through the full frame walk. The codec is
    * LOSSLESS, so the oracle computes every readout straight from the
    * text — any bit-layout, predictor, Rice or CRC bug breaks the
    * round trip and fails the hash. One map pass per row. */
  private[graft] def multimodalDecodeFlac(s: SparkSession,
                                   dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir).repartition(col("doc_id"))
      .map { case (id, t) =>
        val b = asciiBytes(id, t)
        val samples = Array.tabulate(b.length)(i => ((b(i) & 0xff) - 79) * 400)
        val flac = graft.operators.Flac.encode(8000, samples)
        graft.operators.Flac.decode(flac) match {
          case Some((info, out)) =>
            (id, info.sampleRate, out.length.toLong,
              out.map(_.toLong).sum,
              if (out.isEmpty) 0L else out.min.toLong,
              if (out.isEmpty) 0L else out.max.toLong)
          case None => (id, -1, -1L, -1L, -1L, -1L)
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "sum_s", "min_s",
        "max_s")
      .orderBy("media_id")
  }
  /** Composed MEDIA-INGEST DAG — the multimodal counterpart of
    * web_ingest_dag: docs become REAL media files (PNG / GIF /
    * TIFF-LZW / WAV rotating by id mod 4), pack into WebDataset-style
    * shards of 8 under a compression wrapper rotating by SHARD
    * (`.tgz` / `.tar.lz4` / `.tar.sz` — [[mediaWrap]]), and ONE pass
    * walks everything back — magic-byte unwrap
    * ([[unwrapMediaShard]]) → checksum-verified tar walk → MAGIC-BYTE sniff
    * (trust the bytes, not the extension) → kind-dispatched FULL
    * decode (PNG defilter, GIF LZW+palette, TIFF LZW, WAV PCM) →
    * per-doc keep verdict (decoded ∧ ≥ 64 pixels-or-samples). The
    * oracle recomputes the whole chain analytically per kind, so a
    * container, sniff or codec bug anywhere flips sums or verdicts
    * and fails the hash. Archives build and decode inside one
    * flatMapGroups — only readout rows shuffle. */
  private[graft] def mediaIngestDag(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => mediaEntry(id, t) }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
        val shard = mediaWrap(sid,
          graft.operators.Tar.buildArchive(it.toSeq.sortBy(_._2).map(_._3)))
        mediaShardReadout(unwrapMediaShard(shard))
      }
      .toDF("media_id", "ext", "sniffed", "units", "sum_r", "sum_g",
        "sum_b", "keep")
      .orderBy("media_id")
  }
  /** Shard wrapper rotation: gzip / LZ4 frame / Snappy framing by
    * shard id — the three compression wrappers real WebDataset-style
    * corpora ship under. The readout facts are wrapper-independent,
    * so the SAME oracle pins all three codecs as jointly transparent
    * end-to-end (wrap here, sniff+unwrap in [[unwrapMediaShard]]). */
  private[graft] def mediaWrap(sid: Long, tar: Array[Byte]): Array[Byte] =
    (sid % 6) match {
      case 0 => graft.operators.Tar.gzipArchive(tar)
      case 1 => graft.operators.Tar.lz4Archive(tar)
      case 2 => graft.operators.Tar.snappyArchive(tar)
      case 3 => graft.operators.Tar.bzip2Archive(tar)
      // the zstd/xz wraps compress with the PLATFORM libraries so the
      // unwrap exercises our decoders on real entropy-coded streams
      case 4 => com.github.luben.zstd.Zstd.compress(tar, 3)
      case _ =>
        val buf = new java.io.ByteArrayOutputStream()
        // shard-sized dict — the tarParseXz allocation lesson
        val opt = new org.tukaani.xz.LZMA2Options(3)
        opt.setDictSize(math.max(1 << 16,
          java.lang.Integer.highestOneBit(math.max(tar.length - 1, 1)) * 2))
        val z = new org.tukaani.xz.XZOutputStream(buf, opt)
        z.write(tar); z.finish(); z.close()
        buf.toByteArray
    }
  /** The wrapper extension [[mediaWrap]] implies (fixture naming). */
  private[graft] def mediaWrapExt(sid: Long): String =
    (sid % 6) match {
      case 0 => "tgz"
      case 1 => "tar.lz4"
      case 2 => "tar.sz"
      case 3 => "tar.bz2"
      case 4 => "tar.zst"
      case _ => "tar.xz"
    }
  /** Magic-byte sniff + unwrap of one media shard back to plain tar
    * bytes; empty on a corrupt wrapper (the walk then yields no
    * entries — drop, never invent). */
  private[graft] def unwrapMediaShard(bytes: Array[Byte]): Array[Byte] = {
    val T = graft.operators.Tar
    if (T.isGzip(bytes)) T.gunzip(bytes).getOrElse(Array.emptyByteArray)
    else if (graft.operators.Lz4.isLz4(bytes))
      graft.operators.Lz4.frameDecompress(bytes)
        .getOrElse(Array.emptyByteArray)
    else if (graft.operators.SnappyCodec.isFramed(bytes))
      graft.operators.SnappyCodec.frameDecompress(bytes)
        .getOrElse(Array.emptyByteArray)
    else if (graft.operators.Bzip2.isBzip2(bytes))
      graft.operators.Bzip2.decode(bytes).getOrElse(Array.emptyByteArray)
    else if (graft.operators.Zstd.isZstd(bytes))
      graft.operators.Zstd.decode(bytes).getOrElse(Array.emptyByteArray)
    else if (graft.operators.Xz.isXz(bytes))
      graft.operators.Xz.decode(bytes).getOrElse(Array.emptyByteArray)
    else bytes
  }
  /** The sniff → decode → verdict readout over one PLAIN media shard,
    * shared by [[mediaIngestDag]] and [[mediaIngestFiles]]. */
  private[graft] def mediaShardReadout(plain: Array[Byte])
      : Seq[(Long, String, String, Long, Long, Long, Long, Long)] = {
    val M = graft.operators.Multimodal
    graft.operators.Tar.parse(plain).map { e =>
      val docId = e.name.takeWhile(_ != '.').toLong
      val ext = e.name.dropWhile(_ != '.').drop(1)
      val bytes = java.util.Arrays.copyOfRange(plain, e.dataOff,
        e.dataOff + e.size.toInt)
      val sniffed = M.sniffKind(bytes)
      sniffed match {
        case "image/png" | "image/gif" | "image/tiff" =>
          M.decodePixels(sniffed, bytes) match {
            case Some((w, h, px)) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < px.length) {
                sr += px(i) & 0xff; sg += px(i + 1) & 0xff
                sb += px(i + 2) & 0xff
                i += 3
              }
              (docId, ext, sniffed, w.toLong * h, sr, sg, sb,
                if (w.toLong * h >= 64L) 1L else 0L)
            case None => (docId, ext, sniffed, -1L, -1L, -1L, -1L, 0L)
          }
        case "audio/wav" =>
          M.wavStats(bytes) match {
            case Some(wi) =>
              (docId, ext, sniffed, wi.nSamples, wi.sumAbs, 0L, 0L,
                if (wi.nSamples >= 64L) 1L else 0L)
            case None => (docId, ext, sniffed, -1L, -1L, -1L, -1L, 0L)
          }
        case _ => (docId, ext, sniffed, -1L, -1L, -1L, -1L, 0L)
      }
    }
  }
  /** One media entry's tar bytes (the mediaIngestDag construction),
    * shared with the `.tgz`-file fixture. */
  private[graft] def mediaEntry(id: Long, t: String): (Long, Long, Array[Byte]) = {
    val b = asciiBytes(id, t)
    val w = 1 + (t.length % 16)
    val h = 1 + ((t.length / 16) % 16)
    val M = graft.operators.Multimodal
    val (ext, bytes) = (id % 4) match {
      case 0 => ("png", M.encodePngPixels(w, h,
        Array.tabulate(w * h * 3)(k => b(k % b.length))))
      case 1 => ("gif", M.encodeGifPixels(w, h,
        Array.tabulate(w * h)(k => b(k % b.length))))
      case 2 => ("tiff", M.encodeTiffPixelsLzw(w, h, id % 2 == 0,
        Array.tabulate(w * h * 3)(k => b(k % b.length))))
      case _ => ("wav", M.encodeWavPcm8(8000, b))
    }
    (id / 8, id, graft.operators.Tar.buildEntry(s"$id.$ext", bytes))
  }
  /** [[mediaIngestDag]] through REAL `.tgz` shard FILES: the fixture
    * writes the identical shards from the executors (the
    * warc/tar_parse_files pattern), the query reads them back through
    * `binaryFile` → gunzip → the shared readout — the file AND
    * compression layers must be transparent, so the oracle is
    * IDENTICAL to media_ingest_dag. */
  /** Builds (idempotently) and returns the `.tgz` media-shard fixture
    * directory — shared with the streaming parity spec. */
  private[graft] def mediaFixtureRoot(s: SparkSession, dir: String): String = {
    val spark = s
    import spark.implicits._
    // tag v3: six-way wrapper rotation (gzip/lz4/snappy/bzip2/zstd/xz
    // by shard) — a new tag regenerates fixtures built before it
    formatFixtureDir(dir, "mediashard3", "documents") { out =>
      asciiDocs(s, dir)
        .map { case (id, t) => mediaEntry(id, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
          val shard = mediaWrap(sid, graft.operators.Tar.buildArchive(
            it.toSeq.sortBy(_._2).map(_._3)))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.${mediaWrapExt(sid)}"), shard)
          sid
        }
        .count(): Unit
    }
  }
  /** gunzip + the shared media readout over `binaryFile` rows — the
    * stage both the batch file query and its streaming twin run. */
  private[graft] def parseMediaShardRows(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        mediaShardReadout(unwrapMediaShard(bytes)) }
      .toDF("media_id", "ext", "sniffed", "units", "sum_r", "sum_g",
        "sum_b", "keep")
  }
  private[graft] def mediaIngestFiles(s: SparkSession, dir: String): DataFrame = {
    val root = mediaFixtureRoot(s, dir)
    parseMediaShardRows(
      s.read.format("binaryFile").option("pathGlobFilter", "shard-*").load(root)
        .repartition(col("path"))) // spread the packed small-file split
      .orderBy("media_id")
  }
  /** Opus METADATA extraction through the full Ogg stack — the
    * license/language metadata read a curation pipeline runs before
    * admitting audio (RFC 7845: the OpusHead identification packet
    * and the OpusTags Vorbis-comment packet are the first two packets
    * of the stream): each doc builds a real Ogg whose head/tags
    * derive from the doc (a LICENSE=CC0 tag on ids ≡ 0 mod 3 — the
    * filterable-license case), plus opaque audio packets, and the
    * readout goes CRC-verified pages → packet reassembly → header
    * parses. Closed-form oracle; a framing or field-layout bug
    * anywhere flips the facts. */
  private[graft] def oggOpusMeta(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val O = graft.operators.Ogg
        val b = asciiBytes(id, t)
        val head = O.buildOpusHead(1 + (id % 2).toInt, 312,
          if (t.length % 2 == 0) 48000L else 24000L, 0)
        val title = t.substring(0, math.min(8, t.length))
        val tags = Seq(s"LANGUAGE=l${t.length % 3}", s"TITLE=$title") ++
          (if (id % 3 == 0) Seq("LICENSE=CC0") else Nil)
        val opusTags = O.buildOpusTags("graft 1.0", tags)
        val audio = (0 until 2).map(i =>
          Array.tabulate(40 + (t.length % 50))(k => b((k + i) % b.length)))
        val ogg = O.build(id, Seq(head, opusTags) ++ audio,
          Seq(0L, 0L, 960L, 1920L))
        val pkts = O.parsePackets(ogg)
        (O.parseOpusHead(pkts.head._1), O.parseOpusTags(pkts(1)._1)) match {
          case (Some(h), Some((vendor, tg))) =>
            (id, h.channels, h.preSkip, h.inputRate, vendor,
              tg.size.toLong,
              if (tg.exists(_.startsWith("LICENSE="))) 1L else 0L,
              tg.find(_.startsWith("TITLE="))
                .map(_.length - 6L).getOrElse(-1L))
          case _ => (id, -1, -1, -1L, "", -1L, -1L, -1L)
        }
      }
      .toDF("media_id", "channels", "pre_skip", "input_rate", "vendor",
        "n_tags", "has_license", "title_chars")
      .orderBy("media_id")
  }
  /** PNG COLOR-TYPE rotation: docs cycle through the three 8-bit
    * color types — grayscale (ids ≡ 0 mod 3: pixel = (v, v, v)),
    * truecolor (≡ 1), palette (≡ 2: 64 ramp entries (e, 2e mod 256,
    * 3e mod 256) — the gifPaletteEntry ramps, so a channel swap or
    * palette-indexing bug shows in the sums) — encoded by the real
    * writers and decoded back through the shared defilter at each
    * type's bytes-per-pixel. Channel sums over the DECODED raster
    * must equal the oracle's closed-form arithmetic per type. */
  private[graft] def multimodalDecodePngTypes(s: SparkSession,
                                       dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 24)
        val h = 1 + ((t.length / 24) % 24)
        val b = asciiBytes(id, t)
        val M = graft.operators.Multimodal
        val png = (id % 3) match {
          case 0 =>
            M.encodePngGray(w, h,
              Array.tabulate(w * h)(k => b(k % b.length)))
          case 1 =>
            M.encodePngPixels(w, h,
              Array.tabulate(w * h * 3)(k => b(k % b.length)))
          case _ =>
            val pal = Array.tabulate[Byte](64 * 3) { k =>
              val e = k / 3
              (k % 3 match {
                case 0 => e
                case 1 => (2 * e) % 256
                case _ => (3 * e) % 256
              }).toByte
            }
            M.encodePngPalette(w, h, pal,
              Array.tabulate(w * h)(k => ((b(k % b.length) & 0xff) % 64)
                .toByte))
        }
        val (dw, dh, rgb) = M.decodePngPixels(png).get
        var (sr, sg, sb) = (0L, 0L, 0L)
        var p = 0
        while (p + 2 < rgb.length) {
          sr += rgb(p) & 0xff; sg += rgb(p + 1) & 0xff
          sb += rgb(p + 2) & 0xff
          p += 3
        }
        (id, (id % 3).toInt, dw, dh, dw.toLong * dh, sr, sg, sb)
      }
      .toDF("media_id", "color_type", "width", "height", "n_pixels",
        "sum_r", "sum_g", "sum_b")
      .orderBy("media_id")
  }
  /** REAL Ogg container round trip: each doc becomes a single-stream
    * Ogg (one packet per page, the Opus layout) whose packet sizes
    * derive from the text — with a 70 000-byte packet on ids ≡ 0
    * mod 7 forcing true multi-page CONTINUATION (a 255×255-byte page
    * plus the remainder page) — built, then walked back through the
    * CRC-verifying page parse and the cross-page packet reassembly.
    * The oracle predicts page counts, continuation counts, payload
    * volume and the final granule in closed form, so a lacing, CRC
    * or continuation bug fails the hash. One map pass per row. */
  private[graft] def oggParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir).repartition(col("doc_id"))
      .map { case (id, t) =>
        val b = asciiBytes(id, t)
        val np = 1 + (t.length % 5)
        val packets = (0 until np).map { i =>
          val li = if (i == 0 && id % 7 == 0) 70000
                   else 1 + ((t.length + i * 13) % 300)
          Array.tabulate(li)(k => b((k + i) % b.length))
        }
        val granules = (0 until np).map(i => (i + 1) * 960L)
        val ogg = graft.operators.Ogg.build(id, packets, granules)
        val pages = graft.operators.Ogg.parsePages(ogg)
        val got = graft.operators.Ogg.parsePackets(ogg)
        val intact = got.size == np &&
          got.zipWithIndex.forall { case ((pb, g), i) =>
            java.util.Arrays.equals(pb, packets(i)) && g == granules(i)
          }
        (id, pages.size.toLong, got.size.toLong,
          pages.map(_.payloadLen.toLong).sum,
          if (got.isEmpty) -1L else got.last._2,
          pages.count(_.continued).toLong,
          if (intact) 1L else 0L)
      }
      .toDF("media_id", "n_pages", "n_packets", "total_payload",
        "last_granule", "continued_pages", "intact")
      .orderBy("media_id")
  }
  /** Voice-activity SEGMENTATION over the same real 8 kHz WAVs as
    * audio_frame_energy — the utterance-level readout a speech-corpus
    * curation pass keeps (how many utterances, the longest one, the
    * speech ratio), with single-frame dips bridged so one quiet frame
    * doesn't split an utterance. The oracle replays the 4-int fold
    * state verbatim as a list_reduce, so every segment boundary is
    * hash-pinned. */
  private[graft] def audioVadSegments(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/wav",
          graft.operators.Multimodal.encodeWavPcm8(8000, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractVadSegments(media, 256).toDF()
      .orderBy("media_id")
  }
  /** ANIMATED GIF path: documents become real multi-frame GIF89a
    * streams (per-frame graphic-control extensions with centisecond
    * delays, full-rect frames whose indices shift by one text position
    * per frame, the standard 256-ramp palette) and the extractor runs
    * the full animation walk — LZW per frame, compositing, delay fold.
    * The oracle recomputes frame count, total delay and the per-frame
    * channel sums through the palette ramps in nested integer list
    * arithmetic. */
  private[graft] def multimodalGifFrames(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        val nf = 1 + (t.length % 8)
        val bytes0 = asciiBytes(id, t)
        val gif = graft.operators.Multimodal.encodeGifFrames(w, h, nf,
          (f, k) => bytes0((k + f) % bytes0.length) & 0xff,
          f => 2 + f % 5)
        val a = graft.operators.Multimodal.decodeGifFrames(gif)
          .getOrElse(graft.operators.Multimodal.GifAnim(-1, -1, -1, -1L,
            -1L, -1L, -1L))
        (id, a.width, a.height, a.nFrames, a.totalDelayCs,
          a.sumR, a.sumG, a.sumB)
      }
      .toDF("media_id", "width", "height", "n_frames", "total_delay_cs",
        "sum_r", "sum_g", "sum_b")
      .orderBy("media_id")
  }
  /** REAL video frame sampling: documents become Motion-JPEG AVI files
    * (RIFF hdrl/avih/strl + movi of complete baseline JPEGs — 1+len%5
    * frames, frame f's Y blocks = the text bytes rotated by f) and the
    * sampler walks the container, decodes every 2nd frame through the
    * FULL baseline JPEG pipeline and folds per-channel raster sums —
    * the video twin of multimodal_gif_frames, with a real inter-frame
    * stride like a vision-encoder ingest pipeline. The constant-block
    * construction keeps decoded pixels at exactly (v+7, v−4, v), so
    * the oracle predicts every sampled frame's sums in pure integer
    * arithmetic; a container-walk, stride or JPEG bug fails the hash.
    *
    * 100 TB shape: one flatMap over the binary scan — narrow per-frame
    * rows out, zero shuffle; decode cost is embarrassingly parallel. */
  private[graft] def videoFrameSample(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    // spread the single-row-group driver parquet before the per-frame
    // JPEG encode/decode (the cdcChunked move): one tiny exchange of
    // the text table parallelizes ~25k full codec runs across every
    // core; a real multi-file corpus arrives pre-split and this is a
    // no-op cost
    val media = asciiDocs(s, dir).repartition(col("doc_id"))
      .map { case (id, t) =>
        val bw = 1 + (t.length % 8)
        val bh = 1 + ((t.length / 8) % 8)
        val nf = 1 + (t.length % 5)
        val b = asciiBytes(id, t)
        val frames = (0 until nf).map { f =>
          val rot = Array.tabulate(b.length)(i => b((i + f) % b.length))
          graft.operators.Jpeg.encodePixels(bw, bh, rot)
        }
        graft.operators.MediaRow(id, "video/x-msvideo",
          graft.operators.Multimodal.encodeAviMjpeg(8 * bw, 8 * bh,
            40000, frames))
      }
    graft.operators.Multimodal.sampleVideoFrames(media, 2).toDF()
      .orderBy("media_id", "frame_idx")
  }
  /** Shot-boundary detection over real MJPEG AVI: frames hold STATIC
    * SCENES (blocks shift by 7 text positions every 3 frames), so
    * within a scene the inter-frame L1 delta is exactly 0 and at each
    * scene boundary it is 192·Σ|b(k+7s)−b(k+7s′)| — the channel
    * offsets of the DC-only JPEG arithmetic cancel in the diff. The
    * decode path is the full AVI walk + JPEG decode per frame; the
    * oracle recomputes every boundary delta from the text, so a codec
    * or container bug flips cut flags and fails the hash. */
  /** Shared MJPEG scene fixture: static scenes shifting every 3
    * frames at 1 s/frame. The per-frame JPEG ENCODE runs once per
    * (session, dir) through the ScanCache — video_shot_cuts and
    * caption_scene_align both decode from the same cached bytes (the
    * r11 bench's two heaviest new entries were each paying the full
    * encode pass). */
  private[graft] def videoSceneMedia(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    ScanCache.get(s, s"video-scenes:$dir") {
      asciiDocs(s, dir).repartition(col("doc_id"))
        .map { case (id, t) =>
          val bw = 1 + (t.length % 8)
          val bh = 1 + ((t.length / 8) % 8)
          val nf = 4 + (t.length % 5)
          val b = asciiBytes(id, t)
          val frames = (0 until nf).map { f =>
            val sc = f / 3
            val payload = Array.tabulate(b.length)(i =>
              b((i + sc * 7) % b.length))
            graft.operators.Jpeg.encodePixels(bw, bh, payload)
          }
          (id, graft.operators.Multimodal.encodeAviMjpeg(
            8 * bw, 8 * bh, 1000000, frames), t)
        }
        .toDF("media_id", "avi", "text")
    }
  }
  private[graft] def videoShotCuts(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    videoSceneMedia(s, dir).select("media_id", "avi")
      .as[(Long, Array[Byte])]
      .map { case (id, avi) =>
        graft.operators.Multimodal.aviShotCuts(id, avi, 0L)
      }
      .toDF()
      .orderBy("media_id")
  }
  /** Caption sidecar QA over real SubRip files (operators/Srt): each
    * doc renders a deterministic .srt (cue i at [1700i,
    * 1700i + 1200 + len%800), text cycled from the doc), the REAL
    * parser walks it back, and the readout is what a captions QA pass
    * checks — cue count, talk time, span, text volume, and the
    * OVERLAP count (cues starting before the previous one ends — the
    * classic broken-subtitle defect; by construction present exactly
    * when len%800 > 500, so both engines predict it). Any timestamp
    * format/parse bug shifts talk/span/overlap and fails the hash. */
  private[graft] def srtParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val nc = 1 + (t.length % 6)
        val cues = (0 until nc).map { i =>
          val start = i * 1700L
          val dur = 1200L + (t.length % 800)
          val txt = t.substring(
            (i * 5) % t.length,
            math.min((i * 5) % t.length + 4, t.length))
          (start, start + dur, txt)
        }
        val parsed = graft.operators.Srt.parse(
          graft.operators.Srt.build(cues))
        val overlaps = parsed.sliding(2).count {
          case Seq(a, b) => b.startMs < a.endMs
          case _ => false
        }
        (id, parsed.size.toLong,
          parsed.map(c => c.endMs - c.startMs).sum,
          if (parsed.isEmpty) 0L
          else parsed.last.endMs - parsed.head.startMs,
          parsed.map(_.text.length.toLong).sum,
          if (parsed.isEmpty) 0L else parsed.map(_.text.length.toLong).max,
          overlaps.toLong)
      }
      .toDF("media_id", "n_cues", "talk_ms", "span_ms", "total_chars",
        "max_cue_chars", "overlap_cues")
      .orderBy("media_id")
  }
  /** Caption-to-scene alignment — the CROSS-MODAL composition a video
    * curation pipeline actually runs (which captions belong to which
    * shot): per doc, a 1 s-per-frame MJPEG AVI with static scenes
    * (the video_shot_cuts construction) is decoded to SCENE INTERVALS
    * through the real cut detector ([[graft.operators.Multimodal
    * .aviScenes]] — scenes with identical boundary content MERGE, as
    * a real detector would), a deterministic SubRip file is parsed
    * back through the real [[graft.operators.Srt]] walk, and cues
    * interval-join onto scenes (strict overlap). Both modalities ride
    * their full decode paths inside ONE flatMap — no shuffle — and
    * the oracle recomputes scene merging, cue framing and the
    * interval join analytically, so a bug in either decoder OR the
    * overlap logic fails the hash. */
  private[graft] def captionSceneAlign(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    videoSceneMedia(s, dir)
      .as[(Long, Array[Byte], String)]
      .flatMap { case (id, avi, t) =>
        val scenes = graft.operators.Multimodal.aviScenes(id, avi, 0L)
        val nc = 1 + (t.length % 6)
        val dur = 1200L + (t.length % 800)
        val cues = graft.operators.Srt.parse(graft.operators.Srt.build(
          (0 until nc).map { i =>
            val at = (i * 5) % t.length
            (i * 1700L, i * 1700L + dur,
              t.substring(at, math.min(at + 4, t.length)))
          }))
        scenes.map { sc =>
          val ov = cues.filter(c =>
            c.startMs < sc.end_ms && sc.start_ms < c.endMs)
          (id, sc.scene_idx.toLong, sc.start_ms, sc.end_ms,
            ov.size.toLong, ov.map(_.text.length.toLong).sum)
        }
      }
      .toDF("media_id", "scene_idx", "start_ms", "end_ms", "n_cues",
        "cue_chars")
      .orderBy("media_id", "scene_idx")
  }
  /** MPEG-1 Audio Layer I REAL bitstream decode
    * (operators/MpegAudio): per doc a multi-frame mono stream encodes
    * with per-subband allocations (2–4 sample bits), power-of-two
    * scalefactors (indices at multiples of 3 — the closed-form
    * geometric table needs no spec data) and text-derived sample
    * codes; the decoder walks headers, allocations, scalefactors and
    * the interleaved 12×32 sample grid, requantizing with the Layer I
    * formula. The oracle recomputes EVERYTHING analytically from the
    * document text — frame/subband schedules, raw code sums and the
    * per-sample requantized micro-unit amplitudes (every factor a
    * power of two or a single IEEE division, so both engines agree
    * bit-for-bit). One flatMap over the scan, zero shuffle. */
  private[graft] def multimodalDecodeMp1(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val bl = t.length
        val b = asciiBytes(id, t)
        val frames = (0 until (1 + bl % 3)).map { f =>
          val nsb = 1 + ((bl + f) % 4)
          val allocs = Array.tabulate(32)(sb =>
            if (sb < nsb) 1 + (sb % 3) else 0)
          val scf = Array.tabulate(32)(sb => 3 * ((sb + f) % 5))
          val codes = Array.tabulate(32)(sb => Array.tabulate(12)(s0 =>
            if (sb < nsb)
              (b((f * 97 + sb * 12 + s0) % bl) & 0xff) %
                (1 << (2 + sb % 3))
            else 0))
          graft.operators.MpegAudio.encodeFrame(allocs, scf, codes)
        }
        val dec = graft.operators.MpegAudio.decode(
          frames.foldLeft(Array.emptyByteArray)(_ ++ _))
        (id, dec.length.toLong, dec.map(_.nActive.toLong).sum,
          dec.map(_.sumCodes).sum, dec.map(_.ampMicro).sum)
      }
      .toDF("media_id", "n_frames", "n_active", "sum_codes", "amp_micro")
      .orderBy("media_id")
  }
  /** MPEG-1 Audio Layer II REAL bitstream decode
    * (operators/MpegAudio.decodeL2) — the dominant broadcast layer,
    * extending the Layer I walk with everything Layer II adds: the
    * Table 3-B.2a bit allocation (active subbands 0/4/12/24 hit all
    * four nbal classes), SCFSI scalefactor sharing (the fixture
    * cycles all four modes), GROUPED quantizers (3/5/9-step triples
    * in one 5/7/10-bit codeword) and the C·(s+D) requantization with
    * closed-form constants. Scalefactor indices stay at multiples of
    * 3 (power-of-two factors), so every amplitude is the same
    * exact-or-single-rounded IEEE chain the oracle reproduces. One
    * flatMap over the scan, zero shuffle. */
  private[graft] def multimodalDecodeMp2(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val Mp = graft.operators.MpegAudio
        val bl = t.length
        val b = asciiBytes(id, t)
        val activeSbs = Array(0, 4, 12, 24)
        val frames = (0 until (1 + bl % 3)).map { f =>
          val act = activeSbs.take(1 + ((bl + f) % 4))
          val allocIdx = Array.fill(Mp.L2SbLimit)(0)
          val scfsi = Array.fill(Mp.L2SbLimit)(0)
          val scf = Array.ofDim[Int](Mp.L2SbLimit, 3)
          val samples = Array.ofDim[Int](Mp.L2SbLimit, 36)
          act.foreach { sb =>
            val cap = if (sb == 24) 2 else 4
            allocIdx(sb) = 1 + ((bl + sb + f) % cap)
            scfsi(sb) = (bl + sb + f) % 4
            for (k <- 0 until 3) scf(sb)(k) = 3 * ((sb + f + k) % 5)
            val m = Mp.l2Steps(sb, allocIdx(sb))
            for (i <- 0 until 36)
              samples(sb)(i) = (b((f * 89 + sb * 36 + i) % bl) & 0xff) % m
          }
          Mp.encodeFrameL2(allocIdx, scfsi, scf, samples)
        }
        val dec = Mp.decodeL2(
          frames.foldLeft(Array.emptyByteArray)(_ ++ _))
        (id, dec.length.toLong, dec.map(_.nActive.toLong).sum,
          dec.map(_.nGrouped).sum, dec.map(_.sumCodes).sum,
          dec.map(_.ampMicro).sum)
      }
      .toDF("media_id", "n_frames", "n_active", "n_grouped",
        "sum_codes", "amp_micro")
      .orderBy("media_id")
  }
  /** H.264 Annex B stream walk + REAL SPS parse
    * (operators/H264): per doc a baseline-profile elementary stream —
    * SPS (Exp-Golomb frame-size fields with 4:2:0 cropping for
    * non-multiple-of-16 dims), PPS, one IDR and a text-derived count
    * of non-IDR slices — and the parser start-code-walks the NAL
    * units, strips emulation-prevention bytes and Exp-Golomb-decodes
    * the SPS down to the cropped dimensions. ASCII payload bytes are
    * never 0x00, so no false start codes arise and the oracle
    * predicts every fact arithmetically. Pixel reconstruction
    * (CAVLC/CABAC) stays out of scope — the WebP/MP4 honesty level.
    * Pure map pass, zero shuffle. */
  private[graft] def multimodalDecodeH264(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val H = graft.operators.H264
        val bl = t.length
        val b = asciiBytes(id, t)
        val w = 2 * (1 + bl % 32)
        val h = 2 * (1 + (bl / 64) % 32)
        val nVcl = 1 + bl % 7
        val stream = H.buildNal(3, 7, H.buildSps(w, h)) ++
          H.buildNal(3, 8, H.buildPps()) ++
          (0 until nVcl).toArray.flatMap { i =>
            val payload = Array.tabulate(8)(j => b((i * 13 + j) % bl))
            H.buildNal(if (i == 0) 3 else 2, if (i == 0) 5 else 1,
              payload)
          }
        val f = H.parse(stream)
        (id, f.width, f.height, f.nNals, f.nIdr, f.nVcl)
      }
      .toDF("media_id", "decoded_w", "decoded_h", "n_nals", "n_idr",
        "n_vcl")
      .orderBy("media_id")
  }
  /** WebP lossless PIXEL decode (operators/Vp8l) — the full VP8L
    * bitstream round trip upgrading WebP from "dims only" to real
    * rasters: per doc a text-derived RGBA image (first row solid to
    * force an LZ77 run, the rest cycled text bytes) is encoded into a
    * REAL `.webp` file — canonical prefix codes, distance-1 AND 2-D
    * mapped backreferences, and per-id feature rotation
    * (subtract-green on even ids, a 16-entry color cache on ids ≡ 0
    * mod 3, the PREDICTOR transform cycling all 14 modes on ids ≡ 0
    * mod 5, the COLOR transform with id-derived signed multipliers
    * on ids ≡ 0 mod 7, a META-PREFIX entropy image with 1–4 prefix
    * groups on ids ≡ 0 mod 11) — and decoded back through the real
    * bit parse
    * (code-length codes, LZ77 copy, cache state, transform-image
    * decode, inverse transforms). Channel sums over the DECODED
    * raster must equal the oracle's arithmetic over the text. Pure
    * map pass, zero shuffle. */
  private[graft] def multimodalDecodeWebpPixels(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val bl = t.length
        val b = asciiBytes(id, t)
        val w = 1 + bl % 32
        val h = 1 + (bl / 32) % 32
        val px = Array.tabulate(w * h) { k =>
          def ch(c: Int): Int =
            if (k < w) b(c % bl) & 0xff
            else b((3 * (k - w) + c) % bl) & 0xff
          0xff000000 | (ch(0) << 16) | (ch(1) << 8) | ch(2)
        }
        val webp = graft.operators.Vp8l.encode(w, h, px,
          subtractGreen = id % 2 == 0,
          cacheBits = if (id % 3 == 0) 4 else 0,
          predictorMode = if (id % 5 == 0) (id % 14).toInt else -1,
          colorCte = if (id % 7 == 0) ((id * 0x9e3779b1L) & 0xffffff).toInt
                     else -1,
          metaBits = if (id % 11 == 0) 3 else -1,
          metaGroups = if (id % 11 == 0) 1 + (id % 4).toInt else 1)
        val (dw, dh, out) = graft.operators.Vp8l.decode(webp).get
        var (sr, sg, sb) = (0L, 0L, 0L)
        out.foreach { p =>
          sr += (p >>> 16) & 0xff
          sg += (p >>> 8) & 0xff
          sb += p & 0xff
        }
        (id, dw, dh, out.length.toLong, sr, sg, sb)
      }
      .toDF("media_id", "decoded_w", "decoded_h", "n_pixels",
        "sum_r", "sum_g", "sum_b")
      .orderBy("media_id")
  }
  /** H.264 I_PCM PIXEL decode (operators/H264.decodeIPcmPixels) — the
    * one entropy-free pixel path in the codec (§7.3.5: mb_type 25,
    * byte-aligned raw 4:2:0 samples), upgrading the h264 row from
    * facts-only to real reconstructed planes: per doc an IDR frame of
    * text-derived I_PCM macroblocks is built, streamed through Annex B
    * (start codes + emulation prevention), and decoded back through
    * the REAL slice-header + macroblock bit parse into raster planes.
    * The position-weighted luma checksum pins the MB→plane scatter
    * (a transposed or mis-tiled plane flips it); plain sums pin the
    * sample values. CAVLC intra prediction remains the documented
    * honest gap (COVERAGE.md). Pure map pass, zero shuffle. */
  private[graft] def multimodalDecodeH264Pixels(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val H = graft.operators.H264
        val bl = t.length
        val b = asciiBytes(id, t)
        val wMbs = 1 + bl % 4
        val hMbs = 1 + (bl / 4) % 4
        val slice = H.buildIPcmSlice(wMbs, hMbs,
          k => b((k * 31 + 7) % bl) & 0xff,
          (m, j) => b(((m * 64 + j) * 13) % bl) & 0xff,
          (m, j) => b(((m * 64 + j) * 17 + 3) % bl) & 0xff)
        val stream = H.buildNal(3, 7, H.buildSps(16 * wMbs, 16 * hMbs)) ++
          H.buildNal(3, 8, H.buildPps()) ++
          H.buildNal(3, 5, slice)
        val f = H.decodeIPcmPixels(stream).get
        // checksums over the DECODED planes, not the write stream
        var sumY = 0L
        var wsumY = 0L
        var px = 0
        while (px < f.y.length) {
          val v = f.y(px) & 0xff
          sumY += v
          wsumY += (px % f.width + 3L * (px / f.width) + 1L) * v
          px += 1
        }
        (id, f.width, f.height, sumY, wsumY,
          f.cb.map(v => (v & 0xff).toLong).sum,
          f.cr.map(v => (v & 0xff).toLong).sum)
      }
      .toDF("media_id", "decoded_w", "decoded_h", "sum_y", "wsum_y",
        "sum_cb", "sum_cr")
      .orderBy("media_id")
  }
  /** Shared oracle for the sequential and Adam7 PNG pixel
    * queries — identical raster, identical facts. */
  private[graft] def pngPixelsOracleSql: String = {
      // channel c pixels sit at byte positions ≡ c (mod 3) of the
      // cycled text bytes: sum_c = Σ_{k<w·h} ascii(text[(3k+c) mod len])
      def chSum(c: Int): String =
        s"""CAST(list_sum(list_transform(range(0, n),
           |    k -> ascii(substr(text, CAST((3*k + $c) % len AS INT) + 1, 1))))
           |  AS BIGINT)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h
         |  FROM documents WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, n AS n_pixels,
         |  ${chSum(0)} AS sum_r,
         |  ${chSum(1)} AS sum_g,
         |  ${chSum(2)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
  }
  /** REAL-decoder WebP path: documents encode into valid RIFF/WEBP
    * containers cycling ALL THREE dimension-bearing chunk layouts by
    * doc parity — VP8 lossy (keyframe tag + 0x9D012A start code +
    * 14-bit dims), VP8L lossless (0x2F + packed dims−1) and VP8X
    * extended (24-bit canvas dims−1) — and the extractor walks the
    * chunk list and reads whichever header it finds. The oracle
    * predicts dims and the variant-dependent container size
    * arithmetically. */
  private[graft] def multimodalDecodeWebp(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 64)
        val h = 1 + ((t.length / 64) % 64)
        val variant = (id % 3) match {
          case 0 => "VP8 "
          case 1 => "VP8L"
          case _ => "VP8X"
        }
        graft.operators.MediaRow(id, "image/webp",
          graft.operators.Multimodal.encodeWebp(variant, w, h,
            asciiBytes(id, t)))
      }
    graft.operators.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"))
      .orderBy("media_id")
  }
  /** PACKBITS TIFF pixel decode path: pixels repeat each text byte 4×
    * (real runs, so the run-length coder genuinely compresses) and the
    * strips are PackBits-compressed — StripByteCounts now carry the
    * COMPRESSED sizes, so the decoder must decompress each strip to
    * exactly rows·w·3 bytes; endianness still alternates by document
    * parity. The oracle predicts channel sums via the (3k+c)/4 index
    * map in integer list arithmetic; an RLE, strip-size or IFD bug
    * fails the hash. */
  private[graft] def multimodalDecodeTiffPackbits(s: SparkSession,
                                           dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 24)
        val h = 1 + ((t.length / 24) % 24)
        val b = asciiBytes(id, t)
        val px = Array.tabulate(w * h * 3)(k => b((k / 4) % b.length))
        graft.operators.MediaRow(id, "image/tiff",
          graft.operators.Multimodal.encodeTiffPixelsPackBits(w, h,
            id % 2 == 0, px))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** QOI raster round trip (operators/Qoi): pixel p channel c =
    * text[(3p+c) mod len]; the greedy op ladder (run/index/diff/
    * luma/rgb) must be invisible after decode — the readout is
    * [[graft.operators.Multimodal.extractPixelFeatures]]'s channel
    * sums over the DECODED raster, the same contract as the
    * PNG/GIF/TIFF/WebP decode gates. */
  private[graft] def multimodalDecodeQoiPixels(s: SparkSession,
                                        dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 24)
        val h = 1 + ((t.length / 24) % 24)
        val b = asciiBytes(id, t)
        val px = Array.tabulate(w * h * 3)(k => b(k % b.length))
        graft.operators.MediaRow(id, "image/qoi",
          graft.operators.Qoi.encode(w, h, px))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** WebVTT caption QA (operators/WebVtt) — the [[srtParse]] twin in
    * the format web caption tracks actually arrive in: cue i at
    * [2100i, 2100i + 1500 + len%900), odd cues carry an id, every
    * third cue carries settings, and a NOTE block is spliced in
    * front so the walk must skip non-cue blocks. Readout counts
    * cues, ids, settings, talk/span time, text volume and OVERLAPS
    * (present exactly when len%900 > 600). */
  private[graft] def vttParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val nc = 1 + (t.length % 5)
        val dur = 1500L + (t.length % 900)
        val cues = (0 until nc).map { i =>
          val start = i * 2100L
          val txt = t.substring(
            (i * 5) % t.length,
            math.min((i * 5) % t.length + 4, t.length))
          val cid = if (i % 2 == 1) s"c$i" else ""
          val set = if (i % 3 == 0) "align:start" else ""
          (cid, start, start + dur, set, txt)
        }
        val doc = "WEBVTT\n\nNOTE machine generated\n\n" +
          graft.operators.WebVtt.build(cues).stripPrefix("WEBVTT\n\n")
        val parsed = graft.operators.WebVtt.parse(doc)
          .getOrElse(sys.error(s"vtt parse rejected doc $id"))
        val overlaps = parsed.sliding(2).count {
          case Seq(a, b) => b.startMs < a.endMs
          case _ => false
        }
        (id, parsed.size.toLong,
          parsed.count(_.id.nonEmpty).toLong,
          parsed.count(_.settings.nonEmpty).toLong,
          parsed.map(c => c.endMs - c.startMs).sum,
          if (parsed.isEmpty) 0L
          else parsed.last.endMs - parsed.head.startMs,
          parsed.map(_.text.length.toLong).sum,
          overlaps.toLong)
      }
      .toDF("media_id", "n_cues", "id_cues", "settings_cues", "talk_ms",
        "span_ms", "total_chars", "overlap_cues")
      .orderBy("media_id")
  }
  /** Y4M raw-video readout (operators/Y4m): per doc a Cmono stream —
    * frame f's luma byte j = text[(j + 11f) mod len] — is built,
    * parsed back (sizes verified), and the readout is what a raw
    * video QA pass computes: frame count, dims, total luma, and the
    * INTER-FRAME absolute delta sum (the scene-cut signal the AVI
    * shot detector thresholds). Any header/frame-walk bug shifts
    * every fact. */
  private[graft] def y4mFrameStats(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 16)
        val h = 1 + ((t.length / 16) % 16)
        val nf = 2 + (t.length % 4)
        val b = asciiBytes(id, t)
        val n = w * h
        val frames = (0 until nf).map { f =>
          graft.operators.Y4m.Y4mFrame("",
            Array.tabulate(n)(j => b((j + 11 * f) % b.length)))
        }
        val hdr = graft.operators.Y4m.Y4mHeader(w, h, 25, 1, "p", "",
          "mono")
        val (gh, gf) = graft.operators.Y4m.parse(
          graft.operators.Y4m.build(hdr, frames))
          .getOrElse(sys.error(s"y4m parse rejected doc $id"))
        val luma = gf.map(_.planes.map(x => (x & 0xff).toLong).sum).sum
        val delta = gf.sliding(2).collect {
          case Seq(a, c) =>
            a.planes.zip(c.planes)
              .map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)).toLong }
              .sum
        }.sum
        (id, gh.w, gh.h, gf.size.toLong, luma, delta)
      }
      .toDF("media_id", "width", "height", "n_frames", "luma_sum",
        "delta_sum")
      .orderBy("media_id")
  }
  /** The LZW twin of [[multimodalDecodeTiffPackbits]]: the same
    * text-derived pixel rasters encoded as Compression=5 TIFFs
    * through the real TIFF-variant LZW coder (MSB-first, early
    * width change, 4094-entry clears), with the horizontal-
    * differencing predictor on ids ≡ 0 mod 3 and byte order
    * rotating on id parity — then decoded back through the real
    * strip walk + LZW + inverse predictor. Channel sums over the
    * DECODED raster must equal the oracle's arithmetic over the
    * text (lossless round trip), so a bit-order, width-schedule or
    * predictor bug fails the hash. One map pass per row. */
  private[graft] def multimodalDecodeTiffLzw(s: SparkSession,
                                      dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 24)
        val h = 1 + ((t.length / 24) % 24)
        val b = asciiBytes(id, t)
        val px = Array.tabulate(w * h * 3)(k => b((k / 4) % b.length))
        graft.operators.MediaRow(id, "image/tiff",
          graft.operators.Multimodal.encodeTiffPixelsLzw(w, h,
            id % 2 == 0, px, predictor = if (id % 3 == 0) 2 else 1))
      }
    graft.operators.Multimodal.extractPixelFeatures(media).toDF()
      .orderBy("media_id")
  }
  /** REAL audio resample path: documents become 8 kHz 8-bit PCM WAV
    * files and resample to 6 kHz through exact rational linear
    * interpolation — output i at source position i·4/3, sample =
    * (a·(d−f) + b·f)/d in pure integer arithmetic — so the oracle
    * recomputes every interpolated value from the text bytes; an
    * index, weight or rounding bug fails the hash. The audio twin of
    * image_resize_box: one map pass over the binary scan, no
    * shuffle. */
  private[graft] def audioResample(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        graft.operators.MediaRow(id, "audio/wav",
          graft.operators.Multimodal.encodeWavPcm8(8000, asciiBytes(id, t)))
      }
    graft.operators.Multimodal.resampleWav(media, 6000).toDF()
      .orderBy("media_id")
  }
  /** Batch audit pass of the streaming media gate: the SAME verdict
    * function (streaming/StreamingMediaGate — full pixel decode +
    * integer luma/contrast gate) over PNG pixel fixtures, with the
    * DuckDB oracle recomputing the whole gate from first principles.
    * keep = decoded ∧ w≥8 ∧ h≥8 ∧ 16≤mean≤240 ∧ contrast≥8. */
  private[graft] def imageQualityGate(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = asciiDocs(s, dir)
      .map { case (id, t) =>
        val w = 1 + (t.length % 32)
        val h = 1 + ((t.length / 32) % 32)
        graft.streaming.MediaDoc(id, 0L, "image/png",
          graft.operators.Multimodal.encodePngPixels(w, h, asciiBytes(id, t)))
      }
    graft.streaming.StreamingMediaGate.verdicts(media).toDF()
      .withColumnRenamed("mediaId", "media_id")
      .orderBy("media_id")
  }
  /** Shared oracle for the batch and file-backed media-ingest DAG
    * (the file and gzip layers must be invisible to every fact). */
  private[graft] lazy val MediaDagOracle: String = {
      // kind = doc_id%4: png/tiff pixel byte j = text[j mod len]
      // (channel c of pixel p is byte 3p+c); gif palette ramps
      // (e, 2e mod 256, 3e mod 256) on index text[k mod len]; wav is
      // Σ|v−128| over the raw bytes; keep = ≥64 pixels-or-samples
      def s3(c: Int): String =
        s"""list_sum(list_transform(range(0, n), k ->
           |  ascii(substr(text, CAST((3 * k + $c) % len AS INT) + 1, 1))))"""
          .stripMargin
      def gifS(mul: Int): String =
        s"""list_sum(list_transform(range(0, n), k ->
           |  ($mul * ascii(substr(text, CAST(k % len AS INT) + 1, 1)))
           |  % 256))""".stripMargin
      val wavS =
        """list_sum(list_transform(range(0, len), i ->
          |  abs(128 - ascii(substr(text, CAST(i AS INT) + 1, 1)))))"""
          .stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 16 AS w,
         |    1 + (length(text) // 16) % 16 AS h,
         |    doc_id % 4 AS kind
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id,
         |  CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
         |    WHEN 2 THEN 'tiff' ELSE 'wav' END AS ext,
         |  CASE kind WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
         |    WHEN 2 THEN 'image/tiff' ELSE 'audio/wav' END AS sniffed,
         |  CAST(CASE WHEN kind = 3 THEN len ELSE n END AS BIGINT)
         |    AS units,
         |  CAST(CASE kind WHEN 1 THEN ${gifS(1)} WHEN 3 THEN $wavS
         |    ELSE ${s3(0)} END AS BIGINT) AS sum_r,
         |  CAST(CASE kind WHEN 1 THEN ${gifS(2)} WHEN 3 THEN 0
         |    ELSE ${s3(1)} END AS BIGINT) AS sum_g,
         |  CAST(CASE kind WHEN 1 THEN ${gifS(3)} WHEN 3 THEN 0
         |    ELSE ${s3(2)} END AS BIGINT) AS sum_b,
         |  CAST(CASE WHEN (CASE WHEN kind = 3 THEN len ELSE n END) >= 64
         |    THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM e ORDER BY media_id""".stripMargin
  }

  /** This part's oracle SQL entries (the `oracleSql` slice). */
  private[graft] def mediaOracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id AS media_id, 'text/plain' AS kind,
         |  length(text) AS n_bytes,
         |  substring(text, 1, 8) AS head8,
         |  ${charFoldDuck("text")} AS content_hash,
         |  CAST(1 + length(text) % 64 AS INT) AS decoded_w,
         |  CAST(1 + (length(text) // 64) % 64 AS INT) AS decoded_h
         |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "image_ahash" ->
      s"""$ahashOracleCtes
         |SELECT media_id, decoded_w, decoded_h, ahash_hi, ahash_lo
         |FROM hx ORDER BY media_id""".stripMargin,
    "image_neardup_ahash" ->
      s"""$ahashOracleCtes,
         |bands AS (
         |  SELECT media_id, ahash_hi AS hi, ahash_lo AS lo,
         |    unnest([ahash_lo & 65535, (ahash_lo >> 16) & 65535,
         |      ahash_hi & 65535, (ahash_hi >> 16) & 65535]) AS bv,
         |    unnest([0, 1, 2, 3]) AS band
         |  FROM hx),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         |    a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
         |    AS BIGINT) AS hamming
         |FROM cand ORDER BY hamming, id_a, id_b LIMIT $AhashPanelTop"""
        .stripMargin,
    "image_neardup_recall" ->
      s"""$ahashOracleCtes,
         |bands AS (
         |  SELECT media_id, ahash_hi AS hi, ahash_lo AS lo,
         |    unnest([ahash_lo & 65535, (ahash_lo >> 16) & 65535,
         |      ahash_hi & 65535, (ahash_hi >> 16) & 65535]) AS bv,
         |    unnest([0, 1, 2, 3]) AS band
         |  FROM hx),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
         |tb AS (
         |  SELECT media_id, ahash_hi AS hi, ahash_lo AS lo,
         |    unnest([ahash_lo & 255, (ahash_lo >> 8) & 255,
         |      (ahash_lo >> 16) & 255, (ahash_lo >> 24) & 255,
         |      ahash_hi & 255, (ahash_hi >> 8) & 255,
         |      (ahash_hi >> 16) & 255, (ahash_hi >> 24) & 255]) AS bv,
         |    unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band
         |  FROM hx),
         |tpairs AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         |    a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
         |  FROM tb a JOIN tb b
         |    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
         |truth AS (
         |  SELECT id_a, id_b,
         |    CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
         |      AS BIGINT) AS hamming
         |  FROM tpairs
         |  WHERE CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
         |    AS BIGINT) <= $AhashRecallRadius),
         |scored AS (
         |  SELECT t.hamming,
         |    CASE WHEN c.id_a IS NULL THEN CAST(0 AS BIGINT)
         |      ELSE CAST(1 AS BIGINT) END AS hit,
         |    $ahashRecallCase AS p_ppm
         |  FROM truth t LEFT JOIN cand c
         |    ON t.id_a = c.id_a AND t.id_b = c.id_b),
         |agg AS (
         |  SELECT count(*) AS n_true,
         |    CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_caught,
         |    CAST(coalesce(sum(p_ppm), 0) AS BIGINT) AS sp
         |  FROM scored)
         |SELECT n_true, n_caught,
         |  round(n_caught / CAST(greatest(n_true, 1) AS DOUBLE), 4) AS recall,
         |  round(CAST(sp AS DOUBLE) / greatest(n_true, 1) / 1000000.0, 4)
         |    AS expected_recall
         |FROM agg""".stripMargin,
    "multimodal_decode_bmp" ->
      """SELECT doc_id AS media_id, 'image/bmp' AS kind,
        |  CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
        |  CAST(w AS INT) AS decoded_w, CAST(h AS INT) AS decoded_h
        |FROM (SELECT doc_id, 1 + length(text) % 64 AS w,
        |        1 + (length(text) // 64) % 64 AS h FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0)
        |ORDER BY media_id""".stripMargin,
    "multimodal_decode_jpeg" ->
      """SELECT doc_id AS media_id, 'image/jpeg' AS kind,
        |  CAST(59 + length(text) AS BIGINT) AS n_bytes,
        |  CAST(1 + length(text) % 64 AS INT) AS decoded_w,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS decoded_h
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "multimodal_decode_png" ->
      """SELECT doc_id AS media_id, 'image/png' AS kind,
        |  CAST(57 + length(text) AS BIGINT) AS n_bytes,
        |  CAST(1 + length(text) % 64 AS INT) AS decoded_w,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS decoded_h
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "multimodal_decode_gif" ->
      """SELECT doc_id AS media_id, 'image/gif' AS kind,
        |  CAST(17 + length(text) + (length(text) + 254) // 255 AS BIGINT)
        |    AS n_bytes,
        |  CAST(1 + length(text) % 64 AS INT) AS decoded_w,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS decoded_h
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "multimodal_decode_tiff" ->
      """SELECT doc_id AS media_id, 'image/tiff' AS kind,
        |  CAST(38 + length(text) AS BIGINT) AS n_bytes,
        |  CAST(1 + length(text) % 64 AS INT) AS decoded_w,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS decoded_h
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    // the Adam7 layout must be invisible in the decoded raster:
    // identical oracle to the sequential PNG query
    "multimodal_decode_png_adam7" -> pngPixelsOracleSql,
    "multimodal_decode_png_pixels" -> pngPixelsOracleSql,
    "multimodal_decode_gif_pixels" -> {
      // pixel k's color index is text byte (k mod len); the palette
      // ramps map index i → (i, 2i mod 256, 3i mod 256)
      def chSum(mul: Int): String = {
        val a = s"ascii(substr(text, CAST(k % len AS INT) + 1, 1))"
        val term = if (mul == 1) a else s"($mul * $a) % 256"
        s"""CAST(list_sum(list_transform(range(0, n), k -> $term))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, n AS n_pixels,
         |  ${chSum(1)} AS sum_r,
         |  ${chSum(2)} AS sum_g,
         |  ${chSum(3)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_tiff_pixels" -> {
      // raw RGB bytes cycle the text: channel c of pixel k is text byte
      // (3k+c) mod len — the png_pixels convention
      def chSum(c: Int): String =
        s"""CAST(list_sum(list_transform(range(0, n),
           |    k -> ascii(substr(text, CAST((3*k + $c) % len AS INT) + 1, 1))))
           |  AS BIGINT)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, n AS n_pixels,
         |  ${chSum(0)} AS sum_r,
         |  ${chSum(1)} AS sum_g,
         |  ${chSum(2)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_jpeg_pixels" -> {
      // Y block k (raster) is the constant text byte k mod len; fixed
      // chroma (Cb=128, Cr=133) makes every decoded pixel exactly
      // (v+7, v−4, v), so each channel sum is 64·Σ_blocks(v+off)
      def chSum(off: Int): String = {
        val v = "ascii(substr(text, CAST(k % len AS INT) + 1, 1))"
        val term = if (off == 0) v else if (off > 0) s"$v + $off" else s"$v - ${-off}"
        s"""CAST(64 * list_sum(list_transform(range(0, nb), k -> $term))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 8 AS wb,
         |    1 + (length(text) // 8) % 8 AS hb
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(wb * hb AS BIGINT) AS nb FROM d)
         |SELECT doc_id AS media_id, CAST(8 * wb AS INT) AS width,
         |  CAST(8 * hb AS INT) AS height, CAST(64 * nb AS BIGINT) AS n_pixels,
         |  ${chSum(7)} AS sum_r,
         |  ${chSum(-4)} AS sum_g,
         |  ${chSum(0)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_mp3" ->
      """SELECT doc_id AS media_id,
        |  CAST((1 + length(text) % 16) * 417 AS BIGINT) AS n_bytes,
        |  CAST(3 AS INT) AS version,
        |  CAST(44100 AS INT) AS sample_rate,
        |  CAST(128 AS INT) AS bitrate_kbps,
        |  CAST(1 + length(text) % 16 AS INT) AS n_frames,
        |  CAST((1 + length(text) % 16) * 1152000 // 44100 AS BIGINT)
        |    AS duration_ms
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "multimodal_decode_mp4" ->
      """SELECT doc_id AS media_id,
        |  CAST(240 + length(text) AS BIGINT) AS n_bytes,
        |  CAST(1000 AS INT) AS timescale,
        |  CAST(length(text) * 40 AS BIGINT) AS duration_ms,
        |  CAST(1 + length(text) % 64 AS INT) AS width,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS height
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "multimodal_decode_wav" ->
      """SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(8 AS INT) AS bits_per_sample,
        |  CAST(length(text) AS BIGINT) AS n_samples,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(text, ''),
        |      ch -> ch <> ''), ch -> CAST(128 - ascii(ch) AS BIGINT))),
        |    (a, x) -> a + x)
        |    / CAST(greatest(length(text), 1) AS BIGINT) AS mean_abs
        |FROM documents
         |WHERE length(text) = strlen(text) AND length(text) > 0 ORDER BY media_id""".stripMargin,
    "multimodal_decode_ulaw" -> {
      // the G.711 µ-law magnitude of code byte b: complement, bias 132,
      // segment shift — recomputed per byte in DuckDB integer bit math.
      // ASCII codes all carry the complemented sign bit, so every
      // sample is −magnitude.
      val mag =
        """(((((255 - b) & 15) * 8 + 132) << (((255 - b) >> 4) & 7)) - 132)"""
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |m AS (SELECT doc_id, len,
         |  list_transform(
         |    list_transform(range(0, len),
         |      k -> ascii(substr(text, CAST(k AS INT) + 1, 1))),
         |    b -> $mag) AS mags
         |  FROM d)
         |SELECT doc_id AS media_id, CAST(7 AS INT) AS format,
         |  CAST(8000 AS INT) AS sample_rate,
         |  CAST(len AS BIGINT) AS n_samples,
         |  CAST(-list_sum(mags) AS BIGINT) AS sum_pcm,
         |  CAST(list_sum(mags) AS BIGINT) AS sum_abs,
         |  CAST(list_max(mags) AS INT) AS peak
         |FROM m ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_alaw" -> {
      // A-law: even-bit inversion then the three-branch segment expand;
      // ASCII codes have the positive bit clear, so samples are −t.
      val mag =
        """CASE WHEN ((a >> 4) & 7) = 0 THEN ((a & 15) << 4) + 8
          |     WHEN ((a >> 4) & 7) = 1 THEN ((a & 15) << 4) + 264
          |     ELSE (((a & 15) << 4) + 264) << (((a >> 4) & 7) - 1)
          |END""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |m AS (SELECT doc_id, len,
         |  list_transform(
         |    list_transform(range(0, len),
         |      k -> xor(ascii(substr(text, CAST(k AS INT) + 1, 1)), 85)),
         |    a -> $mag) AS mags
         |  FROM d)
         |SELECT doc_id AS media_id, CAST(6 AS INT) AS format,
         |  CAST(8000 AS INT) AS sample_rate,
         |  CAST(len AS BIGINT) AS n_samples,
         |  CAST(-list_sum(mags) AS BIGINT) AS sum_pcm,
         |  CAST(list_sum(mags) AS BIGINT) AS sum_abs,
         |  CAST(list_max(mags) AS INT) AS peak
         |FROM m ORDER BY media_id""".stripMargin
    },
    "image_resize_box" -> {
      // output pixel (x2,y2) channel c = floor-average of the four
      // cycled text bytes at (2x2..2x2+1, 2y2..2y2+1); source pixel
      // byte (x,y,c) = text[(3(yw+x)+c) mod len] (the PNG convention)
      def px(xe: String, ye: String, c: Int): String =
        s"ascii(substr(text, CAST((3 * (($ye) * w + ($xe)) + $c) % len AS INT) + 1, 1))"
      def chSum(c: Int): String = {
        val x0 = "2 * (k % w2)"
        val y0 = "2 * (k // w2)"
        s"""CAST(list_sum(list_transform(range(0, CAST(w2 * h2 AS BIGINT)),
           |  k -> (${px(x0, y0, c)} + ${px(s"$x0 + 1", y0, c)}
           |      + ${px(x0, s"$y0 + 1", c)} + ${px(s"$x0 + 1", s"$y0 + 1", c)}) // 4))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, w // 2 AS w2, h // 2 AS h2 FROM d
         |  WHERE w >= 2 AND h >= 2)
         |SELECT doc_id AS media_id, CAST(w2 AS INT) AS width,
         |  CAST(h2 AS INT) AS height, CAST(w2 * h2 AS BIGINT) AS n_pixels,
         |  ${chSum(0)} AS sum_r,
         |  ${chSum(1)} AS sum_g,
         |  ${chSum(2)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_jpeg_progressive" -> {
      // identical pixel arithmetic to the baseline JPEG oracle, on the
      // /6 block grid of the progressive fixture
      def chSum(off: Int): String = {
        val v = "ascii(substr(text, CAST(k % len AS INT) + 1, 1))"
        val term = if (off == 0) v else if (off > 0) s"$v + $off" else s"$v - ${-off}"
        s"""CAST(64 * list_sum(list_transform(range(0, nb), k -> $term))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 6 AS wb,
         |    1 + (length(text) // 6) % 6 AS hb
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(wb * hb AS BIGINT) AS nb FROM d)
         |SELECT doc_id AS media_id, CAST(8 * wb AS INT) AS width,
         |  CAST(8 * hb AS INT) AS height, CAST(64 * nb AS BIGINT) AS n_pixels,
         |  ${chSum(7)} AS sum_r,
         |  ${chSum(-4)} AS sum_g,
         |  ${chSum(0)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_gif_frames" -> {
      // frame f pixel k has color index text[(k+f) mod len]; palette
      // ramps i → (i, 2i mod 256, 3i mod 256); delays 2 + f mod 5
      def chSum(mul: Int): String = {
        val a = "ascii(substr(text, CAST((k + f) % len AS INT) + 1, 1))"
        val term = if (mul == 1) a else s"($mul * $a) % 256"
        s"""CAST(list_sum(list_transform(range(0, CAST(nf AS BIGINT)),
           |  f -> list_sum(list_transform(range(0, n), k -> $term))))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h,
         |    1 + length(text) % 8 AS nf
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, CAST(nf AS INT) AS n_frames,
         |  CAST(list_sum(list_transform(range(0, CAST(nf AS BIGINT)),
         |    f -> 2 + f % 5)) AS BIGINT) AS total_delay_cs,
         |  ${chSum(1)} AS sum_r,
         |  ${chSum(2)} AS sum_g,
         |  ${chSum(3)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "caption_scene_align" -> {
      // scene boundaries at f ∈ {3,6,…} whose block content actually
      // differs (the video_shot_cuts delta > 0); scenes = runs between
      // real cuts, timed at 1 s/frame; cues as in srt_parse; strict
      // interval overlap joins them
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 8 AS wb,
         |    1 + (length(text) // 8) % 8 AS hb,
         |    4 + length(text) % 5 AS nf,
         |    1 + length(text) % 6 AS nc,
         |    1200 + length(text) % 800 AS dur
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(wb * hb AS BIGINT) AS nb FROM d),
         |fr AS (SELECT doc_id, text, len, nb, u.f
         |  FROM e, LATERAL unnest(range(0, CAST(nf AS BIGINT))) AS u(f)),
         |fl AS (SELECT doc_id, f,
         |  CASE WHEN f > 0 AND f % 3 = 0 AND
         |    list_sum(list_transform(range(0, nb), k ->
         |      abs(ascii(substr(text,
         |            CAST((k + 7 * (f // 3)) % len AS INT) + 1, 1))
         |        - ascii(substr(text,
         |            CAST((k + 7 * (f // 3 - 1)) % len AS INT) + 1, 1)))))
         |    > 0 THEN 1 ELSE 0 END AS cut
         |  FROM fr),
         |g AS (SELECT doc_id, f,
         |  sum(cut) OVER (PARTITION BY doc_id ORDER BY f) AS grp FROM fl),
         |sc AS (SELECT doc_id, CAST(grp AS BIGINT) AS scene_idx,
         |  CAST(min(f) * 1000 AS BIGINT) AS start_ms,
         |  CAST((max(f) + 1) * 1000 AS BIGINT) AS end_ms
         |  FROM g GROUP BY doc_id, grp),
         |cu AS (SELECT doc_id, u.i AS i,
         |  CAST(u.i * 1700 AS BIGINT) AS cs,
         |  CAST(u.i * 1700 + dur AS BIGINT) AS ce,
         |  CAST(length(substr(text, CAST((u.i * 5) % len AS INT) + 1, 4))
         |    AS BIGINT) AS chars
         |  FROM d, LATERAL unnest(range(0, CAST(nc AS BIGINT))) AS u(i))
         |SELECT sc.doc_id AS media_id, sc.scene_idx, sc.start_ms,
         |  sc.end_ms,
         |  CAST(count(cu.i) AS BIGINT) AS n_cues,
         |  CAST(COALESCE(sum(cu.chars), 0) AS BIGINT) AS cue_chars
         |FROM sc LEFT JOIN cu
         |  ON cu.doc_id = sc.doc_id AND cu.cs < sc.end_ms
         |  AND sc.start_ms < cu.ce
         |GROUP BY sc.doc_id, sc.scene_idx, sc.start_ms, sc.end_ms
         |ORDER BY media_id, scene_idx""".stripMargin
    },
    "srt_parse" -> {
      // cue i: [1700i, 1700i + dur), dur = 1200 + len%800; text =
      // 4 chars cycled from position 5i mod len; overlaps exist
      // exactly when dur > 1700 (len%800 > 500) — nc−1 of them
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 6 AS nc,
         |    1200 + length(text) % 800 AS dur
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |c AS (SELECT *, list_transform(range(0, CAST(nc AS BIGINT)),
         |    i -> CAST(length(substr(text,
         |      CAST((i * 5) % len AS INT) + 1, 4)) AS BIGINT)) AS cl
         |  FROM d)
         |SELECT doc_id AS media_id, CAST(nc AS BIGINT) AS n_cues,
         |  CAST(nc * dur AS BIGINT) AS talk_ms,
         |  CAST((nc - 1) * 1700 + dur AS BIGINT) AS span_ms,
         |  CAST(list_sum(cl) AS BIGINT) AS total_chars,
         |  CAST(list_max(cl) AS BIGINT) AS max_cue_chars,
         |  CAST(CASE WHEN len % 800 > 500 THEN nc - 1 ELSE 0 END
         |    AS BIGINT) AS overlap_cues
         |FROM c ORDER BY media_id""".stripMargin
    },
    "vtt_parse" -> {
      // cue i: [2100i, 2100i + dur), dur = 1500 + len%900; ids on odd
      // cues (nc//2 of them), settings on every third (ceil(nc/3));
      // overlaps exist exactly when dur > 2100 (len%900 > 600)
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 5 AS nc,
         |    1500 + length(text) % 900 AS dur
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |c AS (SELECT *, list_transform(range(0, CAST(nc AS BIGINT)),
         |    i -> CAST(length(substr(text,
         |      CAST((i * 5) % len AS INT) + 1, 4)) AS BIGINT)) AS cl
         |  FROM d)
         |SELECT doc_id AS media_id, CAST(nc AS BIGINT) AS n_cues,
         |  CAST(nc // 2 AS BIGINT) AS id_cues,
         |  CAST((nc + 2) // 3 AS BIGINT) AS settings_cues,
         |  CAST(nc * dur AS BIGINT) AS talk_ms,
         |  CAST((nc - 1) * 2100 + dur AS BIGINT) AS span_ms,
         |  CAST(list_sum(cl) AS BIGINT) AS total_chars,
         |  CAST(CASE WHEN len % 900 > 600 THEN nc - 1 ELSE 0 END
         |    AS BIGINT) AS overlap_cues
         |FROM c ORDER BY media_id""".stripMargin
    },
    "y4m_frame_stats" -> {
      // frame f's luma byte j = text[(j + 11f) mod len]; luma_sum
      // folds all nf frames, delta_sum the nf−1 inter-frame |diff|s
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 16 AS w,
         |    1 + (length(text) // 16) % 16 AS h,
         |    2 + length(text) % 4 AS nf
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, CAST(nf AS BIGINT) AS n_frames,
         |  CAST(list_sum(list_prepend(0, list_transform(
         |    range(0, nf * n), k ->
         |      ascii(substr(text,
         |        CAST((k % n + 11 * (k // n)) % len AS INT) + 1, 1)))))
         |    AS BIGINT) AS luma_sum,
         |  CAST(list_sum(list_prepend(0, list_transform(
         |    range(0, (nf - 1) * n), k ->
         |      abs(ascii(substr(text,
         |          CAST((k % n + 11 * (k // n + 1)) % len AS INT) + 1, 1))
         |        - ascii(substr(text,
         |          CAST((k % n + 11 * (k // n)) % len AS INT) + 1, 1))))))
         |    AS BIGINT) AS delta_sum
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_qoi_pixels" -> {
      // pixel byte k = text[k mod len]; channel c of pixel p is byte
      // 3p+c — the QOI op ladder must be invisible after decode
      {
        def chSum(c: Int): String =
          s"""CAST(list_sum(list_transform(range(0, n), k ->
             |  ascii(substr(text, CAST((3 * k + $c) % len AS INT) + 1, 1))))
             |  AS BIGINT)""".stripMargin
        s"""WITH d AS (
           |  SELECT doc_id, text, length(text) AS len,
           |    1 + length(text) % 24 AS w,
           |    1 + (length(text) // 24) % 24 AS h
           |  FROM documents
           |  WHERE length(text) = strlen(text) AND length(text) > 0),
           |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
           |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
           |  CAST(h AS INT) AS height, CAST(n AS BIGINT) AS n_pixels,
           |  ${chSum(0)} AS sum_r,
           |  ${chSum(1)} AS sum_g,
           |  ${chSum(2)} AS sum_b
           |FROM e ORDER BY media_id""".stripMargin
      }
    },
    "video_shot_cuts" -> {
      // frame f's block k decodes to (v+7, v−4, v) with
      // v = text[(k + 7·(f div 3)) mod len]; the offsets cancel in the
      // inter-frame diff, so boundary delta = 192·Σ_k |v_f − v_f′|
      // over the wb·hb blocks (64 pixels × 3 channels), 0 within a
      // scene
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 8 AS wb,
         |    1 + (length(text) // 8) % 8 AS hb,
         |    4 + length(text) % 5 AS nf
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(wb * hb AS BIGINT) AS nb FROM d),
         |del AS (
         |  SELECT doc_id, nf, f,
         |    CASE WHEN f // 3 = (f - 1) // 3 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(192 * list_sum(list_transform(range(0, nb), k ->
         |      abs(ascii(substr(text,
         |            CAST((k + 7 * (f // 3)) % len AS INT) + 1, 1))
         |        - ascii(substr(text,
         |            CAST((k + 7 * ((f - 1) // 3)) % len AS INT) + 1, 1)))))
         |      AS BIGINT) END AS delta
         |  FROM e, LATERAL unnest(range(1, CAST(nf AS BIGINT))) AS u(f))
         |SELECT doc_id AS media_id, CAST(any_value(nf) AS INT) AS n_frames,
         |  CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS INT)
         |    AS n_cuts,
         |  CAST(COALESCE(min(CASE WHEN delta > 0 THEN f END), -1) AS INT)
         |    AS first_cut,
         |  CAST(max(delta) AS BIGINT) AS max_delta,
         |  CAST(sum(delta) AS BIGINT) AS total_delta
         |FROM del GROUP BY doc_id ORDER BY media_id""".stripMargin
    },
    "video_frame_sample" -> {
      // sampled frame fi (stride 2): Y block k = text[(k+fi) mod len],
      // decoded pixels (v+7, v−4, v) per 64-pixel block — the baseline
      // JPEG oracle arithmetic, once per sampled frame
      def chSum(off: Int): String = {
        val v = "ascii(substr(text, CAST((k + fi) % len AS INT) + 1, 1))"
        val term =
          if (off == 0) v else if (off > 0) s"$v + $off" else s"$v - ${-off}"
        s"""CAST(64 * list_sum(list_transform(range(0, nb), k -> $term))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 8 AS wb,
         |    1 + (length(text) // 8) % 8 AS hb,
         |    1 + length(text) % 5 AS nf
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(wb * hb AS BIGINT) AS nb FROM d),
         |f AS (SELECT doc_id, text, len, wb, hb, nb, nf,
         |        unnest(range(0, CAST(nf AS BIGINT))) AS fi FROM e)
         |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
         |  CAST(nf AS INT) AS n_frames,
         |  CAST(nf * 40 AS BIGINT) AS duration_ms,
         |  CAST(8 * wb AS INT) AS width, CAST(8 * hb AS INT) AS height,
         |  ${chSum(7)} AS sum_r,
         |  ${chSum(-4)} AS sum_g,
         |  ${chSum(0)} AS sum_b
         |FROM f WHERE fi % 2 = 0 ORDER BY media_id, frame_idx""".stripMargin
    },
    "multimodal_decode_mp1" -> {
      // full analytic recompute of the Layer I decode: frame/subband
      // schedules from the text length, codes from text bytes, and the
      // requantization chain in exact power-of-two arithmetic
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS bl FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |fr AS (
        |  SELECT doc_id, text, bl, u.f
        |  FROM d, LATERAL unnest(range(0, 1 + bl % 3)) AS u(f)),
        |sbv AS (
        |  SELECT doc_id, text, bl, f, v.sb
        |  FROM fr, LATERAL unnest(range(0, 1 + (bl + f) % 4)) AS v(sb)),
        |smp AS (
        |  SELECT doc_id, f, sb, w.s, 2 + sb % 3 AS nb, (sb + f) % 5 AS k,
        |    ascii(substr(text,
        |      CAST((f * 97 + sb * 12 + w.s) % bl + 1 AS INT), 1)) AS byte
        |  FROM sbv, LATERAL unnest(range(0, 12)) AS w(s)),
        |val AS (
        |  SELECT doc_id,
        |    byte % (CASE nb WHEN 2 THEN 4 WHEN 3 THEN 8 ELSE 16 END) AS c,
        |    CASE nb WHEN 2 THEN 4.0 WHEN 3 THEN 8.0 ELSE 16.0 END AS p2,
        |    CASE k WHEN 0 THEN 2.0 WHEN 1 THEN 1.0 WHEN 2 THEN 0.5
        |      WHEN 3 THEN 0.25 ELSE 0.125 END AS sf
        |  FROM smp),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS sum_codes,
        |    CAST(sum(CAST(round((c / (p2 / 2) - 1 + 2 / p2)
        |      * (p2 / (p2 - 1)) * sf * 1000000) AS BIGINT)) AS BIGINT)
        |      AS amp_micro
        |  FROM val GROUP BY doc_id),
        |act AS (
        |  SELECT doc_id, count(*) AS n_active FROM sbv GROUP BY doc_id)
        |SELECT d.doc_id AS media_id, 1 + d.bl % 3 AS n_frames,
        |  act.n_active, agg.sum_codes, agg.amp_micro
        |FROM d JOIN act USING (doc_id) JOIN agg USING (doc_id)
        |ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_h264" -> {
      // dims are the fixture's even targets (SPS cropping recovers
      // them exactly); NAL counts from the text-driven slice schedule
      """SELECT doc_id AS media_id,
        |  CAST(2 * (1 + length(text) % 32) AS INT) AS decoded_w,
        |  CAST(2 * (1 + (length(text) // 64) % 32) AS INT) AS decoded_h,
        |  CAST(3 + length(text) % 7 AS INT) AS n_nals,
        |  CAST(1 AS INT) AS n_idr,
        |  CAST(1 + length(text) % 7 AS INT) AS n_vcl
        |FROM documents
        |WHERE length(text) = strlen(text) AND length(text) > 0
        |ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_h264_pixels" -> {
      // every sample is predicted from its WRITE index; the weighted
      // luma sum replays the MB raster scatter: sample k lands at
      // x = (mb % wmb)·16 + k%16, y = (mb // wmb)·16 + (k%256)//16
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + length(text) % 4 AS wmb,
        |    1 + (length(text) // 4) % 4 AS hmb
        |  FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |e AS (
        |  SELECT *, CAST(16 * wmb AS INT) AS w, CAST(16 * hmb AS INT) AS h,
        |    CAST(256 * wmb * hmb AS BIGINT) AS ny,
        |    CAST(64 * wmb * hmb AS BIGINT) AS nc
        |  FROM d)
        |SELECT doc_id AS media_id, w AS decoded_w, h AS decoded_h,
        |  CAST(list_sum(list_transform(range(0, ny), k ->
        |    ascii(substr(text, CAST((k * 31 + 7) % len AS INT) + 1, 1))))
        |    AS BIGINT) AS sum_y,
        |  CAST(list_sum(list_transform(range(0, ny), k ->
        |    (((k // 256) % wmb) * 16 + (k % 256) % 16
        |      + 3 * (((k // 256) // wmb) * 16 + (k % 256) // 16) + 1)
        |    * ascii(substr(text, CAST((k * 31 + 7) % len AS INT) + 1, 1))))
        |    AS BIGINT) AS wsum_y,
        |  CAST(list_sum(list_transform(range(0, nc), u ->
        |    ascii(substr(text, CAST((u * 13) % len AS INT) + 1, 1))))
        |    AS BIGINT) AS sum_cb,
        |  CAST(list_sum(list_transform(range(0, nc), u ->
        |    ascii(substr(text, CAST((u * 17 + 3) % len AS INT) + 1, 1))))
        |    AS BIGINT) AS sum_cr
        |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_mp2" -> {
      // full analytic recompute of the Layer II decode: the fixture's
      // active subbands 0/4/12/24 map into Table 3-B.2a step lists,
      // scfsi selects the effective per-part scalefactor slot, and the
      // requantization chain is the same power-of-two-exact arithmetic
      // as mp1 with C = g/m and D = 0.5 (grouped) / 2/g (ungrouped)
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS bl FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |fr AS (
        |  SELECT doc_id, text, bl, u.f
        |  FROM d, LATERAL unnest(range(0, 1 + bl % 3)) AS u(f)),
        |sbv AS (
        |  SELECT doc_id, text, bl, f, v.sb,
        |    1 + (bl + v.sb + f) % (CASE WHEN v.sb = 24 THEN 2 ELSE 4 END)
        |      AS idx,
        |    (bl + v.sb + f) % 4 AS scfsi
        |  FROM fr, LATERAL unnest([0, 4, 12, 24]) AS v(sb)
        |  WHERE v.sb < CASE (bl + f) % 4 WHEN 0 THEN 1 WHEN 1 THEN 5
        |    WHEN 2 THEN 13 ELSE 25 END),
        |sbq AS (
        |  SELECT *, CASE WHEN sb = 0 THEN ([3, 7, 15, 31])[idx]
        |      WHEN sb = 24 THEN ([3, 5])[idx]
        |      ELSE ([3, 5, 7, 9])[idx] END AS m
        |  FROM sbv),
        |smp AS (
        |  SELECT doc_id, f, sb, m, scfsi, w.i, w.i // 12 AS part,
        |    ascii(substr(text,
        |      CAST((f * 89 + sb * 36 + w.i) % bl + 1 AS INT), 1)) % m
        |      AS c
        |  FROM sbq, LATERAL unnest(range(0, 36)) AS w(i)),
        |val AS (
        |  SELECT doc_id, c, m,
        |    CASE m WHEN 3 THEN 4.0 WHEN 5 THEN 8.0 WHEN 7 THEN 8.0
        |      WHEN 9 THEN 16.0 WHEN 15 THEN 16.0 ELSE 32.0 END AS g,
        |    CASE (sb + f + (CASE scfsi
        |        WHEN 0 THEN part
        |        WHEN 1 THEN CASE WHEN part = 2 THEN 2 ELSE 0 END
        |        WHEN 2 THEN 0
        |        ELSE CASE WHEN part = 0 THEN 0 ELSE 1 END END)) % 5
        |      WHEN 0 THEN 2.0 WHEN 1 THEN 1.0 WHEN 2 THEN 0.5
        |      WHEN 3 THEN 0.25 ELSE 0.125 END AS sf
        |  FROM smp),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS sum_codes,
        |    CAST(sum(CAST(round((c / (g / 2) - 1
        |      + CASE WHEN m IN (3, 5, 9) THEN 0.5 ELSE 2 / g END)
        |      * (g / m) * sf * 1000000) AS BIGINT)) AS BIGINT)
        |      AS amp_micro
        |  FROM val GROUP BY doc_id),
        |act AS (
        |  SELECT doc_id, count(*) AS n_active,
        |    CAST(sum(CASE WHEN m IN (3, 5, 9) THEN 12 ELSE 0 END)
        |      AS BIGINT) AS n_grouped
        |  FROM sbq GROUP BY doc_id)
        |SELECT d.doc_id AS media_id, 1 + d.bl % 3 AS n_frames,
        |  act.n_active, act.n_grouped, agg.sum_codes, agg.amp_micro
        |FROM d JOIN act USING (doc_id) JOIN agg USING (doc_id)
        |ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_webp" -> {
      // chunk body = variant header (10 B for VP8 /VP8X, 5 B for VP8L)
      // + text; container = 12 B RIFF/WEBP + 8 B chunk header + body,
      // word-aligned
      """WITH d AS (
        |  SELECT doc_id, length(text) AS len,
        |    CASE WHEN doc_id % 3 = 1 THEN 5 ELSE 10 END + length(text)
        |      AS chunk
        |  FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id AS media_id, 'image/webp' AS kind,
        |  CAST(20 + chunk + (chunk % 2) AS BIGINT) AS n_bytes,
        |  CAST(1 + len % 64 AS INT) AS decoded_w,
        |  CAST(1 + (len // 64) % 64 AS INT) AS decoded_h
        |FROM d ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_webp_pixels" -> {
      // channel c of pixel k: first row repeats text[c], the rest
      // cycle the text bytes 3-at-a-time — the encode features
      // (subtract-green / cache / LZ77) must be invisible after decode
      def chSum(c: Int): String =
        s"""CAST(w * ascii(substr(text, CAST($c % len AS INT) + 1, 1))
           |  + list_sum(list_prepend(0, list_transform(range(0, n - w),
           |      j -> ascii(substr(text,
           |        CAST((3 * j + $c) % len AS INT) + 1, 1)))))
           |  AS BIGINT)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS decoded_w,
         |  CAST(h AS INT) AS decoded_h, n AS n_pixels,
         |  ${chSum(0)} AS sum_r,
         |  ${chSum(1)} AS sum_g,
         |  ${chSum(2)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_tiff_packbits" -> {
      // pixel byte k = text[(k/4) mod len]; channel c of pixel p is
      // byte 3p+c, so sum_c = Σ_p text[((3p+c)/4) mod len]
      def chSum(c: Int): String = {
        val idx = if (c == 0) "(3*k)//4" else s"(3*k + $c)//4"
        s"""CAST(list_sum(list_transform(range(0, n), k ->
           |  ascii(substr(text, CAST(($idx) % len AS INT) + 1, 1))))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 24 AS w,
         |    1 + (length(text) // 24) % 24 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, CAST(n AS BIGINT) AS n_pixels,
         |  ${chSum(0)} AS sum_r,
         |  ${chSum(1)} AS sum_g,
         |  ${chSum(2)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_tiff_lzw" -> {
      // the LZW round trip is lossless, so the oracle is the same
      // raster arithmetic as the packbits twin — any LZW bit-order /
      // width-schedule / predictor bug breaks the channel sums
      def chSum(c: Int): String = {
        val idx = if (c == 0) "(3*k)//4" else s"(3*k + $c)//4"
        s"""CAST(list_sum(list_transform(range(0, n), k ->
           |  ascii(substr(text, CAST(($idx) % len AS INT) + 1, 1))))
           |  AS BIGINT)""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 24 AS w,
         |    1 + (length(text) // 24) % 24 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d)
         |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height, CAST(n AS BIGINT) AS n_pixels,
         |  ${chSum(0)} AS sum_r,
         |  ${chSum(1)} AS sum_g,
         |  ${chSum(2)} AS sum_b
         |FROM e ORDER BY media_id""".stripMargin
    },
    "audio_resample" -> {
      // output i at source position i·8000/6000: idx/frac from exact
      // rational division, clamped at the tail; every value integer
      val v =
        """((ascii(substr(text, CAST(least((i*8000)//6000, len-1) AS INT) + 1, 1))
          |    * (6000 - (i*8000)%6000)
          |  + ascii(substr(text, CAST(least((i*8000)//6000 + 1, len-1) AS INT) + 1, 1))
          |    * ((i*8000)%6000)) // 6000)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |r AS (SELECT doc_id, text, len,
         |  greatest(len * 6000 // 8000, 1) AS n_out FROM d),
         |x AS (SELECT doc_id, len, n_out,
         |  list_transform(range(0, n_out), i -> $v) AS vals FROM r)
         |SELECT doc_id AS media_id, CAST(8000 AS INT) AS src_rate,
         |  CAST(6000 AS INT) AS dst_rate, CAST(len AS BIGINT) AS n_in,
         |  CAST(n_out AS BIGINT) AS n_out,
         |  CAST(list_sum(vals) AS BIGINT) AS sum_out,
         |  CAST(list_max(vals) AS INT) AS peak_out
         |FROM x ORDER BY media_id""".stripMargin
    },
    "image_quality_gate" -> {
      // per-pixel luma = (r+g+b)//3 over the cycled text bytes; mean,
      // contrast and the keep rule all in integer arithmetic
      val lumas =
        """list_transform(range(0, n), k ->
          |  ( ascii(substr(text, CAST((3*k)     % len AS INT) + 1, 1))
          |  + ascii(substr(text, CAST((3*k + 1) % len AS INT) + 1, 1))
          |  + ascii(substr(text, CAST((3*k + 2) % len AS INT) + 1, 1))) // 3)"""
          .stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 32 AS w,
         |    1 + (length(text) // 32) % 32 AS h
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d),
         |m AS (SELECT doc_id, w, h,
         |  CAST(list_sum(l) // n AS INT) AS mean_luma,
         |  CAST(list_max(l) - list_min(l) AS INT) AS contrast
         |  FROM (SELECT *, $lumas AS l FROM e))
         |SELECT doc_id AS media_id, 'image/png' AS kind,
         |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  mean_luma, contrast, TRUE AS decode_ok,
         |  (w >= 8 AND h >= 8 AND mean_luma BETWEEN 16 AND 240
         |    AND contrast >= 8) AS keep
         |FROM m ORDER BY media_id""".stripMargin
    },
    "multimodal_exif_orientation" ->
      """SELECT doc_id AS media_id,
        |  CAST(1 + length(text) % 8 AS INT) AS orientation,
        |  CAST(1 + length(text) % 64 AS INT) AS decoded_w,
        |  CAST(1 + (length(text) // 64) % 64 AS INT) AS decoded_h
        |FROM documents
        |WHERE length(text) = strlen(text) AND length(text) > 0
        |ORDER BY media_id""".stripMargin,
    "multimodal_id3_tags" ->
      """SELECT doc_id AS media_id,
        |  substr(text, 1, 16) AS title,
        |  substr(text, greatest(length(text) - 8, 0) + 1, 8) AS artist,
        |  CAST(1 + length(text) % 16 AS INT) AS n_frames
        |FROM documents
        |WHERE length(text) = strlen(text) AND length(text) > 0
        |ORDER BY media_id""".stripMargin,
    // the file + gzip layers must be transparent: identical facts
    "media_ingest_files" -> MediaDagOracle,
    "media_ingest_dag" -> MediaDagOracle,
    "multimodal_decode_png_types" -> {
      // gray (id%3=0): v = text[k mod len] replicated; truecolor (1):
      // rgb byte j = text[j mod len]; palette (2): e = v mod 64 →
      // (e, 2e mod 256, 3e mod 256)
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    1 + length(text) % 24 AS w,
         |    1 + (length(text) // 24) % 24 AS h,
         |    doc_id % 3 AS ct
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *, CAST(w * h AS BIGINT) AS n FROM d),
         |v AS (SELECT doc_id, ct, w, h, n,
         |  CASE WHEN ct = 1 THEN NULL
         |       ELSE list_transform(range(0, n), k ->
         |         ascii(substr(text, CAST(k % len AS INT) + 1, 1))) END
         |    AS px,
         |  text, len FROM e)
         |SELECT doc_id AS media_id, CAST(ct AS INT) AS color_type,
         |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  n AS n_pixels,
         |  CAST(CASE ct
         |    WHEN 0 THEN list_sum(px)
         |    WHEN 1 THEN list_sum(list_transform(range(0, n), k ->
         |      ascii(substr(text, CAST((3 * k) % len AS INT) + 1, 1))))
         |    ELSE list_sum(list_transform(px, x -> x % 64)) END
         |    AS BIGINT) AS sum_r,
         |  CAST(CASE ct
         |    WHEN 0 THEN list_sum(px)
         |    WHEN 1 THEN list_sum(list_transform(range(0, n), k ->
         |      ascii(substr(text, CAST((3 * k + 1) % len AS INT) + 1, 1))))
         |    ELSE list_sum(list_transform(px, x -> (2 * (x % 64)) % 256))
         |    END AS BIGINT) AS sum_g,
         |  CAST(CASE ct
         |    WHEN 0 THEN list_sum(px)
         |    WHEN 1 THEN list_sum(list_transform(range(0, n), k ->
         |      ascii(substr(text, CAST((3 * k + 2) % len AS INT) + 1, 1))))
         |    ELSE list_sum(list_transform(px, x -> (3 * (x % 64)) % 256))
         |    END AS BIGINT) AS sum_b
         |FROM v ORDER BY media_id""".stripMargin
    },
    "ogg_opus_meta" -> {
      // closed-form header facts: channels = 1 + id%2, preskip 312,
      // rate by len parity, 2 tags + LICENSE on ids ≡ 0 (mod 3),
      // title = first min(8, len) chars
      """SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(312 AS INT) AS pre_skip,
        |  CAST(CASE WHEN length(text) % 2 = 0 THEN 48000 ELSE 24000 END
        |    AS BIGINT) AS input_rate,
        |  'graft 1.0' AS vendor,
        |  CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_tags,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS has_license,
        |  CAST(least(8, length(text)) AS BIGINT) AS title_chars
        |FROM documents
        |WHERE length(text) = strlen(text) AND length(text) > 0
        |ORDER BY media_id""".stripMargin
    },
    "ogg_parse" -> {
      // np = 1 + len%5 packets; packet i is 1 + (len + 13i) % 300
      // bytes — except packet 0 on doc_id ≡ 0 (mod 7), which is
      // 70 000 bytes and spans 2 pages (65 025 + 4 975); granule of
      // packet i is 960(i+1); reassembly is lossless → intact = 1
      s"""WITH d AS (
         |  SELECT doc_id, length(text) AS len,
         |    1 + length(text) % 5 AS np,
         |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS big
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |e AS (SELECT *,
         |  CAST(list_sum(list_transform(range(0, CAST(np AS BIGINT)),
         |    i -> CASE WHEN i = 0 AND big = 1 THEN 70000
         |         ELSE 1 + (len + i * 13) % 300 END)) AS BIGINT)
         |    AS total_payload
         |  FROM d)
         |SELECT doc_id AS media_id,
         |  CAST(np + big AS BIGINT) AS n_pages,
         |  CAST(np AS BIGINT) AS n_packets,
         |  total_payload,
         |  CAST(np * 960 AS BIGINT) AS last_granule,
         |  CAST(big AS BIGINT) AS continued_pages,
         |  CAST(1 AS BIGINT) AS intact
         |FROM e ORDER BY media_id""".stripMargin
    },
    "multimodal_decode_flac" -> {
      // lossless round trip: sample i = (ascii − 79)·400, so every
      // readout computes straight from the text
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    list_transform(range(0, length(text)), i ->
         |      (ascii(substr(text, CAST(i AS INT) + 1, 1)) - 79) * 400)
         |      AS sm
         |  FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0)
         |SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
         |  CAST(len AS BIGINT) AS n_samples,
         |  CAST(list_sum(sm) AS BIGINT) AS sum_s,
         |  CAST(list_min(sm) AS BIGINT) AS min_s,
         |  CAST(list_max(sm) AS BIGINT) AS max_s
         |FROM d ORDER BY media_id""".stripMargin
    },
    "audio_vad_segments" -> {
      // activity per frame as in audio_frame_energy; then the bridge-1
      // fold replayed verbatim: state [n_segs, cur_len, max_len, gap]
      val acts =
        """list_transform(range(0, (len + 255) // 256), f ->
          |  CASE WHEN 2 * list_sum(list_transform(
          |    range(f * 256, least((f + 1) * 256, len)),
          |    k -> abs(128 - ascii(substr(text, CAST(k AS INT) + 1, 1)))))
          |    > 40 * least(256, len - f * 256) THEN 1 ELSE 0 END)"""
          .stripMargin
      // list_reduce's seed must share the element type, so each
      // activity rides as a 1-element BIGINT list and the state is a
      // 4-element one
      val fold =
        """list_reduce(list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT),
          |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
          |  list_transform(acts, a -> [CAST(a AS BIGINT)])), (st, e) ->
          |  CASE
          |    WHEN e[1] = 1 THEN
          |      [st[1] + CASE WHEN st[2] = 0 THEN 1 ELSE 0 END,
          |       st[2] + st[4] + 1, st[3], CAST(0 AS BIGINT)]
          |    WHEN st[2] > 0 AND st[4] = 0 THEN
          |      [st[1], st[2], st[3], CAST(1 AS BIGINT)]
          |    WHEN st[2] > 0 THEN
          |      [st[1], CAST(0 AS BIGINT), greatest(st[3], st[2]),
          |       CAST(0 AS BIGINT)]
          |    ELSE st END)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |m AS (SELECT doc_id, len, (len + 255) // 256 AS nf,
         |  $acts AS acts FROM d),
         |f AS (SELECT doc_id, nf, acts, $fold AS st FROM m)
         |SELECT doc_id AS media_id, CAST(nf AS INT) AS n_frames,
         |  CAST(st[1] AS INT) AS n_segments,
         |  CAST(greatest(st[3], st[2]) AS INT) AS max_seg_frames,
         |  CAST(list_sum(acts) AS INT) AS active_frames,
         |  CAST(list_sum(acts) * 1000000 // nf AS BIGINT) AS speech_ppm
         |FROM f ORDER BY media_id""".stripMargin
    },
    "audio_frame_energy" -> {
      // frame f covers samples [256f, min(256(f+1), len)); energy =
      // Σ|v−128|; a frame is active when 2·energy > 40·samples
      val frames =
        """list_transform(range(0, (len + 255) // 256), f ->
          |  {'fl': least(256, len - f * 256),
          |   'e': list_sum(list_transform(
          |     range(f * 256, least((f + 1) * 256, len)),
          |     k -> abs(128 - ascii(substr(text, CAST(k AS INT) + 1, 1)))))})"""
          .stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE length(text) = strlen(text) AND length(text) > 0),
         |m AS (SELECT doc_id, len, $frames AS fr FROM d)
         |SELECT doc_id AS media_id,
         |  CAST((len + 255) // 256 AS INT) AS n_frames,
         |  CAST(list_sum(list_transform(fr,
         |    s -> CASE WHEN 2 * s.e > 40 * s.fl THEN 1 ELSE 0 END))
         |    AS INT) AS active_frames,
         |  CAST(list_max(list_transform(fr, s -> s.e)) AS BIGINT)
         |    AS max_energy,
         |  CAST(list_sum(list_transform(fr, s -> s.e)) AS BIGINT)
         |    AS total_energy
         |FROM m ORDER BY media_id""".stripMargin
    },
    "audio_pitch_autocorr" -> {
      // square wave of period p = 2(1 + len%8): the smallest perfect
      // lag IS p, and every centered sample squares to 100² = 10000
      """SELECT doc_id AS media_id, CAST(128 AS BIGINT) AS n_samples,
        |  CAST(2 * (1 + length(text) % 8) AS INT) AS period,
        |  CAST((128 - 2 * (1 + length(text) % 8)) * 10000 AS BIGINT)
        |    AS corr_at_period
        |FROM documents ORDER BY media_id""".stripMargin
    },
    "frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id AS media_id, i AS frame_idx,
         |    substr(text, CAST(i AS INT) * 64 + 1, 64) AS frame
         |  FROM documents,
         |    LATERAL unnest(range(0, (length(text) + 63) // 64)) AS u(i)
         |  WHERE i % 3 = 0 AND length(text) = strlen(text) AND length(text) > 0)
         |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
         |  CAST(length(frame) AS INT) AS frame_len,
         |  ${charFoldDuck("frame")} AS frame_hash,
         |  substr(frame, 1, 8) AS frame_head
         |FROM f ORDER BY media_id, frame_idx""".stripMargin
  )
}
