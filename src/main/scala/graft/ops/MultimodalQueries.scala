package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads are opaque `BinaryType` columns
  * with typed metadata travelling alongside. As of round 9 the decode step
  * is REAL for images — `mm_decode` pushes genuine PNG bytes through
  * `javax.imageio` (JDK-only, no external codec) inside the batched
  * mapPartitions pattern, oracle-gated end to end — and as of round 12 for
  * audio: `mm_audio_decode` round-trips genuine RIFF/WAVE PCM through
  * `javax.sound.sampled`, same pattern. The remaining `stub_` columns in
  * the older entries are clearly marked and kept only where the decode
  * genuinely needs a codec the JDK lacks (compressed audio mp3/ogg, video
  * containers); the Spark-side shape — binary columns, schema, batched
  * per-partition processing, partition-parallel feature extraction — is
  * real and tested throughout.
  */
object MultimodalQueries {

  /** Metadata over a binary media column (here fabricated from text bytes —
    * the shape a real corpus would have: (id, media BLOB, meta...)).
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media", "source")
      .selectExpr(
        "doc_id", "source",
        "octet_length(media) AS n_bytes",
        "md5(media) AS content_hash",
        // STUB: deterministic fake decode — a real pipeline would decode the
        // codec header here; width/height derived from the id keep the
        // plumbing testable end-to-end.
        "CAST(320 + doc_id % 640 AS INT) AS stub_width",
        "CAST(240 + doc_id % 480 AS INT) AS stub_height")

  /** Batched per-partition feature extraction over the binary column — the
    * mapPartitions pattern a real decoder (JNI / native lib) would plug into.
    * The extracted "features" are exact byte statistics so the oracle can
    * verify the plumbing.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val src = Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("n_vowels", IntegerType),
      StructField("n_spaces", IntegerType)))
    implicit val enc = Encoders.row(outSchema)
    src.mapPartitions { batch =>
      // Real decoders amortize per-batch setup here (codec init, model load):
      // one instantiation per partition, then a tight loop over records.
      batch.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        var vowels = 0; var spaces = 0
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i)
          if (b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u') vowels += 1
          else if (b == ' ') spaces += 1
          i += 1
        }
        Row(id, bytes.length, vowels, spaces)
      }
    }
  }

  /** Frame-sampling shape: one row per sampled "frame" (every 64th byte
    * offset) — the explode pattern video frame extraction uses, with
    * deterministic stub content.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media")
      .selectExpr("doc_id",
        "posexplode(transform(sequence(0, CAST(floor((octet_length(media) - 1) / 64) AS INT)), " +
          "i -> CAST(substring(media, i * 64 + 1, 1) AS STRING)))")
      .selectExpr("doc_id", "pos AS frame_idx", "col AS frame_stub")

  /** Resize shape: deterministic stub downsample of the binary payload (every
    * 4th byte) — the transform a real image resize would slot into, with the
    * output stored back as a binary column plus its new "dimensions".
    */
  def resizeStub(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media")
      .selectExpr("doc_id",
        "octet_length(media) AS orig_bytes",
        // STUB decode+resize: subsample every 4th byte via substr positions
        "CAST(concat_ws('', transform(sequence(1, octet_length(media), 4), " +
          "i -> CAST(substring(media, i, 1) AS STRING))) AS BINARY) AS resized")
      .selectExpr("doc_id", "orig_bytes",
        "octet_length(resized) AS resized_bytes",
        "md5(resized) AS resized_hash")

  /** Byte-distribution statistics over the binary payload — a fully REAL
    * multimodal operator (no decode stub): corruption / content-type
    * heuristics run on exactly these signals. Bytes are read as hex pairs of
    * `hex(media)`, so it works on arbitrary binary, not just text; all
    * outputs are exact integers plus one single-division fraction
    * (deterministic in both engines). Max-frequency is the longest run in
    * the SORTED byte array — one array_sort + a linear fold (same idiom as
    * `text_repetition`'s max_tok_n: equal values are adjacent after sorting),
    * O(n log n) per document instead of the O(distinct x bytes) nested
    * filter it replaced — embarrassingly parallel.
    */
  def byteStats(s: SparkSession, dir: String): DataFrame = {
    val bytes = Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media")
      .selectExpr("doc_id", "octet_length(media) AS n_bytes", "hex(media) AS hx")
      .selectExpr("doc_id", "n_bytes",
        "transform(sequence(0, n_bytes - 1), i -> substring(hx, 2 * i + 1, 2)) AS bytes")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // barrier: hex+transform once
    val stats = bytes
      .selectExpr("doc_id", "n_bytes",
        "CAST(size(array_distinct(bytes)) AS INT) AS n_distinct_bytes",
        """CAST(aggregate(array_sort(bytes),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          |  (a, x) -> named_struct(
          |    'prev', x,
          |    'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1),
          |    'best', greatest(a.best, IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1))),
          |  a -> a.best) AS INT) AS max_byte_n""".stripMargin)
      .selectExpr("doc_id", "n_bytes", "n_distinct_bytes", "max_byte_n",
        "CASE WHEN n_bytes = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(max_byte_n AS DOUBLE) / n_bytes END AS top_byte_frac")
    Lifecycle.released(stats, bytes)
  }

  /** Perceptual near-dup over the binary media column — the image-dedup
    * shape (aHash): sample 60 evenly-spaced "pixels" (bytes) from the
    * payload, set bit k when pixel k is above the sample mean (exact
    * integer compare: 60*px > sum — no IEEE mean), yielding a 60-bit
    * signature whose hamming distance tracks perceptual similarity. Pairs
    * within hamming <= 3 are found with the same pigeonhole banding as
    * SimHash: 4 disjoint 15-bit bands — a pair differing in <= 3 bits
    * leaves at least one band untouched, so the banded equi-join is
    * LOSSLESS; candidates are verified by exact bit_count. On a real image
    * corpus only the pixel-sampling line changes (decode + luma grid);
    * signature, banding, and verification are payload-agnostic.
    *
    * Scale shape: signatures are one map-side pass (hex + two bounded
    * folds behind barriers), the join input is (band, key) pairs — 4 rows
    * per document, never all-pairs.
    */
  /** The aHash signature kernel over any frame with (doc_id, media BINARY):
    * one map-side projection through the codegen'd [[graft.functions.AHash60]]
    * expression (a tight primitive loop; the equivalent SQL higher-order
    * chain evaluates 60 interpreted substring/instr lambdas per row — the
    * expression-vs-SQL bit-equality is spec-pinned, and the DuckDB oracle
    * still re-derives signatures from hex pairs).
    */
  def ahashSigsFrom(media: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.registerAll(media.sparkSession)
    media.selectExpr("doc_id", "ahash60(media) AS sig")
  }

  /** Per-document aHash signatures as a catalog entry: hash-compared against
    * the DuckDB re-derivation, so ANY arithmetic divergence in the signature
    * pipeline fails the gate even when the corpus has no near-dup pairs (the
    * synthetic docs' variants differ in enough sampled bytes that the pair
    * query below is legitimately empty at hamming <= 3 — its positive
    * coverage is spec-pinned on constructed payloads instead).
    */
  def ahashSigs(s: SparkSession, dir: String): DataFrame =
    ahashSigsFrom(Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media"))

  def ahashDedup(s: SparkSession, dir: String, hammingMax: Int = 3): DataFrame = {
    val (out, sigs) = ahashDedupFrom(Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media"), hammingMax)
    Lifecycle.released(out, sigs)
  }

  /** Lazy pair kernel over any (doc_id, media BINARY) frame: (result,
    * persisted signature barrier) — callers release the barrier themselves.
    */
  def ahashDedupFrom(media: DataFrame, hammingMax: Int = 3)
      : (DataFrame, DataFrame) = {
    require(hammingMax >= 0 && hammingMax < 4,
      "4x15 banding is lossless only for hamming <= 3")
    val sigs = ahashSigsFrom(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the 8-byte sig RIDES the band rows, so the verify step is computed
    // directly on the band join's output — no join-back against the
    // signature table per side (two whole shuffled joins dropped; guide
    // §2.3 "shuffle keys and metadata instead of payloads" in reverse: the
    // metadata IS small enough to ship). The exact-hamming filter then runs
    // BEFORE the distinct, so the dedup shuffle carries only verified
    // pairs; hamming is a function of (doc_a, doc_b), so distinct over
    // (pair, hamming) has exactly the old candidate-distinct's cardinality.
    val bands = sigs.selectExpr("doc_id", "sig",
      "explode(transform(sequence(0, 3), b -> " +
        "struct(b AS band, shiftright(sig, 15 * b) & 32767 AS bkey))) AS c")
      .select(col("doc_id"), col("sig"), col("c.band").as("band"), col("c.bkey").as("bkey"))
    val out = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.sig ^ b.sig) AS INT)").as("hamming"))
      .filter(col("hamming") <= hammingMax)
      .distinct()
    (out, sigs)
  }

  /** Cross-video content-ID — what per-frame perceptual hashing is FOR:
    * two videos match when they share near-identical FRAMES, regardless of
    * surrounding content (the YouTube-Content-ID / clip-reuse shape).
    * Videos are constructed frame-aligned from `customer` (the corpus has
    * no real video payloads — the rel_* pattern): per key g, videos 2g and
    * 2g+1 embed 1 + g%3 SHARED 64-byte frames at different positions
    * between video-unique frames. The pipeline is the real one end-to-end:
    * fixed-size frame extraction (posexplode of byte windows), the
    * codegen'd `ahash60` per frame, the SAME lossless 4x15-bit pigeonhole
    * banding as [[ahashDedupFrom]] keyed by (video, frame), exact
    * bit_count verification, then aggregation to video pairs
    * (n_shared_frames, min_hamming). The oracle verifies ALL cross-video
    * frame pairs (quadratic is fine at gate scale; banding is lossless at
    * hamming <= 3, so the sets must match exactly).
    *
    * Scale shape: frames are map-side; the join input is 4 band rows per
    * frame, never frame-pairs; verification touches only banded
    * candidates — the mm_ahash_dedup discipline, one level down the
    * granularity ladder.
    */
  def frameDedup(s: SparkSession, dir: String, hammingMax: Int = 3): DataFrame = {
    val (out, sigs) = frameDedupPlan(s, dir, hammingMax)
    Lifecycle.released(out, sigs)
  }

  /** [[frameDedup]]'s lazy plan twin: (result, persisted signature barrier)
    * — callers release the barrier (the public entry checkpoints).
    */
  private[graft] def frameDedupPlan(s: SparkSession, dir: String,
      hammingMax: Int = 3): (DataFrame, DataFrame) = {
    require(hammingMax >= 0 && hammingMax < 4,
      "4x15 banding is lossless only for hamming <= 3")
    graft.functions.GraftFunctions.registerAll(s)
    // frame bytes are md5-derived from the frame's seed (4 x 16 bytes = a
    // 64-byte pseudo-random payload): structured ASCII fill would make
    // unrelated frames aHash-collide (above-mean bits track the fill, not
    // the id), while hash bytes give 0 unintended hamming<=3 pairs across
    // thousands of distinct frames (measured)
    val frames = Tables(s, dir, "customer").selectExpr("c_custkey AS g")
      .selectExpr("g", "explode(array(0, 1)) AS side")
      .selectExpr("2 * g + side AS doc_id", "g", "side", "CAST(1 + g % 3 AS INT) AS k")
      .selectExpr("doc_id",
        """concat(
          |  transform(sequence(1, CASE WHEN side = 0 THEN 2 ELSE 1 END),
          |    j -> concat('u', doc_id, 'f', j)),
          |  slice(transform(sequence(1, 3), j -> concat('s', g, 'f', j)), 1, k),
          |  array(concat('u', doc_id, 'ft'))) AS fl""".stripMargin)
      .selectExpr("doc_id", "posexplode(fl) AS (fi, seed)")
      .selectExpr("doc_id", "CAST(fi + 1 AS INT) AS frame_idx",
        "unhex(concat(md5(concat(seed, '0')), md5(concat(seed, '1')), " +
          "md5(concat(seed, '2')), md5(concat(seed, '3')))) AS media")
    val sigs = frames.selectExpr("doc_id", "frame_idx", "ahash60(media) AS sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sig rides the band rows (the [[ahashDedupFrom]] shape, one granularity
    // down): hamming is verified straight off the band join — the two
    // (doc, frame)-keyed join-backs are gone — and the exact filter runs
    // before the frame-pair distinct, which keeps its old cardinality
    // because hamming is a function of the frame pair.
    val bands = sigs.selectExpr("doc_id", "frame_idx", "sig",
      "explode(transform(sequence(0, 3), b -> " +
        "struct(b AS band, shiftright(sig, 15 * b) & 32767 AS bkey))) AS c")
      .select(col("doc_id"), col("frame_idx"), col("sig"),
        col("c.band").as("band"), col("c.bkey").as("bkey"))
    val out = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.frame_idx").as("fa"),
        col("b.doc_id").as("doc_b"), col("b.frame_idx").as("fb"),
        expr("CAST(bit_count(a.sig ^ b.sig) AS INT)").as("hamming"))
      .filter(col("hamming") <= hammingMax)
      .distinct()
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_frames"), min(col("hamming")).as("min_hamming"))
    (out, sigs)
  }

  /** Deterministic grayscale pixel grids derived from `documents` — the
    * md5-pixel formula BOTH engines share: image (w, h) = (8 + id%9,
    * 8 + id%7); row y's pixels are the first w bytes of md5("<id>:<y>").
    * Built as pure SQL so the DuckDB oracle can re-derive every pixel; the
    * codec round trip below is what turns them into REAL image files.
    */
  private[ops] def pixelGrids(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .selectExpr("doc_id",
        "CAST(8 + doc_id % 9 AS INT) AS w", "CAST(8 + doc_id % 7 AS INT) AS h")
      .selectExpr("doc_id", "w", "h",
        "aggregate(transform(sequence(0, h - 1), " +
          "y -> substring(unhex(md5(concat(CAST(doc_id AS STRING), ':', CAST(y AS STRING)))), 1, w)), " +
          "unhex(''), (a, x) -> concat(a, x)) AS raster")

  /** REAL PNG encode over (doc_id, w, h, raster): each grid is rendered
    * through `javax.imageio` (TYPE_BYTE_GRAY `BufferedImage` → PNG bytes)
    * inside the batched mapPartitions pattern — codec state is initialized
    * once per partition, exactly where a native decoder would amortize its
    * setup. Exists to manufacture genuine image payloads on-engine (the
    * testdata ships no media bytes); [[decodePngs]] is the production-shaped
    * operator under test.
    */
  private[ops] def encodePngs(grids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("png", BinaryType)))
    implicit val enc = Encoders.row(outSchema)
    grids.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false) // no executor-disk scratch
      batch.map { r =>
        val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
        val raster = r.getAs[Array[Byte]](3)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, w, h, raster)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row(id, baos.toByteArray)
      }
    }
  }

  /** REAL PNG decode over (doc_id, png BINARY) — the operator a multimodal
    * curation pipeline runs at scale: parse the codec container, surface the
    * decoder-reported dimensions, and hand the luma plane downstream as a
    * plain BINARY column (here into the codegen'd aHash). JDK-only
    * (`javax.imageio`), batched per partition; 8-bit grayscale PNG is
    * lossless, so every decoded byte is oracle-checkable against the pixel
    * formula that generated it.
    */
  private[ops] def decodePngs(pngs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_luma", LongType),
      StructField("luma", BinaryType)))
    implicit val enc = Encoders.row(outSchema)
    pngs.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, s"doc $id: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val luma = new Array[Byte](w * h)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = img.getRaster.getSample(x, y, 0)
            luma(y * w + x) = v.toByte
            sum += v
            x += 1
          }
          y += 1
        }
        Row(id, w, h, sum, luma)
      }
    }
  }

  /** Catalog entry: the full encode → decode → feature chain — real PNG
    * bytes through a real codec, ending in the decoder-reported dimensions,
    * the exact luma sum, and the codegen'd aHash of the DECODED pixel
    * plane. The DuckDB oracle recomputes all four from the md5 pixel
    * formula alone (it never sees a PNG): a hash match proves the
    * grayscale round trip was byte-lossless end-to-end — the decode path
    * is no longer a stub.
    */
  def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    decodePngs(encodePngs(pixelGrids(s, dir)))
      .selectExpr("doc_id", "width", "height", "sum_luma", "ahash60(luma) AS sig")
  }

  /** Catalog entry: REAL image resize — 2x area-average (box-filter)
    * downscale of the DECODED pixel plane, the standard pre-embedding
    * thumbnail step: decode the genuine PNG ([[decodePngs]]), average each
    * 2x2 pixel block in exact integer arithmetic (`(a+b+c+d) div 4` —
    * deterministic in both engines), and emit the new dimensions, the
    * exact resized luma sum, and the codegen'd aHash of the RESIZED plane
    * (rebuilt as a BINARY column — the downstream shape a perceptual index
    * consumes). The oracle recomputes everything from the md5 pixel
    * formula; matching proves decode + box filter + re-binarization
    * end-to-end. Supersedes the byte-subsample `mm_resize` stub (kept — it
    * exercises arbitrary-binary plumbing with its own oracle).
    *
    * The filter runs as the codegen'd [[graft.functions.BoxResize]]
    * expression directly on the BINARY plane (pattern: ahash60/phash60) —
    * the earlier SQL derivation round-tripped the plane through a
    * lowercase-hex string with four interpreted instr() lookups per output
    * pixel (2.0 s at sf0.1, the shape phash60 retired at 7.1 -> 0.18 s);
    * only the DuckDB oracle keeps the hex formula. MultimodalSpec pins the
    * expression against that SQL derivation byte-for-byte.
    */
  def mediaResizeReal(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    decodePngs(encodePngs(pixelGrids(s, dir)))
      .selectExpr("doc_id",
        "CAST(width div 2 AS INT) AS rwidth", "CAST(height div 2 AS INT) AS rheight",
        "box_resize(luma, width, 2) AS rp")
      .selectExpr("doc_id", "rwidth", "rheight",
        "byte_sum(rp) AS sum_rluma", "ahash60(rp) AS rsig")
  }

  /** The retired hex-string SQL derivation of the 2x box filter — kept
    * private as the spec's bit-equality anchor for [[BoxResize]], exactly
    * as [[phashSigsSqlFrom]] anchors the codegen'd phash60.
    */
  private[ops] def mediaResizeRealSqlAnchor(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    def hb(pos: String) =
      s"CAST((instr('0123456789abcdef', substring(hx, 2 * ($pos) + 1, 1)) - 1) * 16 + " +
        s"instr('0123456789abcdef', substring(hx, 2 * ($pos) + 2, 1)) - 1 AS BIGINT)"
    val box = Seq(
      "((i div w2) * 2) * width + (i % w2) * 2",
      "((i div w2) * 2) * width + (i % w2) * 2 + 1",
      "((i div w2) * 2 + 1) * width + (i % w2) * 2",
      "((i div w2) * 2 + 1) * width + (i % w2) * 2 + 1").map(hb).mkString("(", " + ", ") div 4")
    decodePngs(encodePngs(pixelGrids(s, dir)))
      .selectExpr("doc_id", "width",
        "CAST(width div 2 AS INT) AS w2", "CAST(height div 2 AS INT) AS h2",
        "graft_barrier(lower(hex(luma))) AS hx")
      .selectExpr("doc_id", "w2", "h2",
        s"graft_barrier(transform(sequence(0, w2 * h2 - 1), i -> $box)) AS rp")
      .selectExpr("doc_id", "CAST(w2 AS INT) AS rwidth", "CAST(h2 AS INT) AS rheight",
        "aggregate(rp, CAST(0 AS BIGINT), (a, x) -> a + x) AS sum_rluma",
        "ahash60(unhex(array_join(transform(rp, v -> lpad(hex(v), 2, '0')), ''))) AS rsig")
  }

  /** Deterministic 8-bit PCM sample tracks derived from `documents` — the
    * audio twin of [[pixelGrids]]: track length = 16 x (20 + id%23) samples;
    * block y's 16 samples are the bytes of md5("<id>:a:<y>"). Pure SQL, so
    * the DuckDB oracle re-derives every sample; [[encodeWavs]] turns them
    * into REAL RIFF/WAVE files.
    */
  private[ops] def sampleGrids(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(20 + doc_id % 23 AS INT) AS blocks")
      .selectExpr("doc_id",
        "aggregate(transform(sequence(0, blocks - 1), " +
          "y -> unhex(md5(concat(CAST(doc_id AS STRING), ':a:', CAST(y AS STRING))))), " +
          "unhex(''), (a, x) -> concat(a, x)) AS pcm")

  /** REAL WAV encode over (doc_id, pcm BINARY): each track is wrapped in a
    * genuine RIFF/WAVE container through `javax.sound.sampled` (JDK-only —
    * 8-bit mono unsigned PCM at 8 kHz, the WAV spec's 8-bit convention)
    * inside the batched mapPartitions pattern. Exists to manufacture
    * genuine audio payloads on-engine (the testdata ships no media bytes);
    * [[decodeWavs]] is the production-shaped operator under test.
    * Compressed codecs (mp3/ogg) remain environment-blocked — no decoder
    * ships in the JDK — but the container/decode path itself is no longer
    * a stub.
    */
  private[ops] def encodeWavs(tracks: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("wav", BinaryType)))
    implicit val enc = Encoders.row(outSchema)
    tracks.mapPartitions { batch =>
      // codec/format state amortized once per partition
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      batch.map { r =>
        val id = r.getLong(0)
        val pcm = r.getAs[Array[Byte]](1)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        Row(id, baos.toByteArray)
      }
    }
  }

  /** REAL WAV decode over (doc_id, wav BINARY) — parse the RIFF container,
    * surface the decoder-reported format (rate/channels/bit depth/frame
    * count), and hand the raw sample plane downstream as a plain BINARY
    * column plus exact integer amplitude statistics (sum and energy —
    * sum of squares). 8-bit PCM WAV is lossless, so every decoded sample is
    * oracle-checkable against the md5 formula that generated it.
    */
  private[ops] def decodeWavs(wavs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("sum_amp", LongType),
      StructField("sum_sq", LongType),
      StructField("pcm", BinaryType)))
    implicit val enc = Encoders.row(outSchema)
    wavs.mapPartitions { batch =>
      batch.map { r =>
        val id = r.getLong(0)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val f = ais.getFormat
        val n = ais.getFrameLength.toInt
        val pcm = ais.readAllBytes()
        require(pcm.length == n * f.getFrameSize,
          s"doc $id: decoded ${pcm.length} bytes, container declared $n frames")
        var sum = 0L; var sq = 0L
        var i = 0
        while (i < pcm.length) {
          val v = (pcm(i) & 0xff).toLong
          sum += v; sq += v * v
          i += 1
        }
        Row(id, f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
          n, sum, sq, pcm)
      }
    }
  }

  /** Catalog entry: the full WAV encode → decode → feature chain — real
    * RIFF/WAVE bytes through the real `javax.sound` codec path, ending in
    * the decoder-reported format, exact amplitude sum and energy, and the
    * codegen'd aHash of the DECODED sample plane. The DuckDB oracle
    * recomputes everything from the md5 sample formula alone (it never
    * sees a WAV): a hash match proves the PCM round trip was byte-lossless
    * end-to-end — audio decode is now env-blocked only for COMPRESSED
    * formats (mp3/ogg need codec jars the sandbox lacks).
    */
  def audioDecode(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    decodeWavs(encodeWavs(sampleGrids(s, dir)))
      .selectExpr("doc_id", "sample_rate", "channels", "bits", "n_samples",
        "sum_amp", "sum_sq", "ahash60(pcm) AS sig")
  }

  /** The fixed-point DCT basis — [[graft.functions.PHash60Impl.M]], the ONE
    * set of 64 integer literals the codegen'd expression, the SQL
    * derivation twin, and the DuckDB oracle all share.
    */
  private val phashMLit = graft.functions.PHash60Impl.M.mkString(", ")

  /** Engine-shared pHash expression fragments. `div` is the Spark spelling,
    * `//` DuckDB's; indexing is 1-based in both (`element_at` / `[]`), so
    * the index arithmetic strings are identical.
    */
  private def phashHexByte(div: String, pos: String) =
    s"CAST((instr('0123456789abcdef', substring(hx, 2 * ($pos) + 1, 1)) - 1) * 16 + " +
      s"instr('0123456789abcdef', substring(hx, 2 * ($pos) + 2, 1)) - 1 AS BIGINT)"
  private def phashStage1(el: (String, String) => String, div: String) =
    (0 until 8).map(x =>
      s"${el("m", s"(i $div 8) * 8 + $x + 1")} * ${el("px", s"$x * 8 + (i % 8) + 1")}")
      .mkString(" + ")
  private def phashStage2(el: (String, String) => String, div: String) =
    (0 until 8).map(x =>
      s"${el("m", s"(i % 8) * 8 + $x + 1")} * ${el("t", s"(i $div 8) * 8 + $x + 1")}")
      .mkString(" + ")

  /** Perceptual DCT hash (pHash) over the binary media column — the
    * frequency-domain upgrade of [[ahashSigsFrom aHash]]: sample an 8x8
    * byte grid, 2-D DCT via two integer matrix multiplies ([[PhashM]]),
    * drop the DC coefficient, threshold the 60 lowest-frequency
    * coefficients at their exact lower median → a 60-bit signature that
    * keys on the payload's coarse FREQUENCY structure, not on individual
    * samples: each bit aggregates all 64 pixels, so a localized edit
    * perturbs every coefficient slightly instead of deterministically
    * flipping the bits whose samples it touched (aHash's per-sample
    * mean-threshold bits). Every AC row of the basis sums to exactly 0
    * (spec-pinned), so a uniform brightness shift provably cannot change
    * ANY bit — for aHash that invariance holds only until rounding moves a
    * sample across the mean. Same 60-bit layout as aHash, so the 4x15
    * pigeonhole banding applies unchanged. On a real image corpus only the
    * pixel-sampling line changes (decode + luma grid).
    *
    * One map-side pass through the codegen'd
    * [[graft.functions.PHash60 phash60]] expression — one tight primitive
    * loop per row; the equivalent SQL higher-order chain
    * ([[phashSigsSqlFrom]]) evaluates two 512-term interpreted transforms
    * per row (7.1 s vs 0.3 s at sf0.1 — HOFs never enter codegen) and is
    * kept as the spec's bit-equality anchor. Every coefficient is an exact
    * BIGINT (|coef| < 2³⁷), the median is an ordered statistic at integer
    * rank, and the bit fold is integer — DuckDB re-derives signatures
    * bit-for-bit from the same matrix literals.
    */
  def phashSigsFrom(media: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.registerAll(media.sparkSession)
    // empty payloads have no signature (the oracle's WHERE n > 0)
    media.where("octet_length(media) > 0")
      .selectExpr("doc_id", "phash60(media) AS sig")
  }

  /** The portable SQL derivation of [[phashSigsFrom]] — the spec pins its
    * bit-equality with the codegen'd expression; the DuckDB oracle is this
    * chain's dialect twin.
    */
  private[ops] def phashSigsSqlFrom(media: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.registerAll(media.sparkSession)
    // element_at requires an INT index; the lambda's div arithmetic is BIGINT
    def el(a: String, i: String) = s"element_at($a, CAST($i AS INT))"
    media
      .selectExpr("doc_id", "graft_barrier(lower(hex(media))) AS hx",
        "octet_length(media) AS n")
      .filter(col("n") > 0)
      .selectExpr("doc_id",
        s"graft_barrier(transform(sequence(0, 63), k -> ${phashHexByte("div", "(k * n) div 64")})) AS px")
      .selectExpr("doc_id", s"array($phashMLit) AS m", "px")
      .selectExpr("doc_id", "m",
        s"graft_barrier(transform(sequence(0, 63), i -> ${phashStage1(el, "div")})) AS t")
      .selectExpr("doc_id",
        s"graft_barrier(transform(sequence(0, 63), i -> ${phashStage2(el, "div")})) AS cf")
      .selectExpr("doc_id", "slice(cf, 2, 60) AS sel")
      .selectExpr("doc_id", "sel", "element_at(array_sort(sel), 30) AS med")
      .selectExpr("doc_id",
        "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (a, k) -> " +
          "a + IF(element_at(sel, k + 1) > med, shiftleft(CAST(1 AS BIGINT), k), CAST(0 AS BIGINT))) AS sig")
  }

  /** Per-document pHash signatures as a catalog entry — hash-compared
    * against the DuckDB re-derivation (any divergence anywhere in the
    * sample/DCT/median/bit pipeline fails the gate).
    */
  def phashSigs(s: SparkSession, dir: String): DataFrame =
    phashSigsFrom(Tables(s, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_phash" -> phashSigs,
    "mm_frame_dedup" -> ((s, dir) => frameDedup(s, dir)),
    "mm_meta" -> mediaMeta,
    "mm_decode" -> mediaDecode,
    "mm_audio_decode" -> audioDecode,
    "mm_resize_real" -> mediaResizeReal,
    "mm_ahash" -> ahashSigs,
    "mm_ahash_dedup" -> ((s, dir) => ahashDedup(s, dir)),
    "mm_features" -> mediaFeatures,
    "mm_frames" -> frameSample,
    "mm_resize" -> resizeStub,
    "mm_bytestats" -> byteStats,
  )

  val oracleSql: Map[String, String] = Map(
    // integer DCT over the hex-parsed 8x8 byte grid — the same PhashM
    // literals, 1-based [] instead of element_at, // instead of div
    "mm_phash" -> {
      def el(a: String, i: String) = s"$a[$i]"
      s"""WITH raw AS (
         |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
         |         octet_length(CAST(text AS BLOB)) AS n FROM documents),
         |px AS MATERIALIZED (
         |  SELECT doc_id,
         |    list_transform(range(0, 64), k -> ${phashHexByte("//", "(k * n) // 64")}) AS px
         |  FROM raw WHERE n > 0),
         |m0 AS (SELECT [$phashMLit] AS m),
         |t1 AS MATERIALIZED (
         |  SELECT doc_id, list_transform(range(0, 64), i -> ${phashStage1(el, "//")}) AS t
         |  FROM px CROSS JOIN m0),
         |c1 AS MATERIALIZED (
         |  SELECT doc_id, list_transform(range(0, 64), i -> ${phashStage2(el, "//")}) AS cf
         |  FROM t1 CROSS JOIN m0),
         |sel AS (SELECT doc_id, cf[2:61] AS sel FROM c1),
         |med AS (SELECT doc_id, sel, list_sort(sel)[30] AS med FROM sel)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(range(0, 60), k ->
         |    CASE WHEN sel[k + 1] > med THEN (CAST(1 AS BIGINT) << k)
         |         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
         |FROM med""".stripMargin
    },
    // all cross-video frame pairs verified exactly; banding is lossless at
    // hamming <= 3, so the grouped sets must match the banded pipeline
    "mm_frame_dedup" ->
      """WITH base AS (SELECT c_custkey AS g FROM customer),
        |sides AS (SELECT g, unnest([0, 1]) AS side FROM base),
        |vids AS MATERIALIZED (SELECT 2*g + side AS doc_id, g, side,
        |  CAST(1 + g % 3 AS INT) AS k FROM sides),
        |fr AS MATERIALIZED (
        |  SELECT doc_id, unnest(fl) AS seed, unnest(range(1, len(fl) + 1)) AS frame_idx
        |  FROM (SELECT doc_id,
        |    list_transform(range(1, CASE WHEN side = 0 THEN 3 ELSE 2 END),
        |      j -> 'u' || doc_id || 'f' || j) ||
        |    list_transform(range(1, k + 1), j -> 's' || g || 'f' || j) ||
        |    ['u' || doc_id || 'ft'] AS fl
        |  FROM vids) t),
        |frb AS MATERIALIZED (
        |  SELECT doc_id, frame_idx,
        |    upper(md5(seed || '0') || md5(seed || '1') || md5(seed || '2') || md5(seed || '3')) AS hx
        |  FROM fr),
        |px AS MATERIALIZED (
        |  SELECT doc_id, frame_idx,
        |    list_transform(range(0, 60), kk ->
        |      (instr('0123456789ABCDEF', substr(hx,
        |         CAST(2 * (kk * 64 // 60) + 1 AS INT), 1)) - 1) * 16 +
        |      instr('0123456789ABCDEF', substr(hx,
        |         CAST(2 * (kk * 64 // 60) + 2 AS INT), 1)) - 1) AS p
        |  FROM frb),
        |sigs AS MATERIALIZED (
        |  SELECT doc_id, frame_idx,
        |    CAST(list_sum(list_transform(range(0, 60), kk ->
        |      CASE WHEN 60 * p[CAST(kk + 1 AS INT)] > list_sum(p)
        |           THEN CAST(power(2, kk) AS BIGINT) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM px)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(1) AS BIGINT) AS n_shared_frames,
        |  CAST(min(bit_count(xor(a.sig, b.sig))) AS INT) AS min_hamming
        |FROM sigs a JOIN sigs b
        |  ON a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= 3
        |GROUP BY 1, 2""".stripMargin,
    "mm_ahash" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 60), k ->
        |      (instr('0123456789ABCDEF', substr(hex(encode(text)),
        |         CAST(2 * (k * octet_length(encode(text)) // 60) + 1 AS INT), 1)) - 1) * 16 +
        |      instr('0123456789ABCDEF', substr(hex(encode(text)),
        |         CAST(2 * (k * octet_length(encode(text)) // 60) + 2 AS INT), 1)) - 1) AS p
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0, 60), k ->
        |    CASE WHEN 60 * p[CAST(k + 1 AS INT)] > list_sum(p)
        |         THEN CAST(power(2, k) AS BIGINT) ELSE 0 END)) AS BIGINT) AS sig
        |FROM px""".stripMargin,
    // all-pairs oracle: quadratic is fine at gate scale, and banding is
    // lossless for hamming <= 3, so the row sets must match exactly
    "mm_ahash_dedup" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 60), k ->
        |      (instr('0123456789ABCDEF', substr(hex(encode(text)),
        |         CAST(2 * (k * octet_length(encode(text)) // 60) + 1 AS INT), 1)) - 1) * 16 +
        |      instr('0123456789ABCDEF', substr(hex(encode(text)),
        |         CAST(2 * (k * octet_length(encode(text)) // 60) + 2 AS INT), 1)) - 1) AS p
        |  FROM documents),
        |sigs AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), k ->
        |      CASE WHEN 60 * p[CAST(k + 1 AS INT)] > list_sum(p)
        |           THEN CAST(power(2, k) AS BIGINT) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM px)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,
    // every pixel re-derived from the shared md5 formula; a match proves
    // the PNG encode->decode round trip returned the exact raster
    "mm_decode" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w, CAST(8 + doc_id % 7 AS INT) AS h
        |  FROM documents),
        |rws AS (
        |  SELECT doc_id, w, h, y, substr(md5(doc_id || ':' || y), 1, 2 * w) AS rowhex
        |  FROM g, LATERAL (SELECT unnest(range(0, h)) AS y) t),
        |hxs AS MATERIALIZED (
        |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |         string_agg(rowhex, '' ORDER BY y) AS hx
        |  FROM rws GROUP BY doc_id),
        |px AS MATERIALIZED (
        |  SELECT doc_id, w, h, w * h AS n,
        |    list_transform(range(0, w * h), i ->
        |      (instr('0123456789abcdef', substr(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16 +
        |      instr('0123456789abcdef', substr(hx, CAST(2 * i + 2 AS INT), 1)) - 1) AS p
        |  FROM hxs),
        |samp AS (
        |  SELECT doc_id, w, h, p,
        |    list_transform(range(0, 60), k -> p[CAST((k * n) // 60 + 1 AS INT)]) AS sp
        |  FROM px)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(list_sum(p) AS BIGINT) AS sum_luma,
        |  CAST(list_sum(list_transform(range(0, 60), k ->
        |    CASE WHEN 60 * sp[CAST(k + 1 AS INT)] > list_sum(sp)
        |         THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |FROM samp""".stripMargin,
    // every sample re-derived from the md5 track formula; a match proves
    // the WAV encode->decode round trip returned the exact PCM bytes with
    // the declared container format
    "mm_audio_decode" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(20 + doc_id % 23 AS INT) AS blocks FROM documents),
        |rws AS (
        |  SELECT doc_id, y, md5(doc_id || ':a:' || y) AS bh
        |  FROM g, LATERAL (SELECT unnest(range(0, blocks)) AS y) t),
        |hxs AS MATERIALIZED (
        |  SELECT doc_id, string_agg(bh, '' ORDER BY y) AS hx FROM rws GROUP BY doc_id),
        |px AS MATERIALIZED (
        |  SELECT doc_id, CAST(length(hx) // 2 AS BIGINT) AS n,
        |    list_transform(range(0, length(hx) // 2), i ->
        |      (instr('0123456789abcdef', substr(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16 +
        |      instr('0123456789abcdef', substr(hx, CAST(2 * i + 2 AS INT), 1)) - 1) AS p
        |  FROM hxs),
        |samp AS (
        |  SELECT doc_id, n, p,
        |    list_transform(range(0, 60), k -> p[CAST((k * n) // 60 + 1 AS INT)]) AS sp
        |  FROM px)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(8 AS INT) AS bits, CAST(n AS INT) AS n_samples,
        |  CAST(list_sum(p) AS BIGINT) AS sum_amp,
        |  CAST(list_sum(list_transform(p, v -> v * v)) AS BIGINT) AS sum_sq,
        |  CAST(list_sum(list_transform(range(0, 60), k ->
        |    CASE WHEN 60 * sp[CAST(k + 1 AS INT)] > list_sum(sp)
        |         THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |FROM samp""".stripMargin,
    // box means recomputed from the pixel formula: decode + 2x2 area
    // average + re-binarized aHash must all round-trip exactly
    "mm_resize_real" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w, CAST(8 + doc_id % 7 AS INT) AS h
        |  FROM documents),
        |rws AS (
        |  SELECT doc_id, w, h, y, substr(md5(doc_id || ':' || y), 1, 2 * w) AS rowhex
        |  FROM g, LATERAL (SELECT unnest(range(0, h)) AS y) t),
        |hxs AS MATERIALIZED (
        |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |         string_agg(rowhex, '' ORDER BY y) AS hx
        |  FROM rws GROUP BY doc_id),
        |px AS MATERIALIZED (
        |  SELECT doc_id, w, h, w // 2 AS w2, h // 2 AS h2,
        |    list_transform(range(0, w * h), i ->
        |      (instr('0123456789abcdef', substr(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16 +
        |      instr('0123456789abcdef', substr(hx, CAST(2 * i + 2 AS INT), 1)) - 1) AS p
        |  FROM hxs),
        |rz AS MATERIALIZED (
        |  SELECT doc_id, w2, h2,
        |    list_transform(range(0, w2 * h2), i ->
        |      (p[CAST(((i // w2) * 2) * w + (i % w2) * 2 + 1 AS INT)] +
        |       p[CAST(((i // w2) * 2) * w + (i % w2) * 2 + 2 AS INT)] +
        |       p[CAST(((i // w2) * 2 + 1) * w + (i % w2) * 2 + 1 AS INT)] +
        |       p[CAST(((i // w2) * 2 + 1) * w + (i % w2) * 2 + 2 AS INT)]) // 4) AS rp
        |  FROM px),
        |samp AS (
        |  SELECT doc_id, w2, h2, rp,
        |    list_transform(range(0, 60), k -> rp[CAST((k * (w2 * h2)) // 60 + 1 AS INT)]) AS sp
        |  FROM rz)
        |SELECT doc_id, CAST(w2 AS INT) AS rwidth, CAST(h2 AS INT) AS rheight,
        |  CAST(list_sum(rp) AS BIGINT) AS sum_rluma,
        |  CAST(list_sum(list_transform(range(0, 60), k ->
        |    CASE WHEN 60 * sp[CAST(k + 1 AS INT)] > list_sum(sp)
        |         THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS rsig
        |FROM samp""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, source,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CAST(320 + doc_id % 640 AS INT) AS stub_width,
        |  CAST(240 + doc_id % 480 AS INT) AS stub_height
        |FROM documents""".stripMargin,
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels,
        |  CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS INT) AS n_spaces
        |FROM documents""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS orig_bytes,
        |  CAST(len(resized) AS INT) AS resized_bytes,
        |  md5(resized) AS resized_hash
        |FROM (
        |  SELECT doc_id, text,
        |    array_to_string(list_transform(range(1, length(text) + 1, 4),
        |      i -> substr(text, CAST(i AS INT), 1)), '') AS resized
        |  FROM documents) t""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id,
        |  CAST(i AS INT) AS frame_idx,
        |  substr(text, CAST(i * 64 + 1 AS INT), 1) AS frame_stub
        |FROM documents, LATERAL (SELECT unnest(range(0, CAST(floor((length(text) - 1) / 64) AS BIGINT) + 1)) AS i)""".stripMargin,
    "mm_bytestats" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |    list_transform(range(0, octet_length(encode(text))),
        |      i -> substr(hex(encode(text)), CAST(2 * i + 1 AS INT), 2)) AS bytes
        |  FROM documents)
        |SELECT doc_id, n_bytes,
        |  CAST(len(list_distinct(bytes)) AS INT) AS n_distinct_bytes,
        |  CAST(list_max(list_transform(list_distinct(bytes),
        |    b2 -> len(list_filter(bytes, x -> x = b2)))) AS INT) AS max_byte_n,
        |  CASE WHEN n_bytes = 0 THEN 0.0
        |       ELSE CAST(list_max(list_transform(list_distinct(bytes),
        |         b2 -> len(list_filter(bytes, x -> x = b2)))) AS DOUBLE) / n_bytes END AS top_byte_frac
        |FROM b""".stripMargin,
  )
}
