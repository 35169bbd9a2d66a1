package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextStats}
import graft.queries.ExtHelpers._

/** Multimodal family: image decode/resize/dHash/funnel, audio
  * decode/fingerprint, video metadata.
  *
  * Split out of ExtQueries (round 12) with zero behavior change; keys
  * and oracle text are unchanged. Shared planted fixtures and oracle
  * generators live in [[ExtHelpers]].
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- multimodal (real javax.imageio codec path) -----------------
    // frame sampling: every 2nd 32-byte frame of the payload
    "q_multimodal_frames" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
      Multimodal.frameSample(withBin, "doc_id", "payload", frameSize = 32, every = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_bytes"),
          md5(col("frame")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL codec decode: each doc carries a genuine PNG/BMP/TIFF payload
    // (javax.imageio) whose dims/pixels/container are planted
    // closed-form in doc_id; the query runs the actual ImageIO
    // auto-detect + raster decode and emits what it FOUND. The oracle
    // predicts every value analytically — it can only match if a real
    // encode→decode round trip preserved the planted raster.
    "q_multimodal_decode" -> ((s, d) => {
      // the small corpus parquet scans as ONE partition — repartition
      // the narrow id column to cluster width BEFORE the codec map so
      // encode/decode work spreads across every core (8-byte rows
      // shuffle; payloads are generated and decoded in place, same
      // width-matching as the brute-force ANN corpus side)
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      Multimodal.decodeMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL resize: decode the PNG/BMP/TIFF payload, nearest-neighbor
    // resample the decoded raster to 8×8, checksum the OUTPUT pixels
    // (positional + plain sums — integer-exact, no rounding hazard);
    // map-only, the payload never shuffles
    "q_multimodal_resize" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      Multimodal.resizeChecksum(withBin, "doc_id", "payload", tw = 8, th = 8)
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // EXIF-orientation-aware resize — the round-8 pieces composed: the
    // JPEG APP1/TIFF metadata walk (q_extract_media_metadata's parser)
    // reads a planted Orientation (ALL EIGHT spec values cycling in
    // doc_id — rotations 1/3/6/8 AND mirrored 2/4/5/7) from a genuine
    // EXIF sidecar, the decoded raster is made upright, THEN
    // resampled to 8×8 — what every real image pipeline must do
    // before training. The oracle mirrors each remap analytically
    // (every orientation is a closed-form index map of the planted
    // pattern), so a skipped, wrong-handed, or un-mirrored transform
    // cannot pass.
    "q_multimodal_resize_oriented" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
        .withColumn("exif", Multimodal.syntheticExifCol(col("doc_id")))
      Multimodal.resizeOrientedChecksum(withBin, "doc_id", "payload", "exif",
          tw = 8, th = 8)
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode — the second genuine modality beside images:
    // each doc carries a real RIFF/WAVE container (javax.sound.sampled)
    // whose 16-bit PCM samples are planted closed-form in doc_id; the
    // query runs the actual AudioSystem SPI chain (sniff, header,
    // frame stream) and emits what it DECODED. The oracle predicts
    // frame count, rate, channels, sample sum, and the positional
    // checksum analytically — matching requires a byte-true
    // encode→decode round trip (sign-extension or endianness slips
    // flip the signed sums).
    "q_audio_decode" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticWavCol(col("doc_id")))
      Multimodal.decodeAudioMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Perceptual image fingerprint (dHash): decode the real container,
    // 9×8 nearest-neighbor resample, one bit per horizontal gradient —
    // the image-side analogue of SimHash for near-dup dedup. The
    // oracle rebuilds every bit analytically from the planted pixel
    // algebra (closed-form resample indices + gray values), so a
    // wrong resample convention, a channel swap, or a sign slip flips
    // bits and fails the hash. Map-only; hex output keeps Long sign
    // out of the cross-engine compare.
    "q_image_dhash" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      Multimodal.imageDhash(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Perceptual image NEAR-DUP pairs: every document's image is
    // re-encoded into a different lossless container (png↔bmp) under a
    // shifted id — the byte-level-distinct, pixel-identical duplicate
    // class exact hashing misses — and pairs are recovered by dHash
    // equality. The join key is the 8-byte fingerprint, so the shuffle
    // moves (id, hash) rows only, never payloads; hamming-k
    // generalization is the SimHash pigeonhole banding. The oracle
    // derives every hash analytically (copies share their original's
    // planted raster), so chance structural collisions appear
    // identically on both sides.
    "q_image_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      val copies = base.select((col("doc_id") + 1000000L).as("doc_id"),
        Multimodal.reencodeCol(col("payload")).as("payload"))
      val hashed = Multimodal.imageDhash(base.unionByName(copies),
          "doc_id", "payload")
        .toDF().filter(col("dhash_hex") =!= "")
      hashed.as("a").join(hashed.as("b"),
          col("a.dhash_hex") === col("b.dhash_hex") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .orderBy(col("i"), col("j"))
    }),

    // The image-side curation funnel in one plan: single-decode
    // profile pass (dims + fingerprint fused — decoding twice is the
    // waste a 100 TB pass can't afford) → validity gate → minimum-size
    // gate → perceptual keep-first dedup. Only (id, dims, 8-byte hash)
    // rows reach the dedup window; payloads never shuffle.
    "q_image_funnel" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      val profiled = Multimodal.imageProfile(base, "doc_id", "payload").toDF()
      val gated = profiled
        .filter(col("width") > 0 && col("width") * col("height") >= 300)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dhash_hex")).orderBy(col("doc_id"))
      gated.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("width"), col("height"), col("dhash_hex"))
        .orderBy(col("doc_id"))
    }),

    // MP4 container metadata — the third modality family: each doc
    // carries a real ISO BMFF box tree (ftyp + moov/mvhd/trak/tkhd/
    // mdia/stbl/stsd — MPEG-4 Part 12, public spec) with planted
    // duration, track layout, codec fourccs, and 16.16 track dims;
    // the query walks the actual boxes (recursion, size fields,
    // version-dependent offsets). Frame DECODE is impossible without
    // codec libraries — container structure IS the
    // ExtractMediaMetadata role for video (reference tika.xml:1761).
    // Map-only; the payload never shuffles.
    "q_video_meta" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticMp4Col(col("doc_id")))
      Multimodal.videoMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Audio perceptual fingerprint — the third leg of the perceptual
    // family (text SimHash, image dHash): 32 energy-gradient bits over
    // the REAL decoded PCM, window energies as exact integer Σ s².
    // The oracle rebuilds every bit from the planted sample algebra —
    // sign-extension, endianness, or window-boundary slips flip bits.
    "q_audio_fingerprint" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticWavCol(col("doc_id")))
      Multimodal.audioFingerprint(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // the payload is ASCII text, so byte slicing == char slicing and
    // md5(VARCHAR) hashes the same bytes as Spark's md5(BINARY slice)
    "q_multimodal_frames" ->
      """SELECT doc_id, cast(frame_idx AS INT) AS frame_idx,
        |  cast(length(substring(text, frame_idx * 32 + 1, 32)) AS INT) AS frame_bytes,
        |  md5(substring(text, frame_idx * 32 + 1, 32)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, cast(ceil(length(text) / 32.0) AS BIGINT), 2)) AS frame_idx
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // analytic mirror of the planted raster: dims, container, and the
    // gray sum over the w×h grid are closed-form in doc_id (see
    // Multimodal.plantedW/H/Gray) — matching is only possible if
    // Spark's ImageIO round trip preserved every planted pixel; the
    // format column is what the sniffing READER reports (the JDK TIFF
    // reader names itself 'tif')
    "q_multimodal_decode" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                   8 + (doc_id * 7) % 25 AS h FROM documents),
        |px  AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CASE WHEN doc_id % 4 = 0 THEN 'bmp'
        |       WHEN doc_id % 4 = 2 THEN 'tif' ELSE 'png' END AS format,
        |  CAST(sum((x * 3 + y * 5 + doc_id) % 256) AS BIGINT) AS px_sum
        |FROM pxy GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // nearest-neighbor to 8×8 with sx = i·w // 8, sy = j·h // 8 (the
    // integer-division convention the engine implements); positional
    // checksum Σ (j·8+i+1)·gray is order-sensitive, so a transposed or
    // off-by-one resample cannot pass
    "q_multimodal_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                   8 + (doc_id * 7) % 25 AS h FROM documents),
        |ci  AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS i FROM d),
        |cij AS (SELECT doc_id, w, h, i, unnest(range(0, 8)) AS j FROM ci)
        |SELECT doc_id,
        |  CAST(sum((j * 8 + i + 1) *
        |           ((((i * w) // 8) * 3 + ((j * h) // 8) * 5 + doc_id) % 256))
        |       AS BIGINT) AS px_checksum,
        |  CAST(sum((((i * w) // 8) * 3 + ((j * h) // 8) * 5 + doc_id) % 256)
        |       AS BIGINT) AS px_sum
        |FROM cij GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // analytic mirror of the oriented resize: orientation o cycles all
    // eight spec values with 1 + doc_id % 8; display dims swap for
    // 5-8; display pixel (x, y) pulls the planted gray through each
    // orientation's closed-form inverse map (2/4 mirror, 5 transpose,
    // 6: src(y, h−1−x); 7 transverse; 8: src(w−1−y, x); 3: 180°),
    // then nearest-neighbor to 8×8 as in q_multimodal_resize
    "q_multimodal_resize_oriented" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w, 8 + (doc_id * 7) % 25 AS h,
        |             1 + doc_id % 8 AS o
        |           FROM documents),
        |dd AS (SELECT doc_id, w, h, o,
        |         CASE WHEN o >= 5 THEN h ELSE w END AS rw,
        |         CASE WHEN o >= 5 THEN w ELSE h END AS rh FROM d),
        |ci  AS (SELECT doc_id, w, h, o, rw, rh, unnest(range(0, 8)) AS i FROM dd),
        |cij AS (SELECT doc_id, w, h, o, rw, rh, i, unnest(range(0, 8)) AS j FROM ci),
        |m AS (SELECT doc_id, o, w, h, i, j,
        |        (i * rw) // 8 AS x, (j * rh) // 8 AS y FROM cij),
        |g AS (SELECT doc_id, o, i, j,
        |        CASE o WHEN 1 THEN (x * 3 + y * 5 + doc_id) % 256
        |               WHEN 2 THEN ((w - 1 - x) * 3 + y * 5 + doc_id) % 256
        |               WHEN 3 THEN ((w - 1 - x) * 3 + (h - 1 - y) * 5 + doc_id) % 256
        |               WHEN 4 THEN (x * 3 + (h - 1 - y) * 5 + doc_id) % 256
        |               WHEN 5 THEN (y * 3 + x * 5 + doc_id) % 256
        |               WHEN 6 THEN (y * 3 + (h - 1 - x) * 5 + doc_id) % 256
        |               WHEN 7 THEN ((w - 1 - y) * 3 + (h - 1 - x) * 5 + doc_id) % 256
        |               ELSE ((w - 1 - y) * 3 + x * 5 + doc_id) % 256 END AS gray
        |      FROM m)
        |SELECT doc_id, CAST(o AS INT) AS orientation,
        |  CAST(sum((j * 8 + i + 1) * gray) AS BIGINT) AS px_checksum,
        |  CAST(sum(gray) AS BIGINT) AS px_sum
        |FROM g GROUP BY doc_id, o ORDER BY doc_id""".stripMargin,
    // analytic mirror of the planted PCM: n = 64 + id % 129 samples of
    // s(k) = ((id·31 + k·17) % 4096) − 2048 at 8 kHz mono — matching
    // is only possible if the WAV round trip preserved every sample
    "q_audio_decode" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS k FROM d)
        |SELECT doc_id, CAST(n AS INT) AS n_samples, 8000 AS sample_rate,
        |  1 AS channels,
        |  CAST(sum(((doc_id * 31 + k * 17) % 4096) - 2048) AS BIGINT)
        |    AS sample_sum,
        |  CAST(sum((k + 1) * (((doc_id * 31 + k * 17) % 4096) - 2048)) AS BIGINT)
        |    AS sample_checksum
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // dHash rebuilt bit-by-bit from the planted pixel algebra: the
    // resample index is src = dst*dim//target (the resizeNearest
    // convention), gray is (x*3 + y*5 + id) % 256, a bit is set iff
    // the right neighbor is strictly brighter; hi/lo 32-bit halves
    // sidestep BIGINT shift-63 sign trouble
    "q_image_dhash" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                  8 + (doc_id * 7) % 25 AS h FROM documents),
        |g AS (SELECT doc_id, j, i,
        |        ((i * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p0,
        |        (((i + 1) * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p1
        |      FROM d, unnest(range(0, 8)) AS u(j), unnest(range(0, 8)) AS v(i)),
        |hl AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i >= 32
        |                      THEN (1::BIGINT << (j*8 + i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i < 32
        |                      THEN (1::BIGINT << (j*8 + i)) ELSE 0 END) AS BIGINT) AS lo
        |       FROM g GROUP BY 1)
        |SELECT doc_id, printf('%08x%08x', hi, lo) AS dhash_hex
        |FROM hl ORDER BY doc_id""".stripMargin,
    // near-dup pairs via the same analytic hash: copies (id + 1e6)
    // inherit their original's planted raster, so equal-hash pairs —
    // each (id, id+1e6) plus any structural collisions — fall out of
    // one self-join over the derived hashes
    "q_image_neardup" ->
      """WITH ids AS (SELECT doc_id FROM documents
        |             UNION ALL SELECT doc_id + 1000000 FROM documents),
        |src AS (SELECT doc_id, doc_id % 1000000 AS sid FROM ids),
        |d AS (SELECT doc_id, sid, 8 + sid % 25 AS w,
        |             8 + (sid * 7) % 25 AS h FROM src),
        |g AS (SELECT doc_id, j, i,
        |        ((i * w // 9) * 3 + (j * h // 8) * 5 + sid) % 256 AS p0,
        |        (((i + 1) * w // 9) * 3 + (j * h // 8) * 5 + sid) % 256 AS p1
        |      FROM d, unnest(range(0, 8)) AS u(j), unnest(range(0, 8)) AS v(i)),
        |hl AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i >= 32
        |                      THEN (1::BIGINT << (j*8 + i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i < 32
        |                      THEN (1::BIGINT << (j*8 + i)) ELSE 0 END) AS BIGINT) AS lo
        |       FROM g GROUP BY 1),
        |h AS (SELECT doc_id, printf('%08x%08x', hi, lo) AS hex FROM hl)
        |SELECT a.doc_id AS i, b.doc_id AS j
        |FROM h a JOIN h b ON a.hex = b.hex AND a.doc_id < b.doc_id
        |ORDER BY i, j""".stripMargin,
    // image funnel: planted dims + the analytic dHash, size-gated,
    // keep-first per fingerprint
    "q_image_funnel" ->
      """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 25 AS INT) AS w,
        |                  CAST(8 + (doc_id * 7) % 25 AS INT) AS h FROM documents),
        |g AS (SELECT doc_id, j, i,
        |        ((i * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p0,
        |        (((i + 1) * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p1
        |      FROM d, unnest(range(0, 8)) AS u(j), unnest(range(0, 8)) AS v(i)),
        |hl AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i >= 32
        |                      THEN (1::BIGINT << (j*8 + i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i < 32
        |                      THEN (1::BIGINT << (j*8 + i)) ELSE 0 END) AS BIGINT) AS lo
        |       FROM g GROUP BY 1),
        |p AS (SELECT d.doc_id, d.w AS width, d.h AS height,
        |        printf('%08x%08x', hi, lo) AS dhash_hex
        |      FROM d JOIN hl USING (doc_id)
        |      WHERE d.w * d.h >= 300),
        |k AS (SELECT *, row_number() OVER (PARTITION BY dhash_hex
        |        ORDER BY doc_id) AS rn FROM p)
        |SELECT doc_id, width, height, dhash_hex FROM k
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // MP4 box-tree walk vs the planted container algebra: duration,
    // track count, stsd fourccs in document order, first video track's
    // 16.16 tkhd dimensions
    "q_video_meta" ->
      """SELECT doc_id,
        |  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'avc1'
        |       WHEN 1 THEN 'avc1,mp4a'
        |       ELSE 'avc1,mp4a,hvc1' END AS codecs,
        |  CAST(320 + 16 * (doc_id % 8) AS INT) AS width,
        |  CAST(240 + 16 * (doc_id % 5) AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // audio fingerprint: window of sample k is k*33//n, energies are
    // exact integer sums of squares of the planted samples, bit w set
    // iff e[w+1] > e[w]
    "q_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
        |s AS (SELECT doc_id, n, k,
        |        ((doc_id * 31 + k * 17) % 4096) - 2048 AS v
        |      FROM d, unnest(range(0, n)) AS u(k)),
        |e AS (SELECT doc_id, (k * 33) // n AS w,
        |        CAST(sum(v * v) AS BIGINT) AS energy
        |      FROM s GROUP BY 1, 2),
        |p AS (SELECT a.doc_id, a.w,
        |        CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
        |      FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        |      WHERE a.w < 32)
        |SELECT doc_id,
        |  printf('%08x', CAST(sum(bit * (1::BIGINT << w)) AS BIGINT)) AS afp_hex
        |FROM p GROUP BY 1 ORDER BY doc_id""".stripMargin,
  )
}
