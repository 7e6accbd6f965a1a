package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary`
  * columns with typed metadata extracted FROM THE BYTES.
  *
  * The container has no image/audio codecs and the testdata carries no
  * media files, so [[synthesizePayload]] stands in for the ingest side:
  * it wraps each document's bytes in a GENUINE container header — PNG
  * signature + IHDR chunk, JPEG SOI + APP0/COM/SOF0 segment chain (COM
  * length varies per doc so a fixed-offset "parser" would fail), or a
  * RIFF/WAVE fmt chunk — with width/height/sample-rate encoded
  * big-/little-endian exactly as the formats specify.
  *
  * [[decode]] is the real operator: it never looks at doc_id — format
  * comes from the magic bytes, PNG dims from the IHDR fields (bytes
  * 17..24, big-endian), JPEG dims from walking the segment chain to
  * SOF0 (marker FFC0, length-prefixed hops from offset 3), WAV sample
  * rate from the fmt chunk (bytes 25..28, little-endian). All byte
  * arithmetic runs on the hex image of the payload via substr/conv —
  * plain codegen'd expressions, no UDF — and the DuckDB oracle performs
  * the same walk, so mm_meta is a full-oracle row.
  *
  * A real pixel/sample decode would slot in downstream as a
  * mapInPandas/mapPartitions stage over the same payload column; header
  * parsing staying native keeps the 100 TB triage scan (format/dims
  * routing, corrupt-file filtering) inside whole-stage codegen.
  */
object MM {

  // ---- byte-level construction helpers (Column → binary) ----

  /** n as `nbytes` big-endian bytes. */
  private def be(n: Column, nbytes: Int): Column =
    unhex(lpad(hex(n), nbytes * 2, "0"))

  /** byte k (little-endian order) of n. */
  private def byteAt(n: Column, k: Int): Column =
    pmod(floor(n.cast("double") / math.pow(256, k)).cast("bigint"), lit(256))

  /** n as `nbytes` little-endian bytes. */
  private def le(n: Column, nbytes: Int): Column =
    concat((0 until nbytes).map(k => unhex(lpad(hex(byteAt(n, k)), 2, "0"))): _*)

  private def bytes(hexStr: String): Column = unhex(lit(hexStr))
  private def ascii(s: String): Column = lit(s).cast("binary")

  /** Pin an expensive column to its own projection. The index is
    * always 1 (rand()·0 = 0) so the VALUE is exactly `c` — but the
    * expression is nondeterministic to Catalyst, so neither
    * CollapseProject nor the scan planner's unconditional
    * project-collapse may substitute it into downstream expressions,
    * and no filter on it is pushed below the projection. Without this
    * the fused synthesize→hex→patch→re-decode projection re-inlines
    * the payload CASE into every one of the ~30 byte accesses, the
    * generated method grows past janino's limit, and the whole stage
    * silently falls back to interpreted evaluation. Pinned, each
    * payload/hex image is computed once per row, codegen'd.
    *
    * Form (r17): the former `when(rand() >= 0, c)` guard is SIMPLIFIED
    * AWAY by the Spark 4.1 optimizer (it knows rand's [0, 1) range and
    * folds the always-true comparison), which silently un-pinned every
    * payload — measured: the mm_audio_info plan carried 12 inlined
    * copies of the payload CASE (35 KB plan text, ~1 s of
    * per-materialization optimizer time, zero `rand` left in the
    * plan). Now the native zero-runtime-cost [[graft.core.Pin]]
    * barrier (its scaladoc: why not a value-level trick). */
  private def pinned(c: Column): Column = graft.core.Pin.col(c)

  /** documents.text → a binary payload column wearing a real media
    * container header (the ingest-side stand-in; see scaladoc). */
  def synthesizePayload(docs: DataFrame): DataFrame = {
    val body = col("text").cast("binary")
    val fmt = col("doc_id") % 3
    val w = lit(64) + col("doc_id") % 512
    val h = lit(64) + (col("doc_id") * 7) % 512
    val sr = lit(8000) + (expr("doc_id div 3") % 3) * 8000
    val pad = lit(3) + col("doc_id") % 5
    val bodyLen = length(body).cast("bigint")

    val png = concat(
      bytes("89504E470D0A1A0A"),                   // signature
      be(lit(13), 4), ascii("IHDR"),               // IHDR chunk header
      be(w, 4), be(h, 4),                          // width, height (BE)
      bytes("0806000000"),                         // depth/color/comp/filter/interlace
      body)
    val jpeg = concat(
      bytes("FFD8"),                               // SOI
      bytes("FFE0"), be(lit(16), 2),               // APP0, len 16
      ascii("JFIF"), bytes("00"), bytes("0101"), bytes("00"),
      be(lit(1), 2), be(lit(1), 2), bytes("0000"),
      bytes("FFFE"), be(pad + 2, 2),               // COM, doc-varying length
      // body length derives from the SAME pad expression as the length
      // field — two independent copies of the formula would let them
      // drift and land sofWalk's next hop mid-segment
      repeat(lit("X"), pad.cast("int")).cast("binary"),
      bytes("FFC0"), be(lit(17), 2), bytes("08"),  // SOF0, len 17, precision 8
      be(h, 2), be(w, 2),                          // height, width (BE)
      bytes("03011100021101031101"),               // 3 components
      body)
    val wav = concat(
      ascii("RIFF"), le(bodyLen + 36, 4), ascii("WAVE"),
      ascii("fmt "), le(lit(16), 4),               // fmt chunk, len 16
      le(lit(1), 2), le(lit(1), 2),                // PCM, mono
      le(sr, 4), le(sr * 2, 4),                    // sample rate, byte rate (LE)
      le(lit(2), 2), le(lit(16), 2),               // block align, bits/sample
      ascii("data"), le(bodyLen, 4),
      body)

    docs.select(col("doc_id"),
      pinned(when(fmt === 1, png).when(fmt === 0, jpeg).otherwise(wav)).as("payload"))
  }

  /** The batch feature-extraction stage — the mapInPandas/mapPartitions
    * shape a real multimodal pipeline runs its pixel decoder in, with
    * the DECODER STUBBED (this container has no image/audio libs): one
    * decoder context per PARTITION (not per row — amortizing native
    * init is the whole point of the batch shape), iterator-to-iterator
    * streaming (no partition materialization), and a fixed `dim`
    * feature schema downstream training code can rely on. The stub is
    * a deterministic fake — per-stride unsigned-byte means over the
    * payload — so output is reproducible and spec-checkable; swapping
    * `stubDecode` for a real `libjpeg`/`ffmpeg` call changes NOTHING
    * about the plumbing, which is the part that matters at 100 TB. */
  def featureExtract(payloads: DataFrame, dim: Int = 8): DataFrame = {
    // fail fast on the driver: dim = 0 would ArithmeticException (i %
    // dim) inside executors mid-scan (frameSample's stride discipline)
    require(dim >= 1, s"feature dim ($dim) must be positive")
    val spark = payloads.sparkSession
    import spark.implicits._
    // a NULL doc_id (outer-join manifest corner) would throw inside
    // the non-nullable Long encoder and abort the whole batch — the
    // exact job-kill the NULL-payload guard below exists to prevent
    // (r12 multimodal review). A row with no identity cannot carry a
    // feature vector anywhere; drop it at the scan.
    payloads.where(col("doc_id").isNotNull)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "decoder" init lives HERE (a native handle in a
        // real deployment); the stub needs no state beyond the closure
        def stubDecode(bytes: Array[Byte]): Array[Float] = {
          val sums = new Array[Double](dim)
          val counts = new Array[Int](dim)
          var i = 0
          while (i < bytes.length) {
            sums(i % dim) += (bytes(i) & 0xff); counts(i % dim) += 1; i += 1
          }
          Array.tabulate(dim)(k =>
            if (counts(k) == 0) 0f else (sums(k) / counts(k)).toFloat)
        }
        // a NULL payload (missing blob after a left join) yields a
        // NULL feature row instead of an NPE that kills the batch job
        // — one corrupt file must not abort the 100 TB scan
        rows.map { case (id, bytes) =>
          (id, if (bytes == null) null else stubDecode(bytes))
        }
      }
      .toDF("doc_id", "feat")
      .select(col("doc_id"), col("feat"), lit(dim).as("feat_dim"))
  }

  // ---- byte-level parsing helpers (over the hex image `_h`) ----

  /** hex chars of `len` bytes at 1-based byte offset `i` of hex image
    * column `h` (the forward pass reads `_h`; resizeToFit's verify
    * re-reads the PATCHED image `_ph` with the same helpers). */
  private def hx(i: Column, len: Int, h: String = "_h"): Column =
    col(h).substr(((i - 1) * 2 + 1).cast("int"), lit(2 * len))

  /** big-endian unsigned int of `len` bytes at byte offset `i`. */
  private def bei(i: Column, len: Int, h: String = "_h"): Column =
    conv(hx(i, len, h), 16, 10).cast("bigint")

  /** little-endian unsigned int of `len` bytes at byte offset `i`. */
  private def lei(i: Column, len: Int, h: String = "_h"): Column =
    (0 until len).map(k => bei(i + k, 1, h) * lit(math.pow(256, k).toLong)).reduce(_ + _)

  // ---- shared header probe — decode and resizeToFit MUST walk the
  //      header identically (resize's patch_ok verification is only
  //      sound against the same walk), so there is exactly one copy of
  //      the magic checks and the JPEG segment walk, parameterized by
  //      which hex image they read ----
  private def isPng(h: String = "_h"): Column  = hx(lit(1), 8, h) === "89504E470D0A1A0A"
  private def isJpeg(h: String = "_h"): Column = hx(lit(1), 2, h) === "FFD8"
  // "RIFF" alone is any RIFF container (WEBP, AVI...) — the "WAVE"
  // form tag at bytes 9-12 is what makes it audio; without it a WEBP
  // would enter the audio triage with a garbage sample rate
  private def isWav(h: String = "_h"): Column =
    hx(lit(1), 4, h) === "52494646" && hx(lit(9), 4, h) === "57415645"

  /** SOF0 frame dims — width at sof+7, height at sof+5 (the 2-byte
    * big-endian pair after precision). ONE copy: six hand copies of
    * the +7/+5 pair existed, and a swap in just one would be invisible
    * on square images and silently transpose dims on everything else. */
  private def sofW(sof: Column, h: String = "_h"): Column = bei(sof + 7, 2, h)
  private def sofH(sof: Column, h: String = "_h"): Column = bei(sof + 5, 2, h)

  /** JPEG: walk the length-prefixed segment chain from offset 3 until
    * the SOF0 marker (FFC0). Bounded to 4 hops — enough for
    * SOI/APP0/[APP1]/COM/SOF0 layouts (the corpus synthesizes 3
    * segments; the 4th hop covers an Exif APP1 a real camera JPEG
    * carries — the exifStrip spec exercises it). A deeper chain just
    * parses as unknown dims rather than mis-parsing. The DuckDB
    * oracles mirror the 3-hop walk the corpus needs; the 4th hop
    * never fires on synthesized payloads. */
  private def sofWalk(h: String = "_h"): Column =
    segWalk(i => hx(i, 2, h) === "FFC0", h)

  /** The length-prefixed segment-chain walk itself, ONE copy
    * parameterized by the marker predicate — [[sofWalk]], the
    * metadata scan and the post-strip re-verify all ride the same
    * chain, and the three previously hand-rolled copies had DRIFTED
    * in depth (4 vs 3 vs 2 hops), which is exactly how a
    * fourth-position Exif APP1 could escape the scrub while
    * reporting strip_ok. Returns the first walk position whose
    * marker satisfies `pred`, else null. */
  private def segWalk(pred: Column => Column, h: String): Column = {
    val n1 = lit(5) + bei(lit(5), 2, h)           // after segment 1
    val n2 = n1 + 2 + bei(n1 + 2, 2, h)           // after segment 2
    val n3 = n2 + 2 + bei(n2 + 2, 2, h)           // after segment 3
    when(pred(lit(3)), lit(3L))
      .when(pred(n1), n1)
      .when(pred(n2), n2)
      .when(pred(n3), n3)
  }

  /** Extract typed metadata from the payload BYTES (never doc_id).
    *
    * KNOWN STUB LIMIT (r12 review, beside the CRC note in
    * [[resizeToFit]]): a header TRUNCATED mid-field reads SHORT — the
    * hex substr returns fewer digits and conv parses the partial
    * number — so a 23-byte PNG can report height 1 and decode_ok =
    * true. The synthesized corpus never truncates headers; a real
    * ingest adds per-format minimum-length gates at the triage stage
    * (where the byte lengths are already columns). */
  def decode(withBytes: DataFrame): DataFrame = {
    val hexed = withBytes.withColumn("_h", pinned(hex(col("payload"))))
    val sof = sofWalk()
    val format = when(isPng(), "png").when(isJpeg(), "jpeg")
      .when(isWav(), "wav").otherwise("unknown")
    val width = when(isPng(), bei(lit(17), 4)).when(isJpeg(), sofW(sof))
    val height = when(isPng(), bei(lit(21), 4)).when(isJpeg(), sofH(sof))
    val sampleRate = when(isWav(), lei(lit(25), 4))
    hexed.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      format.as("format"),
      width.as("width"),
      height.as("height"),
      sampleRate.as("sample_rate"),
      coalesce(
        when(isPng() || isJpeg(), width > 0 && height > 0)
          .when(isWav(), sampleRate > 0).otherwise(lit(false)),
        lit(false)).as("decode_ok"))
  }

  def meta(docs: DataFrame): DataFrame = decode(synthesizePayload(docs))

  /** Resize-to-fit as REAL header surgery: compute the fitted dims with
    * integer math, then splice the new big-endian width/height into the
    * payload's own header bytes — PNG IHDR at byte 17/21, JPEG SOF0 at
    * the walked segment offset — producing a header-consistent payload
    * of the new dimensions (pixel resampling is the downstream codec
    * stage; the metadata/header transform is what a 100 TB triage
    * pipeline runs). KNOWN STUB LIMIT: the PNG IHDR CRC32 (bytes
    * 30-33 of a real PNG) is NOT recomputed — the synthesized corpus
    * carries no CRCs, and a real-PNG pipeline recomputes chunk CRCs in
    * its writer stage (DuckDB has no crc32, so a patched CRC could not
    * be oracle-verified here anyway).
    * The splice happens on the hex image (string surgery, codegen'd)
    * and is verified by construction: the output re-parses the patched
    * payload with [[decode]] and reports the re-read dims. Non-image
    * payloads pass through unchanged. */
  def resizeToFit(withBytes: DataFrame, maxDim: Int): DataFrame = {
    // maxDim <= 0 would silently patch EVERY image to 1x1 with
    // patch_ok=true (the greatest(1, ...) clamp) — refuse loudly
    require(maxDim >= 1, s"maxDim ($maxDim) must be positive")
    // staged as separate pinned columns so every projection's generated
    // method stays small: _h (hex image) → _sof (segment walk) →
    // _w/_ht (parsed dims) → new dims → splice. Downstream expressions
    // see plain attributes, not re-inlined copies of the whole tree.
    val hexed = withBytes.withColumn("_h", pinned(hex(col("payload"))))
    val staged = hexed
      .withColumn("_sof", pinned(sofWalk()))
      .withColumn("_w", pinned(
        when(isPng(), bei(lit(17), 4)).when(isJpeg(), sofW(col("_sof")))))
      .withColumn("_ht", pinned(
        when(isPng(), bei(lit(21), 4)).when(isJpeg(), sofH(col("_sof")))))
    val w = col("_w")
    val h = col("_ht")
    // fit inside maxDim×maxDim preserving aspect; integer floor, min 1.
    // Non-image rows (null dims) must stay null — greatest() skips
    // nulls in both engines, so an unguarded min-1 clamp would invent
    // 1×1 dims for wav payloads.
    val m = greatest(w, h)
    val newW = when(m.isNull, lit(null).cast("bigint")).when(m <= maxDim, w)
      .otherwise(greatest(lit(1), floor(w * maxDim / m.cast("double")).cast("bigint")))
    val newH = when(m.isNull, lit(null).cast("bigint")).when(m <= maxDim, h)
      .otherwise(greatest(lit(1), floor(h * maxDim / m.cast("double")).cast("bigint")))
    val sized = staged
      .withColumn("_nw", pinned(newW))
      .withColumn("_nh", pinned(newH))
    def hexPad(n: Column, bytes: Int): Column = lpad(hex(n), bytes * 2, "0")
    // splice on the hex image: [..prefix..][W][H][..rest..]
    val pngPatched = concat(
      col("_h").substr(lit(1), lit(32)),            // bytes 1..16
      hexPad(col("_nw"), 4), hexPad(col("_nh"), 4), // bytes 17..24
      col("_h").substr(lit(49), length(col("_h")))) // bytes 25..
    val jpegHStart = ((col("_sof") + 5 - 1) * 2 + 1).cast("int") // hex offset of height
    val jpegPatched = concat(
      col("_h").substr(lit(1), jpegHStart - 1),
      hexPad(col("_nh"), 2), hexPad(col("_nw"), 2),
      col("_h").substr(jpegHStart + 8, length(col("_h"))))
    val patchedHex = when(isPng(), pngPatched)
      .when(isJpeg() && col("_sof").isNotNull, jpegPatched)
      .otherwise(col("_h"))
    // verify by construction: re-parse the PATCHED hex image with the
    // SAME shared header walk, as one more projection in the same pass
    // — no second run of the synthesize→hex→walk pipeline, no join
    // (the former decode-join form recomputed the whole upstream DAG
    // for the reread branch and shuffled both outputs on doc_id)
    val reread = sized.withColumn("_ph", pinned(patchedHex))
      .withColumn("_psof", pinned(sofWalk("_ph")))
    val rw = when(isPng("_ph"), bei(lit(17), 4, "_ph"))
      .when(isJpeg("_ph"), sofW(col("_psof"), "_ph"))
    val rh = when(isPng("_ph"), bei(lit(21), 4, "_ph"))
      .when(isJpeg("_ph"), sofH(col("_psof"), "_ph"))
    // patch_ok demands PROOF for images (the exifStrip rule, r12
    // review): an image whose dims never parsed (truncated header,
    // SOF past the walk bound) has _w null, and null <=> null would
    // bless a patch that never happened — decode calls the same
    // payload decode_ok = false. Non-images stay the passthrough true.
    reread.select(col("doc_id"), col("_w").as("width"), col("_ht").as("height"),
      col("_nw").as("new_width"), col("_nh").as("new_height"),
      ((rw <=> col("_nw")) && (rh <=> col("_nh")) &&
        !(coalesce(isPng() || isJpeg(), lit(false)) && col("_w").isNull))
        .as("patch_ok"))
  }

  /** Ingest-side stand-in for a video column: a minimal fixed-frame
    * container — magic "GVID", u16 BE frame count, u16 BE frame size,
    * then n_frames×frame_size payload bytes (the document text padded/
    * truncated to fit). Like [[synthesizePayload]], the container is
    * genuinely parsed back from the bytes — no doc_id shortcuts
    * downstream. */
  def synthesizeVideo(docs: DataFrame): DataFrame = {
    val nf = lit(4) + col("doc_id") % 13
    val fs = lit(16) + col("doc_id") % 32
    // ONE copy of the frame geometry: the header's nf/fs and the body
    // length both derive from the same columns (an independent string
    // re-spelling of the formula in the rpad was the COM-pad drift
    // class this file documents — a header/body disagreement makes
    // frameSample's last-frame fingerprint read past the payload).
    // KNOWN STUB LIMIT (r12 review): rpad counts CHARACTERS while the
    // header counts BYTES — equal only on single-byte text, which the
    // synthesized corpus is; a multibyte corpus needs byte-level
    // padding on the binary image to keep header/body geometry coupled.
    docs.withColumn("_nf", nf).withColumn("_fs", fs)
      .select(col("doc_id"), pinned(concat(
        ascii("GVID"), be(col("_nf"), 2), be(col("_fs"), 2),
        expr("rpad(text, cast(_nf * _fs as int), '.')").cast("binary")))
        .as("payload"))
  }

  /** Frame sampling — the video analogue of the image/audio triage:
    * parse the frame geometry from the container header, emit every
    * `every`-th frame as its own row with its byte offset and a
    * 4-byte fingerprint read from the frame's head. This is the fan-out
    * stage a video corpus runs before any codec touches the frames
    * (sampled offsets feed the downstream decode); geometry + offsets
    * are pure header arithmetic, so the whole explode stays inside
    * whole-stage codegen. Non-video payloads are filtered out by magic,
    * not by metadata. */
  def frameSample(withBytes: DataFrame, every: Int = 3): DataFrame = {
    require(every >= 1, s"frame sample stride must be >= 1, got $every")
    val hexed = withBytes.withColumn("_h", pinned(hex(col("payload"))))
    val isVid = hx(lit(1), 4) === "47564944" // "GVID"
    hexed.where(isVid)
      .withColumn("_nf", pinned(bei(lit(5), 2)))
      .withColumn("_fs", pinned(bei(lit(7), 2)))
      // a legal-but-empty container (frame count 0) must yield zero
      // rows, not kill the scan: sequence(0, -1, k) throws
      .where(col("_nf") >= 1)
      .select(col("doc_id"), col("_nf").as("n_frames"), col("_fs"),
        explode(sequence(lit(0L), col("_nf") - 1, lit(every.toLong))).as("frame_idx"),
        col("_h"))
      .withColumn("offset", lit(9L) + col("frame_idx") * col("_fs"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("offset"),
        bei(col("offset"), 4).as("fp"))
  }

  /** Scene-change detection over the frame stream — the shot-boundary
    * pass a video pipeline runs before keyframe selection: every
    * frame's head fingerprint compared to its predecessor (lag window
    * PARTITIONED by video — frames of one video are one partition's
    * work, videos parallelize); a changed fingerprint opens a new
    * scene and `scene_id` is the running cut count, so downstream
    * keyframe picks are `is_cut` rows and scene lengths are a group-by
    * away. A production detector diffs decoded histograms where this
    * diffs the frame-head bytes — that swap changes the fingerprint
    * column only; the plumbing (per-video lag + running sum) is the
    * operator. */
  def sceneDetect(withBytes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frameSample(withBytes, every = 1)
      .withColumn("is_cut",
        coalesce(col("fp") =!= lag(col("fp"), 1).over(w), lit(true)))
      .withColumn("scene_id", sum(when(col("is_cut"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("frame_idx"), col("fp"), col("is_cut"),
        col("scene_id"))
  }

  /** Audio stream facts straight from the container bytes: sample rate
    * from the fmt chunk, sample count from the data-chunk length (16-bit
    * mono PCM), duration from the two — the triage columns an audio
    * corpus is bucketed/filtered on before any sample-level decode. */
  def audioInfo(withBytes: DataFrame): DataFrame = {
    val hexed = withBytes.withColumn("_h", pinned(hex(col("payload"))))
    val sr = lei(lit(25), 4)
    val dataLen = lei(lit(41), 4)
    val nSamples = floor(dataLen / lit(2.0)).cast("bigint")
    // the fixed offsets are only meaningful for the canonical
    // 16-byte-PCM-fmt + immediate-data layout: verify the fmt size
    // (bytes 17-20 = 16) and the 'data' tag (bytes 37-40) — a WAV with
    // an 18-byte extensible fmt or a LIST/fact chunk between fmt and
    // data would otherwise read garbage lengths that still pass the
    // sr > 0 gate (the isWav WAVE-tag discipline, applied to the
    // chunks the offsets assume)
    val canonicalLayout =
      lei(lit(17), 4) === 16L && hx(lit(37), 4) === "64617461"
    // sr > 0: a zeroed fmt chunk would make duration Infinity, and
    // casting Infinity to bigint throws under Spark 4's ANSI default —
    // one corrupt file must not kill the triage scan
    hexed.where(isWav() && canonicalLayout && sr > 0).select(
      col("doc_id"),
      sr.as("sample_rate"),
      nSamples.as("n_samples"),
      floor(nSamples * 1000 / sr.cast("double")).cast("bigint").as("duration_ms"))
  }

  /** Metadata scrub — the privacy pass an image corpus runs before
    * training: BOTH JPEG metadata segment kinds are removed by BYTE
    * SURGERY on the payload (the [[resizeToFit]] splice discipline —
    * hex-image concat, no decode): APP1 (FFE1 — where EXIF GPS/serial
    * tags actually live in a camera JPEG) and COM (FFFE — editor
    * comments). Two splice passes, so an image carrying one of each
    * sheds both; the scrub is verified by construction: the stripped
    * image is re-walked with the SAME shared header probe and must
    * still parse to the ORIGINAL dims with no metadata marker left at
    * any walk position. Non-JPEG payloads (and JPEGs with no metadata
    * segment) pass through untouched with `removed_bytes` 0 — a scrub
    * that drops or mangles clean files is worse than none. Pure
    * projection: runs at scan speed next to the other triage gates.
    * (The corpus synthesizes COM-only JPEGs — the DuckDB oracle
    * mirrors that single-segment case; the APP1 arm and the two-pass
    * behavior are exercised by the hand-built-Exif spec.) */
  def exifStrip(withBytes: DataFrame): DataFrame = {
    // a metadata segment at a walk position: APP1 or COM. The scan
    // rides the SAME 4-hop segWalk as sofWalk — the previous 3-hop
    // copy let a metadata segment at the 4th walk position (e.g.
    // SOI|APP0|DQT|SOF0|APP1) survive the scrub with strip_ok=true
    def metaAt(i: Column, h: String) = hx(i, 2, h).isin("FFFE", "FFE1")
    def metaPos(h: String): Column =
      when(!isJpeg(h), lit(null).cast("bigint"))
        .otherwise(segWalk(i => metaAt(i, h), h))
    // splice the segment (marker + length-prefixed body) out of hex
    // image `h`, given its position column name `pos` and length `len`
    def splice(h: String, pos: String, len: String): Column =
      when(col(pos).isNull, col(h)).otherwise(concat(
        col(h).substr(lit(1), ((col(pos) - 1) * 2).cast("int")),
        col(h).substr(((col(pos) + 2 + col(len) - 1) * 2 + 1).cast("int"),
          length(col(h)))))
    val hexed = withBytes.withColumn("_h", pinned(hex(col("payload"))))
    val staged = hexed
      .withColumn("_sof", pinned(sofWalk()))
      .withColumn("_w", pinned(when(isJpeg(), sofW(col("_sof")))))
      .withColumn("_ht", pinned(when(isJpeg(), sofH(col("_sof")))))
    // pass 1: first metadata segment
    val p1 = staged.withColumn("_m1", pinned(metaPos("_h")))
      .withColumn("_l1", pinned(bei(col("_m1") + 2, 2)))
      .withColumn("_h1", pinned(splice("_h", "_m1", "_l1")))
    // pass 2: a second metadata segment surviving the first splice
    // (APP1 + COM in one image)
    val p2 = p1.withColumn("_m2", pinned(metaPos("_h1")))
      .withColumn("_l2", pinned(bei(col("_m2") + 2, 2, "_h1")))
      .withColumn("_sh", pinned(splice("_h1", "_m2", "_l2")))
    val reread = p2
      .withColumn("_ssof", pinned(sofWalk("_sh")))
    val rw = when(isJpeg("_sh"), sofW(col("_ssof"), "_sh"))
    val rh = when(isJpeg("_sh"), sofH(col("_ssof"), "_sh"))
    // the re-verify scans the SAME 4-hop walk: no metadata marker may
    // remain at ANY position (a 2-position probe could bless a strip
    // that left a third segment behind)
    val noMetaLeft = metaPos("_sh").isNull
    reread.select(col("doc_id"),
      (length(col("_h")) / 2).cast("bigint").as("n_before"),
      (coalesce(col("_l1") + 2, lit(0L)) + coalesce(col("_l2") + 2, lit(0L)))
        .as("removed_bytes"),
      (length(col("_sh")) / 2).cast("bigint").as("n_after"),
      // strip_ok=TRUE requires PROOF: for a no-metadata JPEG the walk
      // must have REACHED SOF inside its bound — a chain deeper than
      // the walk (_sof null) may hide an APP1 at position 5+, and
      // blessing it converts "walked off the bound" into a positive
      // all-clear in a privacy pass. decode reports the same case as
      // decode_ok=false; the scrub reports strip_ok=false.
      // ...and the SAME proof rule holds on the stripped branch: a
      // chain deeper than the walk leaves _w/_ht null, and null <=>
      // null blessed the strip while a 5th-position APP1 survived —
      // the _m1.isNull arm's hole, still open here until r12 review
      (when(!isJpeg(), lit(true))
        .when(col("_m1").isNull, col("_sof").isNotNull)
        .otherwise(col("_sof").isNotNull &&
          (rw <=> col("_w")) && (rh <=> col("_ht")) && noMetaLeft))
        .as("strip_ok"))
  }

  /** aHash perceptual fingerprint of each IMAGE payload (png/jpeg; the
    * dedup key image corpora are cleaned on): 64 luma samples decimated
    * from the byte stream (sample k = byte at 1 + ⌊k·n/64⌋ — the stub
    * stand-in for an 8×8 downscale; a real decoder swaps in without
    * touching anything downstream), each bit = sample above the grid
    * mean. The mean compare is the exact integer `px·64 > Σpx` (no
    * division), and the 64 bits pack into two bigint halves — bit 63
    * in one bigint would overflow Spark 4's ANSI arithmetic and
    * DuckDB's checked BIGINT alike, and two halves keep every fold
    * engine-portable. Pure projection: no shuffle, no UDF. */
  def phash(withBytes: DataFrame): DataFrame = {
    val bit = "IF(element_at(_px, cast(k + 1 as int)) * 64 > _s, 1L, 0L)"
    withBytes.withColumn("_h", pinned(hex(col("payload"))))
      .withColumn("_n", length(col("payload")).cast("bigint"))
      .where(isPng() || isJpeg())
      .withColumn("_px", expr("""transform(sequence(0, 63), k ->
        |  cast(conv(substring(_h,
        |    cast(2 * (1 + (k * _n) div 64) - 1 as int), 2), 16, 10) as bigint))"""
        .stripMargin))
      .withColumn("_s", expr("aggregate(_px, cast(0 as bigint), (a, x) -> a + x)"))
      .select(col("doc_id"),
        expr(s"aggregate(sequence(0, 31), cast(0 as bigint), (a, k) -> a * 2 + $bit)")
          .as("hash_hi"),
        expr(s"aggregate(sequence(32, 63), cast(0 as bigint), (a, k) -> a * 2 + $bit)")
          .as("hash_lo"))
  }

  /** Near-duplicate image pairs over [[phash]] signatures: 4 bands of
    * 16 bits each bucket the corpus (the [[graft.sim.Ann.srpDupPairs]]
    * postings shape — signatures shuffle, payloads never do), pairs
    * verified by exact hamming distance ≤ `maxHamming`. Pigeonhole
    * recall contract: a pair within ⌊maxHamming/…⌋ — concretely, any
    * pair differing in ≤ 3 bits MUST rendezvous (4 bands can't all be
    * hit), and pairs up to `maxHamming` rendezvous unless their flips
    * spread across all 4 bands. Degenerate buckets (an icon repeated
    * 10⁶ times) emit star edges past `starAbove`, the MinHash ceiling
    * ported here — O(K) edges, connected components still recover the
    * group. */
  def phashPairs(sigs: DataFrame, maxHamming: Int = 6,
                 starAbove: Int = 256): DataFrame = {
    import graft.dedup.Dedup
    val ham = "bit_count(x.hash_hi ^ y.hash_hi) + bit_count(x.hash_lo ^ y.hash_lo)"
    sigs.select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        posexplode(expr("""array(hash_hi div 65536, hash_hi % 65536,
          |hash_lo div 65536, hash_lo % 65536)""".stripMargin)))
      .toDF("doc_id", "hash_hi", "hash_lo", "band", "key")
      .groupBy("band", "key")
      .agg(array_sort(collect_list(
        struct(col("doc_id"), col("hash_hi"), col("hash_lo")))).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(explode(
        when(size(col("ds")) <= starAbove,
          expr(Dedup.pairExpansion(
            s"y -> struct(x.doc_id AS i, y.doc_id AS j, $ham AS hamming)")))
        .otherwise(expr(Dedup.starExpansion(
          s"struct(x.doc_id AS i, y.doc_id AS j, $ham AS hamming)"))))
        .as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.hamming").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
