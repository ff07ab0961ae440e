package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star, SURVEY.md §7.2 M6): media
  * payloads travel as opaque `binary` columns plus typed metadata;
  * decode/feature-extraction runs partition-parallel over the binary
  * batches via a typed `mapPartitions` (the Scala analogue of a batch
  * UDF) so any native decoder drops in without touching the plumbing.
  *
  * The decode path is REAL: [[decodeImage]] runs `javax.imageio`
  * (JDK-native — PNG/GIF/BMP need no container codecs) over the
  * payload bytes and emits pixel-derived features; undecodable
  * payloads fall back to a deterministic md5 fingerprint so a mixed
  * corpus (e.g. JPEG rows on a host without libjpeg) degrades
  * per-row, not per-job. The mm2 fixture generates tiny REAL PNGs
  * whose dimensions and pixels are closed-form functions of doc_id,
  * so the decoded features hash-oracle against DuckDB replaying the
  * closed form — the oracle checks actual decoded pixels, not the
  * encoder's opinion of them.
  */
object Multimodal {

  /** A media row: payload bytes + metadata, as it would land from an
    * object store manifest.
    */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         mime: String, source: String)

  /** Decoder output per media item: byte count, pixel dimensions, the
    * exact sum of 8-bit luma samples (the feature the mm2 oracle
    * replays), the 16-bit perceptual average-hash over the decoded
    * raster (mm7 — 0 when undecoded), and an md5-derived fingerprint
    * for payloads no registered reader decodes (width/height/luma_sum
    * are −1 there).
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, luma_sum: Long, ahash: Long,
                           dhash: Long, fingerprint: Long)

  /** documents -> media records with the doc TEXT as an opaque binary
    * payload — the manifest shape mm1/mm3/mm5 read (metadata and
    * frame features straight off bytes, no decode).
    */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"), col("source"))
      .as[MediaRecord]
  }

  /** The mm2 fixture: one tiny REAL grayscale PNG per document,
    * encoded partition-parallel with the JDK's ImageIO. Dimensions
    * and pixels are closed-form in doc_id —
    * width = doc_id mod 14 + 3, height = doc_id mod 11 + 3,
    * pixel(x,y) = (doc_id·31 + 7x + 13y) mod 256 — so the DECODED
    * features are independently recomputable by the oracle (8-bit
    * grayscale PNG is lossless; the round-trip is bit-exact). At
    * scale this stage is your ingest's encoder; the engine only
    * assumes "binary column of image bytes".
    */
  def pngRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        // ImageIO's defaults are per-call: a DISK-backed stream cache
        // (a temp file per image!) and a registry scan per write. One
        // memory-cache switch + one writer instance per PARTITION —
        // the batch shape the scaladoc promises (measured: the
        // per-call defaults made mm2 ~9× slower than the stub path).
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        it.map { case (id, src) =>
          val w = (id % 14 + 3).toInt
          val h = (id % 11 + 3).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val ras = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              ras.setSample(x, y, 0, ((id * 31 + 7L * x + 13L * y) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          MediaRecord(id, baos.toByteArray, "image/png", src)
        }
      }
  }

  /** The MIXED-format fixture mm2/mm7/mm8 decode: every third document
    * (doc_id mod 3 = 0) a REAL JPEG, the rest REAL PNGs — so the
    * decode path exercises the dominant web format's codec branch, not
    * just PNG's friendlier byte distribution. JPEG is lossy in
    * general, so the JPEG paint is CONSTANT WITHIN EACH 8×8 JPEG
    * BLOCK: pixel(x,y) = (doc_id·37 + 11·⌊x/8⌋ + 17·⌊y/8⌋) mod 256.
    * At compression quality 1.0 the quantization tables are all ones,
    * and a constant block's DCT holds only its exactly-representable
    * DC coefficient — the round-trip is bit-exact, which restores the
    * property 8-bit grayscale PNG gives for free: the DuckDB oracle
    * replays DECODED pixels in closed form for both formats, and
    * DataOpsSpec asserts per-row exactness against the closed form
    * (any JDK codec drift fails loudly rather than skewing features).
    */
  def imageRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val png = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val jpg = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val jparam = jpg.getDefaultWriteParam
        jparam.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        jparam.setCompressionQuality(1.0f)
        it.map { case (id, src) =>
          val w = (id % 14 + 3).toInt
          val h = (id % 11 + 3).toInt
          val isJpeg = id % 3 == 0
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val ras = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v =
                if (isJpeg) (id * 37 + 11L * (x / 8) + 17L * (y / 8)) % 256
                else (id * 31 + 7L * x + 13L * y) % 256
              ras.setSample(x, y, 0, v.toInt)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          if (isJpeg) {
            jpg.setOutput(ios)
            jpg.write(null, new javax.imageio.IIOImage(img, null, null), jparam)
          } else {
            png.setOutput(ios)
            png.write(img)
          }
          ios.close()
          MediaRecord(id, baos.toByteArray,
            if (isJpeg) "image/jpeg" else "image/png", src)
        }
      }
  }

  /** REAL image decode, partition-parallel and batch-at-a-time (the
    * iterator shape a JNI/native decoder needs): `javax.imageio` reads
    * the payload, features come off the decoded raster — dimensions
    * plus the exact sum of band-0 (luma) samples. A payload no
    * registered ImageIO reader handles (or that throws mid-decode)
    * falls back to the md5-fingerprint row instead of failing the
    * task: corrupt bytes are data, not errors, in a 100 TB corpus.
    */
  def decodeImage(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // same per-partition batch setup as the encoder: memory-backed
      // streams, no per-image temp files (ImageIO.read still scans the
      // reader registry per call, but with the disk cache off the scan
      // is the cheap part — and it's what routes each payload to
      // whatever codec CAN decode it, which the fallback relies on)
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img != null) {
          val w = img.getWidth; val h = img.getHeight
          val ras = img.getRaster
          // one raster pass accumulates both the exact luma sum and
          // the 4×4 block sums/counts behind the perceptual hash —
          // block membership is floor division (x·4 div w, y·4 div h),
          // the downsample an oracle can replay in integer SQL
          val bsum = new Array[Long](16)
          val bcnt = new Array[Long](16)
          // the 4×5 grid behind the GRADIENT hash (mm8): a narrow
          // image can leave grid cells empty — an empty cell compares
          // as (sum 0, count 0) and the cross-multiply below makes
          // that deterministically false on both engines
          val dsum = new Array[Long](20)
          val dcnt = new Array[Long](20)
          var sum = 0L
          var y = 0
          while (y < h) {
            val by = y * 4 / h
            var x = 0
            while (x < w) {
              val b = by * 4 + x * 4 / w
              val g = by * 5 + x * 5 / w
              val v = ras.getSample(x, y, 0)
              sum += v; bsum(b) += v; bcnt(b) += 1
              dsum(g) += v; dcnt(g) += 1
              x += 1
            }
            y += 1
          }
          // aHash bit b: block mean > global mean, decided by exact
          // integer cross-multiplication (no FP division anywhere)
          val npix = w.toLong * h
          var ahash = 0L
          var b = 0
          while (b < 16) {
            if (bsum(b) * npix > sum * bcnt(b)) ahash |= 1L << b
            b += 1
          }
          // dHash bit (by·4+bx): cell mean > right-neighbor cell mean
          // over the 4×5 grid — same exact cross-multiply discipline
          var dhash = 0L
          var by2 = 0
          while (by2 < 4) {
            var bx = 0
            while (bx < 4) {
              val l = by2 * 5 + bx
              if (dsum(l) * dcnt(l + 1) > dsum(l + 1) * dcnt(l))
                dhash |= 1L << (by2 * 4 + bx)
              bx += 1
            }
            by2 += 1
          }
          MediaFeatures(r.doc_id, r.payload.length,
            w, h, sum, ahash, dhash, fingerprint = 0L)
        } else {
          md.reset()
          val hex = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaFeatures(r.doc_id, r.payload.length, -1, -1, -1L, 0L, 0L,
            java.lang.Long.parseLong(hex.substring(0, 15), 16))
        }
      }
    }
  }

  // --- MM1 (oracled): metadata path — byte length + md5 content hash
  // straight off the binary column, no decode needed. ---
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"))
      .orderBy("doc_id")

  // --- MM2 (oracled): encode → decode → features, end to end through
  // the typed mapPartitions plumbing, with REAL PNG bytes in the
  // middle. The oracled projection carries only decoder-derived
  // fields (dimensions + exact luma sum — DuckDB replays the closed
  // form the fixture painted); n_bytes/fingerprint stay in the typed
  // Dataset for callers but out of the hash (PNG byte length is an
  // encoder detail, not a decode fact). ---
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    decodeImage(imageRecords(s, d)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("luma_sum"))
      .orderBy("doc_id")

  // --- MM3 (oracled): frame sampling — every `stride`-th fixed-width
  // window of the payload, fingerprinted. The video analogue: seekable
  // payload + deterministic frame positions + per-frame feature hash,
  // as one codegen'd explode (positions) + projection (slice + md5) —
  // no decode round-trip for frames that are never sampled. Payload
  // here is the text column so the op stays engine-oracle-checkable;
  // a real video column swaps `substring` for a byte-range decode. ---
  def frameSample(s: SparkSession, d: String,
                  frameLen: Int = 64, stride: Int = 256): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) >= frameLen)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(1), length(col("text")) - lit(frameLen - 1),
          lit(stride))))
      .select(col("doc_id"), col("pos").cast("int").as("frame_no"),
        col("col").cast("int").as("frame_start"),
        md5(col("text").substr(col("col"), lit(frameLen)).cast("binary"))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_no")

  // --- MM5 (oracled): cross-document FRAME dedup — the multimodal
  // twin of chunk-level text dedup (tx18): identical media segments
  // shared by several documents reveal copied or re-encoded media even
  // when the CONTAINERS differ (different ids, metadata, surrounding
  // frames) — exactly how a pipeline catches the same clip re-uploaded
  // inside different files. Pure composition: mm3's deterministic
  // frame fingerprints, one hash-agg on the 32-byte fingerprint (the
  // payload never shuffles), exact integer counts. ---
  def frameDedup(s: SparkSession, d: String,
                 frameLen: Int = 64, stride: Int = 256,
                 topK: Int = 25): DataFrame =
    frameSample(s, d, frameLen, stride)
      .groupBy("frame_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("frame_md5").asc)
      .limit(topK)

  // --- MM4 (oracled): cross-modal alignment audit — join the text
  // modality to its paired embedding row (doc_id = vec_id is the
  // pairing key the synthetic tables share) and profile cluster-label
  // purity per language: per (label, lang), member count and text
  // length stats. The table a pipeline owner reads to see whether
  // embedding clusters are language-confounded before training a
  // multimodal model. Equi-join on the pairing key, then one hash-agg;
  // both sides partition on the same key at scale. ---
  def labelLangProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
      .groupBy("label", "lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("label", "lang")

  // --- MM6 (oracled): scene-cut detection — temporal segmentation of
  // a media stream: a per-frame scalar feature (here the stub "luma" =
  // frame fingerprint mod 256; a real decoder emits mean luminance),
  // compared frame-to-frame inside each document, a cut wherever the
  // jump exceeds the threshold. This is THE standard shot-boundary
  // primitive (pre-clip chunking for video training data); the Spark
  // shape is mm3's sampled frames + one per-doc lag window + a per-doc
  // aggregate — frames never leave their document's partition. The
  // doc-level output (frame count, cut count, exact cut-position
  // checksum) keeps the relation compact while still pinning every
  // cut decision in the hash. ---
  def sceneCuts(s: SparkSession, d: String,
                frameLen: Int = 64, stride: Int = 256,
                threshold: Int = 96): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_no")
    frameSample(s, d, frameLen, stride)
      .withColumn("luma",
        expr("conv(substring(frame_md5, 1, 15), 16, 10)").cast("long") % 256)
      .withColumn("prev_luma", lag(col("luma"), 1).over(w))
      .withColumn("is_cut",
        (col("prev_luma").isNotNull &&
          abs(col("luma") - col("prev_luma")) > threshold).cast("int"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("is_cut")).as("n_cuts"),
        sum(when(col("is_cut") === 1, col("frame_no")).otherwise(0))
          .cast("long").as("cut_possum"))
      .orderBy("doc_id")
  }

  // --- MM7 (oracled): perceptual-hash IMAGE near-dup buckets — the
  // vision twin of dd4's SimHash banding, over REAL decoded pixels:
  // each image's 16-bit average-hash (4×4 block means vs the global
  // mean, all integer arithmetic off the decoded raster) buckets
  // perceptually-alike images; buckets holding ≥2 documents are the
  // near-dup candidate sets an image dedup pass verifies. The hash is
  // resolution-independent (block membership by floor division), so
  // re-encoded or resized copies of a frame land in the same bucket —
  // what byte-level md5 (mm1) can never see. One decode pass (shared
  // with mm2's features), one 2-column hash-agg; payloads never
  // shuffle. The DuckDB oracle repaints the fixture's closed form,
  // replays the same block/cross-multiply arithmetic, and hash-checks
  // every bucket — the decoder's pixels are inside the oracle. ---
  def ahashBuckets(s: SparkSession, d: String, topK: Int = 25): DataFrame =
    decodeImage(imageRecords(s, d)).toDF()
      .groupBy("ahash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("ahash").asc)
      .limit(topK)

  // --- MM9 (oracled): per-format decode profile — the corpus-health
  // table a multimodal ingest dashboard leads with: per mime type, how
  // many payloads decoded, total decoded pixels, exact luma mass.
  // Splits cleanly along the mixed fixture's PNG/JPEG routing (the
  // mime column restates the fixture's doc_id routing rule, which IS
  // its definition); every aggregated field is decoder-derived and
  // exactly oracle-replayable — byte counts are encoder details and
  // stay out of the hash. One decode pass, one 3-column hash-agg. ---
  def mimeProfile(s: SparkSession, d: String): DataFrame =
    decodeImage(imageRecords(s, d)).toDF()
      .withColumn("mime", when(col("doc_id") % 3 === 0, lit("image/jpeg"))
        .otherwise(lit("image/png")))
      .groupBy("mime")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("width").cast("long") * col("height")).as("sum_pixels"),
        sum(col("luma_sum")).as("luma_mass"))
      .orderBy("mime")

  // --- MM8 (oracled): GRADIENT perceptual hash (dHash) buckets — the
  // brightness-invariant partner to mm7's aHash: each bit compares a
  // grid cell's mean to its RIGHT NEIGHBOR over a 4×5 downsample, so
  // the signature encodes the luminance GRADIENT field, not levels —
  // a gamma-shifted or brightness-scaled re-encode keeps its gradients
  // (and its bucket) while every aHash bit can flip. Running both is
  // standard image-dedup practice: candidates = union of bucket hits,
  // each hash catching edits the other misses. Same decode pass, same
  // exact cross-multiply integer arithmetic (empty cells on narrow
  // images compare deterministically false), same bucket rollup; the
  // DuckDB oracle repaints the closed form onto the 4×5 grid and
  // replays every neighbor comparison. ---
  def dhashBuckets(s: SparkSession, d: String, topK: Int = 25): DataFrame =
    decodeImage(imageRecords(s, d)).toDF()
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("dhash").asc)
      .limit(topK)

  /** Second-moment decode output for mm10's contrast gate: exact
    * integer (n_px, Σv, Σv²) off the decoded raster; −1 sentinel for
    * undecodable payloads (the [[decodeImage]] degradation contract).
    */
  case class MediaMoments(doc_id: Long, mime: String, n_px: Long,
                          luma_sum: Long, luma_sumsq: Long)

  /** REAL decode, one raster pass accumulating Σv and Σv² — both
    * exact longs (≤ 2^21 for any fixture-sized image; a production
    * 10-megapixel frame still fits 2^40), so every downstream
    * statistic is integer arithmetic.
    */
  def decodeMoments(records: Dataset[MediaRecord]): Dataset[MediaMoments] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img == null) MediaMoments(r.doc_id, r.mime, -1L, -1L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val ras = img.getRaster
          var sv = 0L; var svv = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ras.getSample(x, y, 0).toLong
              sv += v; svv += v * v
              x += 1
            }
            y += 1
          }
          MediaMoments(r.doc_id, r.mime, w.toLong * h, sv, svv)
        }
      }
    }
  }

  // --- MM10: CONTRAST QUALITY GATE — per format, how many decoded
  // images fall under a pixel-variance floor? The visual-quality
  // sibling of tx4's text gate: a training mix drops near-uniform
  // frames (letterboxing, failed renders, blank scans) before they
  // poison an encoder. The decode is REAL (javax.imageio over the
  // mixed PNG+JPEG fixture); the flag is decided by the exact integer
  // cross-multiply  n·Σv² − (Σv)² < floor·n²  (population variance
  // < floor with both sides scaled by n² — no FP anywhere, so the
  // gate can never be a rounding artifact, and the DuckDB oracle
  // replays DECODED pixels in closed form). Per-format rollup is two
  // rows; the one double is the final share. ---
  def contrastGate(s: SparkSession, d: String,
                   varFloor: Long = 800L): DataFrame = {
    val m = decodeMoments(imageRecords(s, d)).toDF()
      .filter(col("n_px") > 0)
    m.withColumn("low",
        when(col("n_px") * col("luma_sumsq")
          - col("luma_sum") * col("luma_sum")
          < lit(varFloor) * col("n_px") * col("n_px"), 1L).otherwise(0L))
      .groupBy("mime")
      .agg(count(lit(1)).as("n_images"), sum(col("low")).as("n_low_contrast"))
      .select(col("mime"), col("n_images"), col("n_low_contrast"),
        round(col("n_low_contrast").cast("double")
          / col("n_images").cast("double"), 6).as("low_share"))
      .orderBy("mime")
  }

  /** Oracle twin of [[contrastGate]] — DuckDB replays the decoded
    * pixels in closed form (the mixed-fixture paint formulas) and the
    * same integer cross-multiplied variance flag.
    */
  def contrastGateOracleSql(varFloor: Long = 800L): String =
    s"""WITH d AS (
       |  SELECT doc_id, (doc_id % 14 + 3) AS w, (doc_id % 11 + 3) AS h,
       |    (doc_id % 3 = 0) AS jp
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, jp,
       |    CASE WHEN jp THEN (doc_id*37 + 11*(x//8) + 17*(y//8)) % 256
       |         ELSE (doc_id*31 + 7*x + 13*y) % 256 END AS v
       |  FROM (SELECT doc_id, jp, h, unnest(range(0, w)) AS x FROM d),
       |  LATERAL (SELECT unnest(range(0, h)) AS y) AS ty),
       |m AS (
       |  SELECT doc_id, jp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v*v) AS BIGINT) AS svv
       |  FROM px GROUP BY 1, 2)
       |SELECT CASE WHEN jp THEN 'image/jpeg' ELSE 'image/png' END AS mime,
       |  CAST(count(*) AS BIGINT) AS n_images,
       |  CAST(sum(CASE WHEN n*svv - sv*sv < $varFloor*n*n
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_contrast,
       |  round(CAST(sum(CASE WHEN n*svv - sv*sv < $varFloor*n*n
       |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS low_share
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
}
