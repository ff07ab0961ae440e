package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star, SURVEY.md §7.2 M6): media
  * payloads travel as opaque `binary` columns plus typed metadata;
  * decode/feature-extraction runs partition-parallel over the binary
  * batches via a typed `mapPartitions` (the Scala analogue of a batch
  * UDF) so a real decoder drops in without touching the plumbing.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; schema, partitioning, and batch
  * shape are real and tested.
  */
object Multimodal {

  /** A media row: payload bytes + metadata, as it would land from an
    * object store manifest (payload here synthesized from doc text).
    */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         mime: String, source: String)

  /** Extracted features (what a decoder would emit per media item). */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, fingerprint: Long)

  /** documents -> media records: binary payload column + metadata.
    * At scale the payload column is the parquet binary column your
    * images/audio already live in. */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"), col("source"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode image bytes
    * (JPEG/PNG) and emit pixel-derived features; codecs are absent in
    * this container, so features are a deterministic function of the
    * bytes: length, plus a content fingerprint = the top 60 bits of
    * md5(payload) (15 hex chars parsed as an integer), with fake
    * width/height derived from it. md5-based on purpose — any engine
    * can recompute it, so even the STUBBED pipeline stays
    * hash-oracle-checkable end to end (the plumbing is what's under
    * test). Partition-parallel, batch-at-a-time: the iterator shape is
    * exactly what a JNI/native decoder needs.
    */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        // ??? real decode goes here; deterministic fake below
        val n = r.payload.length
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        val fp = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        MediaFeatures(r.doc_id, n, width = (fp % 1920).toInt + 1,
          height = (fp % 1080).toInt + 1, fingerprint = fp)
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

  // --- MM2 (rows-only): the full decode pipeline through the typed
  // mapPartitions plumbing. ---
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    decodeStub(mediaRecords(s, d)).toDF().orderBy("doc_id")

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
}
