package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Tier C — multimodal columns (SURVEY §2 Tier C / builder contract):
 * image/audio/video as opaque `binary` columns with typed metadata.
 *
 * Images decode FOR REAL (PNG/BMP/GIF/JPEG via `javax.imageio`, pure
 * JVM): true pixel dimensions and a luminance feature fold. Audio
 * decodes FOR REAL too (PCM WAV via `javax.sound.sampled`, pure JVM):
 * true frame count / sample rate and an 8-bin RMS fold over the actual
 * samples. Only video remains STUBBED (the JDK ships no video codec):
 * [[decodeBatch]] folds its bytes into a deterministic fake feature
 * vector. Everything around the stub — the schema, the `Dataset[T]`
 * encoders, the per-partition batched decode shape (batches of
 * [[batchSize]], the same contract a `mapInPandas`/Arrow decode would
 * use), partitioning, and the aggregation — is real and tested.
 * Swapping the remaining stub for a real decoder changes one function.
 */
object Multimodal {

  /** Batch shape for the partition-wise decode — mirrors an Arrow batch
    * boundary; a real decoder would process one batch per library call. */
  val batchSize = 64

  final case class MediaDoc(
      doc_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** decoded_w/decoded_h are the REAL decoded dimensions: pixel
    * width/height for images, (frame count, sample rate) for audio;
    * −1 when the byte-fold stub handled the row (video, or bytes the
    * kind's decoder could not parse). */
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Int,
      decoded_w: Int, decoded_h: Int, features: Array[Float])

  /** Synthesized-WAV shape: 16-bit mono PCM, [[wavRate]] Hz,
    * [[wavFrames]] frames → a fixed 44 + 2·frames byte payload. */
  val wavRate = 8000
  val wavFrames = 400
  val wavBytes: Int = 44 + 2 * wavFrames

  /** A REAL little-endian RIFF/WAVE file: 16-bit mono PCM sine whose
    * frequency and amplitude derive from the doc id — deterministic
    * stand-in audio content that any WAV reader (including
    * `javax.sound.sampled`) parses. Pure byte building, no libraries. */
  def synthWav(docId: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(wavBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataLen = 2 * wavFrames
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(wavRate)
      .putInt(wavRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val freq = 200.0 + (docId % 100) * 10.0
    val amp = 8000.0 + (docId % 7) * 1000.0
    var i = 0
    while (i < wavFrames) {
      bb.putShort(math.round(amp * math.sin(2 * math.Pi * freq * i / wavRate)).toShort)
      i += 1
    }
    bb.array()
  }

  /** Ingest plumbing: attach a deterministic media payload + typed
    * metadata to each document — a REAL synthesized WAV for audio rows
    * (see [[synthWav]]), sha256-of-text opaque bytes for image/video
    * (stands in for content the decode step then handles per kind).
    * The WAV synthesis is a typed map in the INGEST path only — query
    * operators downstream stay columnar. */
  def attachMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      unhex(sha2(col("text"), 256)).as("media"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") % 480 + 16).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sample_rate"))
      .as[MediaDoc]
      .map(d => if (d.kind == "audio") d.copy(media = synthWav(d.doc_id)) else d)
      .toDF()
  }

  /** Real image decode for the `image` kind: PNG/BMP/GIF/JPEG through
    * `javax.imageio` (pure JVM, no external deps — the formats the JDK
    * ships readers for). Features = an 8-bin luminance fold over the
    * actual pixels, plus the true width/height. Deterministic. */
  private def decodeImage(d: MediaDoc): Option[MediaFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d.media)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val feats = new Array[Float](8)
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          feats((x + y) % 8) += lum / 255.0f
          x += 1
        }
        y += 1
      }
      MediaFeatures(d.doc_id, d.kind, d.media.length, im.getWidth, im.getHeight, feats)
    }
  }

  /** Real audio decode for the `audio` kind: WAV/PCM through
    * `javax.sound.sampled` (pure JVM — the JDK ships a WAV/AIFF/AU
    * reader). Features = an 8-bin RMS fold over the ACTUAL decoded
    * 16-bit samples; decoded_w = frame count, decoded_h = sample rate
    * (the "dimensions" of decoded audio). Deterministic. */
  private def decodeAudio(d: MediaDoc): Option[MediaFeatures] = {
    import javax.sound.sampled.AudioSystem
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(d.media))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val raw = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(raw).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = raw.length / 2
          val feats = new Array[Float](8)
          var i = 0
          while (i < n) {
            val s = bb.getShort(i * 2) / 32768.0
            feats(i % 8) += (s * s).toFloat
            i += 1
          }
          var b = 0
          while (b < 8) { feats(b) = math.sqrt(feats(b) / math.max(n / 8, 1)).toFloat; b += 1 }
          val frames = n / fmt.getChannels
          Some(MediaFeatures(d.doc_id, d.kind, d.media.length,
            frames, fmt.getSampleRate.toInt, feats))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** ??? DECODE STUB ??? — video feature extraction (the JDK ships no
    * video codec). Deterministic: folds the media bytes into an 8-float
    * signature, decoded dims = −1. Also the fallback for image/audio
    * rows whose bytes their kind's real decoder cannot parse. */
  private def decodeFold(d: MediaDoc): MediaFeatures = {
    val feats = new Array[Float](8)
    d.media.zipWithIndex.foreach { case (b, i) => feats(i % 8) += (b & 0xff) / 255.0f }
    MediaFeatures(d.doc_id, d.kind, d.media.length, -1, -1, feats)
  }

  /** Batched decode: images decode for real via [[decodeImage]], audio
    * via [[decodeAudio]]; video (and bytes a real decoder rejects) fall
    * through to the byte-fold stub. One batch per call — the
    * Arrow-batch contract. */
  def decodeBatch(batch: Seq[MediaDoc]): Seq[MediaFeatures] =
    batch.map { d =>
      (d.kind match {
        case "image" => decodeImage(d)
        case "audio" => decodeAudio(d)
        case _ => None
      }).getOrElse(decodeFold(d))
    }

  /** Partition-wise batched decode — the real distribution plumbing:
    * executors pull [[batchSize]]-row batches through [[decodeBatch]],
    * no driver involvement, output schema fixed by the encoder. */
  def decodeFeatures(media: Dataset[MediaDoc]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Metadata-level resize: pure column transform on the typed metadata
    * (the pixel-level resample would live in the decode stub). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    df.withColumn("width", (col("width") * scale).cast("int"))
      .withColumn("height", (col("height") * scale).cast("int"))
      .withColumn("resized", scale < 1.0)
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index
    * up to `maxFrames` — metadata only, decode happens downstream. */
  def frameSamplePlan(df: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    df.withColumn("frame_indices",
      when(col("kind") === "video",
        slice(sequence(lit(0), lit(stride * (maxFrames - 1)), lit(stride)), 1, maxFrames))
        .otherwise(array().cast("array<int>")))

  /** c6 query: ingest → batched decode → per-kind feature statistics. */
  def decodePipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = attachMedia(Relational.table(spark, dir, "documents")).as[MediaDoc]
    decodeFeatures(media)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("decoded_w"),
        round(expr("aggregate(features, 0D, (a, x) -> a + cast(x as double))"), 4).as("feat_sum"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("feat_sum")), 4).as("total_feat"),
        max(col("n_bytes")).as("max_bytes"),
        count(when(col("decoded_w") >= 0, 1)).as("n_decoded"))
      .orderBy("kind")
  }

  /** c6b: the metadata half of the pipeline, fully SQL-expressible →
    * oracle-checked (the feature sums stay in the stub-only query). */
  def metaStats(spark: SparkSession, dir: String): DataFrame =
    attachMedia(Relational.table(spark, dir, "documents"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), max(length(col("media"))).as("max_bytes"))
      .orderBy("kind")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c6_multimodal_decode" -> (decodePipeline _),
    "c6_multimodal_meta" -> (metaStats _))

  // c6_multimodal_decode has no oracleSql: the decode stub is not
  // SQL-expressible → rows-only check; determinism + batch shape are
  // unit-tested in TierCSpec
  val oracleSql: Map[String, String] = Map(
    // media bytes are sha256 (32 B) except audio rows, which carry the
    // fixed-shape synthesized WAV (44-byte header + 2 B × frames)
    "c6_multimodal_meta" ->
      s"""SELECT CASE cast(doc_id % 3 as int) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |       ELSE 'video' END AS kind,
         |  count(*) AS n,
         |  max(CASE WHEN doc_id % 3 = 1 THEN $wavBytes ELSE 32 END) AS max_bytes
         |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)
}
