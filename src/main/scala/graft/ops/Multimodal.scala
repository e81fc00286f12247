package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling (SURVEY.md §2B): media payloads are opaque
  * BinaryType columns with typed metadata alongside. The decode step is
  * stubbed deterministically (the container ships no image/audio codecs —
  * see the build brief) but the Spark-side plumbing — schema, typed Dataset,
  * partition-wise batch processing — is real and is what matters at 100 TB:
  * decode work is per-partition, no shuffle, no driver involvement.
  */
object Multimodal {
  import Tables._

  /** A media asset row: payload is an opaque binary column. */
  final case class Media(doc_id: Long, modality: String, payload: Array[Byte])

  /** Extracted metadata produced by the (stubbed) decoder. */
  final case class MediaMeta(doc_id: Long, modality: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int)

  /** Deterministic fake decode: derives "dimensions" from the payload bytes.
    * A real deployment swaps only this function for a codec call; the
    * surrounding dataflow (mapPartitions over binary columns) is unchanged.
    */
  def stubDecode(m: Media): MediaMeta = {
    val n = m.payload.length
    val head = if (n > 0) java.lang.Byte.toUnsignedInt(m.payload(0)) else 0
    MediaMeta(m.doc_id, m.modality, n.toLong,
      width = 16 + (n % 640), height = 16 + (head * 4) % 480,
      n_frames = if (m.modality == "video") 1 + n % 24 else 1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // metadata over binary payloads: sizes + content digests per modality
    "multimodal_meta" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), lit("text").as("modality"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest"))
        .orderBy("doc_id")),

    // audio-style overlapping window framing over binary payloads: 48-byte
    // windows, stride 32 (50% overlap is the spectrogram/feature-window
    // norm), per-window digest + energy proxy (sum of bytes — the real
    // pipeline swaps in an FFT; the slicing/stride dataflow is identical).
    // Pure projection + stepped generator, no shuffle.
    "multimodal_audio_window" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("n_bytes", octet_length(col("text")).cast("long"))
        .filter(col("n_bytes") >= 48)
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0L, n_bytes - 48, 32L)")).as("off"))
        .withColumn("win", expr("substring(text, CAST(off + 1 AS INT), 48)"))
        .select(col("doc_id"), col("off"),
          md5(col("win").cast("binary")).as("digest"),
          expr("""aggregate(
            |  transform(sequence(1, 48),
            |    i -> CAST(ascii(substring(win, i, 1)) AS BIGINT)),
            |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin)
            .as("energy"))
        .orderBy("doc_id", "off")),

    // frame sampling over binary payloads: treat the payload as fixed-size
    // 64-byte frames, keep every 4th, emit per-frame offsets + content
    // digests — the video-pipeline access pattern (seek + slice + hash) as
    // a pure projection + generator, no shuffle, no driver involvement.
    // Oracle-checkable because frames are byte slices and the fixture text
    // is ASCII (byte offsets == char offsets on the DuckDB side).
    "multimodal_framesample" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
        .filter(col("n_bytes") > 0)
        .withColumn("n_frames", ceil(col("n_bytes") / 64.0).cast("long"))
        // stepped generator: emit only the kept frame indices — generating
        // all frames and filtering 3/4 away would 4x the exploded rows
        .select(col("doc_id"), col("payload"),
          explode(expr("sequence(0L, n_frames - 1, 4L)")).as("frame_idx"))
        .withColumn("offset", col("frame_idx") * 64)
        .select(col("doc_id"), col("frame_idx"), col("offset"),
          md5(expr("substring(payload, CAST(offset + 1 AS INT), 64)"))
            .as("digest"))
        .orderBy("doc_id", "frame_idx")),

    // exact byte-level media dedup: SHA-256 over the opaque payload, one
    // hash-groupBy — the first pass of every media-dedup pipeline (images
    // recompressed byte-identical, mirrored files). Only digests shuffle,
    // never payloads; embarrassingly parallel at any corpus size. Unlike
    // dedup_exact (normalized text), bytes compare raw.
    "multimodal_dedup_bytes" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .groupBy(sha2(col("payload"), 256).as("digest"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"),
          sum(octet_length(col("payload"))).cast("long").as("total_bytes"))
        .orderBy("keeper")),

    // typed mapPartitions decode pipeline over binary payloads (no oracle:
    // the stub isn't SQL — a unit spec pins its outputs)
    "multimodal_decode" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), lit("image").as("modality"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[Media]
        .mapPartitions(_.map(stubDecode))
        .toDF()
        .orderBy("doc_id")
    }
  )

  def oracle: Map[String, String] = Map(
    "multimodal_audio_window" ->
      """WITH d AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
        |  FROM documents WHERE octet_length(encode(text)) >= 48),
        |w AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, n_bytes - 48, 32)) AS off, text
        |  FROM d),
        |win AS (
        |  SELECT doc_id, CAST(off AS BIGINT) AS off,
        |    substring(text, CAST(off + 1 AS INT), 48) AS w
        |  FROM w)
        |SELECT doc_id, off, md5(w) AS digest,
        |  CAST(list_sum(list_transform(generate_series(1, 48),
        |    i -> ascii(substring(w, i, 1)))) AS BIGINT) AS energy
        |FROM win ORDER BY doc_id, off""".stripMargin,
    "multimodal_framesample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT)
        |      AS n_frames
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |fr AS (
        |  SELECT doc_id, unnest(generate_series(0, n_frames - 1, 4))
        |    AS frame_idx FROM f)
        |SELECT fr.doc_id, frame_idx, frame_idx * 64 AS offset,
        |  md5(substring(f.text, CAST(frame_idx * 64 + 1 AS INT), 64))
        |    AS digest
        |FROM fr JOIN f ON fr.doc_id = f.doc_id
        |ORDER BY fr.doc_id, frame_idx""".stripMargin,
    // DuckDB hashes the identical UTF-8 bytes (its strings are UTF-8)
    "multimodal_dedup_bytes" ->
      """SELECT sha256(text) AS digest, min(doc_id) AS keeper,
        |count(*) AS n_copies,
        |CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY sha256(text) ORDER BY keeper""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, 'text' AS modality,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
