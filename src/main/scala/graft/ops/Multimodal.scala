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
    "multimodal_meta" ->
      """SELECT doc_id, 'text' AS modality,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
