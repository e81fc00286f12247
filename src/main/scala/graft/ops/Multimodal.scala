package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column handling (SURVEY.md §2B): media payloads are opaque
  * BinaryType columns with typed metadata alongside. The decode step parses
  * a REAL container format — RIFF/WAVE (public spec: 'RIFF' size 'WAVE',
  * then fourcc+size chunks, word-aligned; 'fmt ' carries the PCM format
  * block, 'data' the samples) — the container ships no image codecs, but a
  * WAV header walk needs none. The Spark-side plumbing — schema, typed
  * Dataset, partition-wise batch processing — is what matters at 100 TB:
  * decode work is per-partition, no shuffle, no driver involvement.
  */
object Multimodal {
  import Tables._

  /** A media asset row: payload is an opaque binary column. */
  final case class Media(doc_id: Long, modality: String, payload: Array[Byte])

  /** Header fields extracted by the RIFF/WAVE decoder. */
  final case class WavMeta(doc_id: Long, modality: String, n_bytes: Long,
    riff_size: Long, audio_format: Int, n_channels: Int, sample_rate: Long,
    byte_rate: Long, block_align: Int, bits_per_sample: Int,
    data_bytes: Long, duration_us: Long)

  /** Deterministic WAV synthesis: a valid RIFF/WAVE container whose PCM16
    * payload is derived from the document bytes — the fixture generator for
    * the decoder below (the corpus ships no binary media). Every fifth doc
    * gets a LIST junk chunk between 'fmt ' and 'data' so a parser that
    * assumes the canonical 44-byte layout (instead of walking chunks) fails
    * the oracle.
    */
  def synthWav(docId: Long, text: String): Array[Byte] = {
    val channels = (1 + docId % 2).toInt
    val sampleRate = 8000L * (1 + docId % 3)
    val bits = 16
    val blockAlign = channels * (bits / 8)
    val byteRate = sampleRate * blockAlign
    val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val nSamples = textBytes.length
    val dataBytes = nSamples * blockAlign
    val junk = docId % 5 == 0
    val total = 12 + 24 + (if (junk) 12 else 0) + 8 + dataBytes
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(total - 8).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort)                 // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate.toInt)
      .putInt(byteRate.toInt)
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    if (junk) buf.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    buf.put("data".getBytes).putInt(dataBytes)
    var i = 0
    while (i < nSamples) {
      val sample = ((java.lang.Byte.toUnsignedInt(textBytes(i)) - 128) * 256)
        .toShort
      var c = 0
      while (c < channels) { buf.putShort(sample); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** Real RIFF/WAVE header parse: validates the magic, walks the chunk list
    * (word-aligned sizes), reads the 'fmt ' block fields and the 'data'
    * size. Throws on malformed input — a corrupt asset must surface, not
    * silently zero. This is the function a real deployment swaps for a full
    * codec; the surrounding dataflow is unchanged.
    */
  def parseWav(docId: Long, payload: Array[Byte]): WavMeta = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"doc $docId: not a RIFF container")
    val riffSize = java.lang.Integer.toUnsignedLong(buf.getInt)
    require(fourcc() == "WAVE", s"doc $docId: not a WAVE form")
    var audioFormat = -1; var channels = -1; var sampleRate = -1L
    var byteRate = -1L; var blockAlign = -1; var bits = -1
    var dataBytes = -1L
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val size = java.lang.Integer.toUnsignedLong(buf.getInt)
      id match {
        case "fmt " =>
          val end = buf.position() + size.toInt
          audioFormat = buf.getShort & 0xffff
          channels = buf.getShort & 0xffff
          sampleRate = java.lang.Integer.toUnsignedLong(buf.getInt)
          byteRate = java.lang.Integer.toUnsignedLong(buf.getInt)
          blockAlign = buf.getShort & 0xffff
          bits = buf.getShort & 0xffff
          buf.position(end)
        case "data" =>
          dataBytes = size
          buf.position(buf.position() + size.toInt)
        case _ => // skip unknown chunk payloads (LIST, fact, ...)
          buf.position(buf.position() + size.toInt)
      }
      if (size % 2 == 1 && buf.hasRemaining) buf.get() // RIFF pad byte
    }
    require(audioFormat >= 0, s"doc $docId: missing fmt chunk")
    require(dataBytes >= 0, s"doc $docId: missing data chunk")
    WavMeta(docId, "audio", payload.length.toLong, riffSize, audioFormat,
      channels, sampleRate, byteRate, blockAlign, bits, dataBytes,
      duration_us = if (byteRate > 0) dataBytes * 1000000L / byteRate else 0L)
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

    // typed mapPartitions decode pipeline over binary payloads: synthesize
    // a valid RIFF/WAVE container per doc, then parse it back with the real
    // chunk-walking header decoder. Oracle-checked: DuckDB computes the
    // fields the parser SHOULD extract in closed form from (doc_id, text) —
    // any header-walk bug (wrong offset, missed junk chunk, endianness)
    // diverges from the closed form and fails the hash match.
    "multimodal_decode" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), lit("audio").as("modality"),
          col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, modality, text) =>
          parseWav(id, synthWav(id, text)).copy(modality = modality)
        })
        .toDF()
        .orderBy("doc_id")
    },

    // container-bloat / bitrate audit over the decoded headers: per
    // (sample_rate, channels) class, how many bytes the lake stores vs
    // the PCM payload it actually carries, which assets deviate from
    // the canonical 44-byte header layout (the LIST-junk containers —
    // a re-mux candidate list), and the class's nominal kbps — the
    // table a media-lake owner reads before paying for a transcode or
    // re-container pass. Same per-partition header walk as the decode
    // key (headers only, payloads never shuffle); output O(#classes).
    "multimodal_bitrate_audit" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          parseWav(id, synthWav(id, text))
        })
        .toDF()
        .groupBy("sample_rate", "n_channels")
        .agg(count(lit(1)).as("n_assets"),
          sum(when(col("n_bytes") - col("data_bytes") > 44L, 1L)
            .otherwise(0L)).as("n_noncanonical"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("data_bytes")).as("payload_bytes"))
        .select(col("sample_rate"), col("n_channels"), col("n_assets"),
          col("n_noncanonical"), col("total_bytes"), col("payload_bytes"),
          (col("total_bytes") - col("payload_bytes")).as("overhead_bytes"),
          round((col("total_bytes") - col("payload_bytes")).cast("double")
            / col("total_bytes"), 6).as("overhead_share"),
          round(col("sample_rate").cast("double") * col("n_channels")
            * lit(16d) / lit(1000d), 6).as("nominal_kbps"))
        .orderBy("sample_rate", "n_channels")
    },

    // media-lake datacard (the corpus_datacard analog for audio): per
    // (sample_rate, n_channels) container class, asset count, total and
    // mean decoded duration, and the class's share of the lake — the
    // composition table a media-training run is configured from, and
    // the first read when a transcode decision (resample? downmix?) is
    // costed. One per-partition decode pass (headers only, no payload
    // shuffle) collapsing to O(#classes) cells; shares via a broadcast
    // 1-row total, durations integer-summed before the one division.
    "multimodal_corpus_stats" -> { (s, d) =>
      import s.implicits._
      val cells = t(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          parseWav(id, synthWav(id, text))
        })
        .toDF()
        .groupBy("sample_rate", "n_channels")
        .agg(count(lit(1)).as("n_assets"),
          sum(col("duration_us")).as("total_duration_us"))
      val tot = cells.agg(sum(col("n_assets")).as("n_total"))
      cells.crossJoin(broadcast(tot))
        .select(col("sample_rate"), col("n_channels"), col("n_assets"),
          col("total_duration_us"),
          round(col("total_duration_us").cast("double")
            / col("n_assets").cast("double"), 2).as("avg_duration_us"),
          round(col("n_assets").cast("double")
            / col("n_total").cast("double"), 6).as("asset_share"))
        .orderBy("sample_rate", "n_channels")
    },

    // media curation gate (the text_gopher_rules analog for audio): run
    // the REAL header decode, then per-asset rule flags — duration floor,
    // sample-rate whitelist, and the byte_rate == sample_rate·block_align
    // container-consistency check (a corrupted fmt block fails it) — plus
    // the keep conjunction. Decode stays per-partition (no shuffle); the
    // rules are pure projections over the decoded fields, so at 100 TB
    // the gate costs exactly one pass over the media lake.
    "multimodal_quality_gate" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), lit("audio").as("modality"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, modality, text) =>
          parseWav(id, synthWav(id, text)).copy(modality = modality)
        })
        .toDF()
        .select(col("doc_id"), col("duration_us"), col("sample_rate"),
          col("n_channels"),
          (col("duration_us") >= 20000L).as("rule_duration"),
          col("sample_rate").isin(8000L, 16000L).as("rule_rate"),
          (col("byte_rate") === col("sample_rate") * col("block_align"))
            .as("rule_consistent"),
          (col("duration_us") >= 20000L
            && col("sample_rate").isin(8000L, 16000L)
            && col("byte_rate") === col("sample_rate") * col("block_align"))
            .as("keep"))
        .orderBy("doc_id")
    },

    // webdataset-style shard planning over the media MANIFEST: pack the
    // WAV payloads into ~64 KiB tar shards in doc order within 32
    // writer buckets (the pack_sequences discipline — each writer packs
    // its own stream, no global cumsum). Planning is metadata-only: the
    // RIFF container size is computable from manifest fields alone
    // (channels/junk-chunk/sample count are doc-keyed — see synthWav:
    // 44 header bytes + 12 for the %5 LIST chunk + samples × blockAlign),
    // so the planner never touches a payload byte — at 100 TB shard
    // planning reads the manifest and the media lake stays cold. Output
    // is the shard manifest (files, bytes per shard) the tar writers
    // execute.
    "multimodal_shard_plan" -> { (s, d) =>
      val w = Window.partitionBy("bucket").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(32)).cast("long").as("bucket"),
          (lit(44L)
            + when(col("doc_id") % 5 === 0, 12L).otherwise(0L)
            + octet_length(col("text")).cast("long")
              * (lit(1L) + col("doc_id") % 2) * 2L).as("n_bytes"))
        .withColumn("cum", sum(col("n_bytes")).over(w))
        .withColumn("shard", floor((col("cum") - col("n_bytes")) / 65536L))
        .groupBy("bucket", "shard")
        .agg(count(lit(1)).as("n_files"),
          sum(col("n_bytes")).as("shard_bytes"))
        .orderBy("bucket", "shard")
    },

    // random-access index for one tar shard bucket: per file its byte
    // offset WITHIN its 64 KiB shard — the index a dataloader fetches to
    // seek straight to sample N without streaming the shard (the
    // WebDataset/tar-index shape). Same deterministic byte sizing and
    // shard assignment as multimodal_shard_plan (single source of truth
    // for the layout); offsets are per-bucket prefix sums (partitioned
    // window — buckets index in parallel), emitted for bucket 0 only:
    // an index is a per-bucket artifact, and one bucket is 1/32 of the
    // corpus at any scale.
    "multimodal_tar_index" -> { (s, d) =>
      val w = Window.partitionBy("bucket").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(32)).cast("long").as("bucket"),
          (lit(44L)
            + when(col("doc_id") % 5 === 0, 12L).otherwise(0L)
            + octet_length(col("text")).cast("long")
              * (lit(1L) + col("doc_id") % 2) * 2L).as("n_bytes"))
        .filter(col("bucket") === 0L)
        .withColumn("cum", sum(col("n_bytes")).over(w))
        .withColumn("shard", floor((col("cum") - col("n_bytes")) / 65536L))
        .withColumn("offset",
          col("cum") - col("n_bytes") - col("shard") * 65536L)
        .select("shard", "doc_id", "offset", "n_bytes")
        .orderBy("shard", "doc_id")
    },

    // block-mean perceptual hash over binary payloads: split the payload
    // into 64 equal blocks, bit b = "block b's mean byte > global mean",
    // emit the 64-bit fingerprint — the aHash family every image/audio
    // near-dup pipeline runs before anything expensive (byte-identical
    // is multimodal_dedup_bytes; this survives re-encodes that preserve
    // coarse structure). The mean comparison is EXACT integer
    // cross-multiplication (block_sum·64 > total_sum — no division, no
    // float, so no rounding to diverge engines); the whole hash is one
    // in-row fold, map-only, no shuffle until the O(1)-width collision
    // count. Trailing n mod 64 bytes are outside every block (the
    // fixed-grid semantics of a real aHash resize).
    "multimodal_phash" -> { (s, d) =>
      val wh = Window.partitionBy("phash")
      t(s, d, "documents")
        .withColumn("n", octet_length(col("text")).cast("int"))
        .filter(col("n") >= 64)
        .withColumn("bl", (col("n") / 64).cast("int"))
        .withColumn("sums", expr("""
          transform(sequence(0, 63), b ->
            aggregate(
              transform(sequence(1, bl),
                i -> CAST(ascii(substring(text, b * bl + i, 1)) AS BIGINT)),
              CAST(0 AS BIGINT), (a, x) -> a + x))"""))
        .withColumn("tot", expr(
          "aggregate(sums, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("phash", expr("""
          array_join(
            transform(sequence(0, 63), b ->
              CASE WHEN element_at(sums, b + 1) * 64 > tot
                   THEN '1' ELSE '0' END), '')"""))
        .withColumn("n_same_hash", count(lit(1)).over(wh))
        .select(col("doc_id"), col("phash"), col("n_same_hash"))
        .orderBy("doc_id")
    },

    // 2-D tile decomposition: treat the payload as a 16-byte-wide
    // raster and cut 4×4-byte tiles — the image-patch access pattern
    // (ViT-style patching, tile-level dedup, progressive loading) as a
    // pure projection + stepped generator: per tile one digest and one
    // integer energy sum, no shuffle until the final order. Tile (r,c)
    // gathers four 4-byte row slices by offset arithmetic — the same
    // byte-slicing contract as multimodal_framesample (ASCII fixture:
    // byte offsets == char offsets on the oracle side). Partial tiles
    // at the bottom edge are dropped (fixed-grid semantics).
    "multimodal_image_tiles" -> ((s, d) =>
      imageTiles(s, d).orderBy("doc_id", "tile_row", "tile_col")),

    // tile-level near-dup census: tile CONTENT that recurs across
    // different documents — the image-region dedup (shared
    // letterheads, watermarks, repeated crops) that asset-level
    // byte-exact dedup (multimodal_dedup_bytes) structurally misses.
    // One groupBy on the 32-char tile digest over the shared
    // imageTiles decomposition, cross-doc filter, O(#shared digests)
    // output with the canonical (smallest) carrier doc per digest.
    "multimodal_tile_dedup" -> ((s, d) =>
      imageTiles(s, d)
        .groupBy("digest")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tiles"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("digest")))
  )

  /** The 4×4-byte tile decomposition behind `multimodal_image_tiles`
    * and `multimodal_tile_dedup` (doc_id, tile_row, tile_col, digest,
    * energy), unordered.
    */
  private def imageTiles(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("n", octet_length(col("text")))
      .withColumn("trows", expr("CAST((n DIV 16) DIV 4 AS INT)"))
      .filter(col("trows") >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr(
          """flatten(transform(sequence(0, trows - 1), tr ->
            |  transform(sequence(0, 3), tc ->
            |    struct(tr AS tr, tc AS tc))))""".stripMargin))
          .as("tl"))
      .withColumn("tile", expr(
        """concat(
          |  substring(text, (tl.tr * 4 + 0) * 16 + tl.tc * 4 + 1, 4),
          |  substring(text, (tl.tr * 4 + 1) * 16 + tl.tc * 4 + 1, 4),
          |  substring(text, (tl.tr * 4 + 2) * 16 + tl.tc * 4 + 1, 4),
          |  substring(text, (tl.tr * 4 + 3) * 16 + tl.tc * 4 + 1, 4))"""
          .stripMargin))
      .select(col("doc_id"), col("tl.tr").cast("long").as("tile_row"),
        col("tl.tc").cast("long").as("tile_col"),
        md5(col("tile").cast("binary")).as("digest"),
        expr("""aggregate(
          |  transform(sequence(1, 16),
          |    i -> CAST(ascii(substring(tile, i, 1)) AS BIGINT)),
          |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin)
          .as("energy"))

  def oracle: Map[String, String] = Map(
    // same metadata-only size formula, same per-bucket cumsum
    // same sizing + shard math as the shard plan; per-file offsets for
    // bucket 0
    "multimodal_tar_index" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 32 AS bucket,
        |    44 + CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END
        |      + CAST(octet_length(encode(text)) AS BIGINT)
        |        * (1 + doc_id % 2) * 2 AS n_bytes
        |  FROM documents WHERE doc_id % 32 = 0),
        |c AS (
        |  SELECT doc_id, n_bytes,
        |    sum(n_bytes) OVER (PARTITION BY bucket ORDER BY doc_id) AS cum
        |  FROM m)
        |SELECT CAST(floor((cum - n_bytes) / 65536) AS BIGINT) AS shard,
        |  doc_id,
        |  CAST(cum - n_bytes
        |    - CAST(floor((cum - n_bytes) / 65536) AS BIGINT) * 65536
        |    AS BIGINT) AS "offset",
        |  CAST(n_bytes AS BIGINT) AS n_bytes
        |FROM c ORDER BY shard, doc_id""".stripMargin,

    "multimodal_shard_plan" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 32 AS bucket,
        |    44 + CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END
        |      + CAST(octet_length(encode(text)) AS BIGINT)
        |        * (1 + doc_id % 2) * 2 AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, bucket, n_bytes,
        |    sum(n_bytes) OVER (PARTITION BY bucket ORDER BY doc_id) AS cum
        |  FROM m)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(floor((cum - n_bytes) / 65536) AS BIGINT) AS shard,
        |  count(*) AS n_files, CAST(sum(n_bytes) AS BIGINT) AS shard_bytes
        |FROM c GROUP BY 1, 2 ORDER BY bucket, shard""".stripMargin,
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
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the RIFF/WAVE fields the header parser must extract, recomputed in
    // closed form from the synthesis parameters (synthWav): PCM16,
    // channels = 1 + doc_id%2, rate = 8000*(1 + doc_id%3), a 12-byte LIST
    // junk chunk every fifth doc, one sample per text byte
    // same closed-form header fields + the identical rule projections
    "multimodal_quality_gate" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
        |    CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_samples
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_channels, sample_rate,
        |    CAST(n_channels * 2 AS INTEGER) AS block_align,
        |    CAST(sample_rate * n_channels * 2 AS BIGINT) AS byte_rate,
        |    CAST(n_samples * n_channels * 2 AS BIGINT) AS data_bytes
        |  FROM p),
        |f AS (
        |  SELECT doc_id,
        |    CAST(data_bytes * 1000000 // byte_rate AS BIGINT)
        |      AS duration_us,
        |    sample_rate, n_channels,
        |    byte_rate = sample_rate * block_align AS rule_consistent
        |  FROM q)
        |SELECT doc_id, duration_us, sample_rate, n_channels,
        |  duration_us >= 20000 AS rule_duration,
        |  sample_rate IN (8000, 16000) AS rule_rate,
        |  rule_consistent,
        |  (duration_us >= 20000 AND sample_rate IN (8000, 16000)
        |    AND rule_consistent) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // the decode oracle's closed-form fields, folded per container class
    "multimodal_corpus_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
        |    CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_samples
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_channels, sample_rate,
        |    CAST(n_samples * n_channels * 2 * 1000000
        |      // (sample_rate * n_channels * 2) AS BIGINT) AS duration_us
        |  FROM p),
        |cells AS (
        |  SELECT sample_rate, n_channels,
        |    CAST(count(*) AS BIGINT) AS n_assets,
        |    CAST(sum(duration_us) AS BIGINT) AS total_duration_us
        |  FROM q GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_assets) AS BIGINT) AS n_total FROM cells)
        |SELECT sample_rate, n_channels, n_assets, total_duration_us,
        |  round(CAST(total_duration_us AS DOUBLE)
        |    / CAST(n_assets AS DOUBLE), 2) AS avg_duration_us,
        |  round(CAST(n_assets AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS asset_share
        |FROM cells CROSS JOIN tot
        |ORDER BY sample_rate, n_channels""".stripMargin,

    "multimodal_decode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
        |    CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
        |    CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END AS junk
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_channels, sample_rate,
        |    CAST(n_channels * 2 AS INTEGER) AS block_align,
        |    CAST(sample_rate * n_channels * 2 AS BIGINT) AS byte_rate,
        |    CAST(n_samples * n_channels * 2 AS BIGINT) AS data_bytes, junk
        |  FROM p)
        |SELECT doc_id, 'audio' AS modality,
        |  CAST(44 + data_bytes + junk AS BIGINT) AS n_bytes,
        |  CAST(36 + data_bytes + junk AS BIGINT) AS riff_size,
        |  CAST(1 AS INTEGER) AS audio_format, n_channels, sample_rate,
        |  byte_rate, block_align, CAST(16 AS INTEGER) AS bits_per_sample,
        |  data_bytes,
        |  CAST(data_bytes * 1000000 // byte_rate AS BIGINT) AS duration_us
        |FROM q ORDER BY doc_id""".stripMargin,

    // same synthesized-container arithmetic as the decode oracle,
    // folded to the per-class byte ledger
    "multimodal_bitrate_audit" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
        |    CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
        |    CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END AS junk
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_channels, sample_rate,
        |    CAST(n_samples * n_channels * 2 AS BIGINT) AS data_bytes, junk
        |  FROM p),
        |a AS (
        |  SELECT sample_rate, n_channels,
        |    CAST(44 + data_bytes + junk AS BIGINT) AS n_bytes, data_bytes
        |  FROM q)
        |SELECT sample_rate, n_channels, count(*) AS n_assets,
        |  CAST(sum(CASE WHEN n_bytes - data_bytes > 44 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_noncanonical,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(data_bytes) AS BIGINT) AS payload_bytes,
        |  CAST(sum(n_bytes) - sum(data_bytes) AS BIGINT) AS overhead_bytes,
        |  round(CAST(sum(n_bytes) - sum(data_bytes) AS DOUBLE)
        |    / sum(n_bytes), 6) AS overhead_share,
        |  round(CAST(sample_rate AS DOUBLE) * n_channels * 16 / 1000, 6)
        |    AS nominal_kbps
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // ASCII fixture contract: byte offsets == char offsets, ascii() ==
    // byte value — the same contract every byte-slicing oracle here uses
    "multimodal_phash" ->
      """WITH d AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |p AS (
        |  SELECT doc_id, text, CAST(n // 64 AS INT) AS bl FROM d),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), b ->
        |      CAST(list_sum(list_transform(generate_series(1, bl),
        |        i -> ascii(substring(text, CAST(b * bl + i AS INT), 1))))
        |        AS BIGINT)) AS sums
        |  FROM p),
        |ph AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(generate_series(0, 63), b ->
        |      CASE WHEN sums[b + 1] * 64 > list_sum(sums)
        |           THEN '1' ELSE '0' END), '') AS phash
        |  FROM s)
        |SELECT doc_id, phash,
        |  count(*) OVER (PARTITION BY phash) AS n_same_hash
        |FROM ph ORDER BY doc_id""".stripMargin,

    "multimodal_image_tiles" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST((octet_length(encode(text)) // 16) // 4 AS INT)
        |      AS trows
        |  FROM documents
        |  WHERE CAST((octet_length(encode(text)) // 16) // 4 AS INT)
        |    >= 1),
        |gr AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, trows - 1)) AS tr
        |  FROM d),
        |g AS (
        |  SELECT doc_id, text, tr, tc.v AS tc
        |  FROM gr
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS v) tc),
        |tl AS (
        |  SELECT doc_id, tr, tc,
        |    substring(text, CAST((tr * 4 + 0) * 16 + tc * 4 + 1 AS INT),
        |      4)
        |    || substring(text,
        |      CAST((tr * 4 + 1) * 16 + tc * 4 + 1 AS INT), 4)
        |    || substring(text,
        |      CAST((tr * 4 + 2) * 16 + tc * 4 + 1 AS INT), 4)
        |    || substring(text,
        |      CAST((tr * 4 + 3) * 16 + tc * 4 + 1 AS INT), 4) AS tile
        |  FROM g)
        |SELECT doc_id, CAST(tr AS BIGINT) AS tile_row,
        |  CAST(tc AS BIGINT) AS tile_col, md5(tile) AS digest,
        |  CAST(list_sum(list_transform(generate_series(1, 16),
        |    i -> ascii(substring(tile, i, 1)))) AS BIGINT) AS energy
        |FROM tl ORDER BY doc_id, tile_row, tile_col""".stripMargin,

    "multimodal_tile_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST((octet_length(encode(text)) // 16) // 4 AS INT)
        |      AS trows
        |  FROM documents
        |  WHERE CAST((octet_length(encode(text)) // 16) // 4 AS INT)
        |    >= 1),
        |gr AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, trows - 1)) AS tr
        |  FROM d),
        |g AS (
        |  SELECT doc_id, text, tr, tc.v AS tc
        |  FROM gr
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS v) tc),
        |tl AS (
        |  SELECT doc_id,
        |    substring(text, CAST((tr * 4 + 0) * 16 + tc * 4 + 1 AS INT),
        |      4)
        |    || substring(text,
        |      CAST((tr * 4 + 1) * 16 + tc * 4 + 1 AS INT), 4)
        |    || substring(text,
        |      CAST((tr * 4 + 2) * 16 + tc * 4 + 1 AS INT), 4)
        |    || substring(text,
        |      CAST((tr * 4 + 3) * 16 + tc * 4 + 1 AS INT), 4) AS tile
        |  FROM g)
        |SELECT md5(tile) AS digest, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_tiles, min(doc_id) AS first_doc
        |FROM tl GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, digest""".stripMargin
  )
}
