package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media is
  * an opaque `binary` payload plus a typed metadata struct; decode /
  * feature-extraction runs as typed `mapPartitions` over batches of
  * rows (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * The decode step itself is a STUB — this container ships no
  * image/audio codecs — implemented as a deterministic byte-statistics
  * extractor so the real parts (schema, batching, partitioning, output
  * contract) are exercised and oracle-checkable end to end. Swapping
  * in a real codec changes only the body of [[decodeBatch]].
  */
object Multimodal {

  /** A media row: payload + metadata as a typed column bundle. */
  case class MediaRow(doc_id: Long, payload: Array[Byte],
                      width: Int, height: Int, channels: Int)

  /** Extracted features per media item. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double,
                           max_byte: Int, min_byte: Int)

  /** Synthesize deterministic 16-byte "images" from the documents
    * table (md5 of the text), with a fixed 4x4x1 metadata struct —
    * the stand-in for reading real image bytes + EXIF-ish metadata. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, dir).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      lit(4).as("width"), lit(4).as("height"), lit(1).as("channels"))
      .as[MediaRow]
  }

  /** The batch "decode": per partition, iterate rows and extract
    * features from the payload bytes. Real codecs plug in here. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val b = r.payload.map(_ & 0xFF)
      MediaFeatures(r.doc_id, b.length,
        b.sum.toDouble / b.length, b.max, b.min)
    }

  /** mm1: feature extraction over the media payloads. */
  def mm1MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions(decodeBatch)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** mm2: frame sampling — take every k-th byte of the payload (the
    * stand-in for fixed-rate video frame / audio sample extraction)
    * and emit one row per sampled frame with its offset. The explode
    * shape (one media row → many frame rows) is the real contract a
    * decoder plugs into. */
  def mm2FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 4
    mediaTable(s, dir)
      .flatMap { r =>
        r.payload.indices.collect {
          case i if i % k == 0 => (r.doc_id, i, r.payload(i) & 0xFF)
        }
      }
      .toDF("doc_id", "frame_offset", "frame_value")
      .orderBy(col("doc_id"), col("frame_offset"))
  }

  /** One output pixel of a resized media item (row-per-pixel so the
    * gate comparator sees only scalar columns). */
  case class ResizedPixel(doc_id: Long, out_w: Int, out_h: Int,
                          px_index: Int, value: Int)

  /** mm3: nearest-neighbour resize — the index arithmetic
    * (out(i,j) = in(i*h/oh, j*w/ow)) and the per-partition batch shape
    * are the real resize contract; a codec-backed implementation
    * changes only how the source pixel grid is obtained. 4x4 -> 2x2
    * here, i.e. source pixels (0,0),(0,2),(2,0),(2,2). */
  def mm3Resize(s: SparkSession, dir: String, ow: Int = 2, oh: Int = 2): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .flatMap { r =>
        for (i <- 0 until oh; j <- 0 until ow) yield {
          val si = i * r.height / oh
          val sj = j * r.width / ow
          ResizedPixel(r.doc_id, ow, oh, i * ow + j,
            r.payload(si * r.width + sj) & 0xFF)
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("px_index"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mm1MediaFeatures _),
    "mm2_frame_sample" -> (mm2FrameSample _),
    "mm3_resize" -> ((s: SparkSession, dir: String) => mm3Resize(s, dir))
  )

  val oracles: Map[String, String] = Map(
    "mm2_frame_sample" ->
      """WITH bytes AS (
           SELECT doc_id,
             [CAST('0x' || substr(md5(text), 2*i - 1, 2) AS INT)
              FOR i IN range(1, 17)] AS b
           FROM documents)
         SELECT doc_id, (i - 1) AS frame_offset, b[i] AS frame_value
         FROM bytes, unnest(range(1, 17)) AS t(i)
         WHERE (i - 1) % 4 = 0
         ORDER BY doc_id, frame_offset""",
    // nearest-neighbour 4x4 -> 2x2: source pixels at flat indices
    // 0, 2, 8, 10 (1-based list positions 1, 3, 9, 11)
    "mm3_resize" ->
      """WITH bytes AS (
           SELECT doc_id,
             [CAST('0x' || substr(md5(text), 2*i - 1, 2) AS INT)
              FOR i IN range(1, 17)] AS b
           FROM documents),
         px AS (
           SELECT doc_id, 0 AS px_index, b[1] AS value FROM bytes
           UNION ALL SELECT doc_id, 1, b[3] FROM bytes
           UNION ALL SELECT doc_id, 2, b[9] FROM bytes
           UNION ALL SELECT doc_id, 3, b[11] FROM bytes)
         SELECT doc_id, 2 AS out_w, 2 AS out_h, px_index, value
         FROM px ORDER BY doc_id, px_index""",
    // Decode the same md5 payload byte-by-byte in SQL.
    "mm1_media_features" ->
      """WITH bytes AS (
           SELECT doc_id,
             [CAST('0x' || substr(md5(text), 2*i - 1, 2) AS INT)
              FOR i IN range(1, 17)] AS b
           FROM documents)
         SELECT doc_id, len(b) AS n_bytes,
           CAST(list_sum(b) AS DOUBLE) / len(b) AS mean_byte,
           list_max(b) AS max_byte, list_min(b) AS min_byte
         FROM bytes ORDER BY doc_id"""
  )
}
