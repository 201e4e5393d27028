package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analog of a Pandas-UDF/`mapInPandas` stage).
  *
  * The decode step is STUBBED (`decodeStub`): this container has no
  * image/audio codecs, so it derives deterministic fake dimensions /
  * features from the bytes. Everything around it — schema, partitioning,
  * batch iteration shape, feature-vector contract — is the real pipeline.
  * At 100 TB: payloads stay columnar in Parquet (binary chunks are
  * page-compressed, metadata columns prune without touching bytes);
  * decode parallelism = repartition count; nothing is collected.
  */
object Multimodal {

  /** One media object: payload + typed metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoded features: dimensions + fixed-width embedding. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, feature: Array[Float])

  /** STUB for the codec call (would be e.g. javax.imageio / ffmpeg in a
    * real deployment). Deterministic: dims and features are FNV-1a hashes
    * of the payload, so tests and reruns agree. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val width = 64 + (h & 0x3ff).toInt          // fake 64..1087 px
    val height = 64 + ((h >>> 10) & 0x3ff).toInt
    val feat = new Array[Float](8)
    var k = 0
    var g = h
    while (k < 8) {
      g ^= g >>> 33; g *= 0xff51afd7ed558ccdL; g ^= g >>> 33
      feat(k) = ((g & 0xffff).toInt - 32768) / 32768.0f
      k += 1
    }
    (width, height, feat)
  }

  /** The media "table": document text bytes standing in for payloads
    * (binary column + kind metadata) — same shape as an image/audio lake. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Engine.table(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("media/"),
          (col("doc_id") % 3).cast("int").cast("string")).as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Per-partition batch decode + featurize — the `mapInPandas` analog:
    * one iterator pass per partition, no driver collection, output is a
    * narrow typed Dataset. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, feat) = decodeStub(m.media)
        MediaFeatures(m.doc_id, m.kind, m.media.length, w, h, feat)
      }
    }
  }

  /** One sampled frame: parent doc, frame index, frame payload slice +
    * its decoded feature. */
  case class Frame(doc_id: Long, kind: String, frame_idx: Int,
                   frame_bytes: Int, feature: Array[Float])

  /** Frame sampling — the video analog: slice each payload into
    * fixed-stride "frames", keep every `stride`-th one, featurize each.
    * Fan-out happens per partition (flatMap inside mapPartitions), so a
    * 1-hour payload never materializes all frames on the driver; at
    * 100 TB frame rows inherit the parent's partitioning and flow
    * straight into the next stage. Frame decode shares [[decodeStub]]
    * (a real deployment would call the codec per keyframe). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 64,
                   stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val nFrames = math.max(1, m.media.length / frameSize)
        Iterator.range(0, nFrames, stride).map { i =>
          val slice = java.util.Arrays.copyOfRange(
            m.media, i * frameSize,
            math.min((i + 1) * frameSize, m.media.length))
          val (_, _, feat) = decodeStub(slice)
          Frame(m.doc_id, m.kind, i, slice.length, feat)
        }
      }
    }
  }

  /** A "resized" media row: original identity + target dims + the
    * transformed payload. */
  case class ResizedMedia(doc_id: Long, kind: String,
                          width: Int, height: Int, media: Array[Byte])

  /** Resize transform (stubbed codec, real plumbing): deterministic
    * nearest-neighbor-style byte decimation to a payload proportional to
    * the target pixel count — stands in for a real image resize the way
    * [[decodeStub]] stands in for a decoder. Per-partition, no driver
    * materialization; output rows inherit the input partitioning. */
  def resizeMedia(media: Dataset[MediaRow],
                  targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    val targetLen = math.max(1, (targetW.toLong * targetH / 64).toInt)
    media.mapPartitions { rows =>
      rows.map { m =>
        val src = m.media
        val out =
          if (src.isEmpty) Array.emptyByteArray // zero-byte blob: keep empty
          else {
            val o = new Array[Byte](math.min(targetLen, src.length))
            val step = math.max(1.0, src.length.toDouble / o.length)
            var i = 0
            while (i < o.length) {
              o(i) = src(math.min(src.length - 1, (i * step).toInt))
              i += 1
            }
            o
          }
        ResizedMedia(m.doc_id, m.kind, targetW, targetH, out)
      }
    }
  }

  /** Frame-sampling inventory entry. ORACLE-EXACT: the surfaced stats
    * (frame count, doc count, total sliced bytes) are pure length
    * arithmetic over the stride-sampling contract — nFrames =
    * max(1, len/64), indices 0,4,8,…, slice = min(64, len − i·64) — so
    * DuckDB mirrors them with `range()`/`least`/`greatest` and no hash
    * simulation at all. The per-frame feature vectors (not surfaced)
    * stay pinned by LlmOpsSpec. */
  def qMediaFrames(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(s, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("frame_bytes")).as("total_bytes"))
      .orderBy(col("kind"))

  /** Inventory entry: decode features + per-kind stats. ORACLE-EXACT —
    * the stub's dims are FNV-1a of the payload bytes, and the payload is
    * the ASCII document text, so DuckDB can recompute the hash with
    * HUGEINT wrap-around arithmetic (same technique as
    * Dedup.qDedupSimhashSql) and hash-check every stat. The feature
    * array (not surfaced here) stays pinned by LlmOpsSpec. */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h"))
      .orderBy(col("kind"))

  /** FNV-1a over each doc's full payload as a per-char recursive CTE
    * with mod-2^64 HUGEINT arithmetic; width = 64 + (h & 0x3ff) and
    * height = 64 + ((h >>> 10) & 0x3ff) become exact divisions by
    * power-of-two literals. ASCII payloads make DuckDB's `unicode()`
    * equal Java's UTF-16 code units. */
  val qMediaFeaturesSql: String =
    """WITH RECURSIVE f(doc_id, n, i, h) AS (
      |  SELECT doc_id, len(text), 0, CAST('14695981039346656037' AS HUGEINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT f.doc_id, f.n, f.i + 1,
      |    (xor(f.h, CAST(unicode(substr(d.text, f.i + 1, 1)) AS HUGEINT))
      |       * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)
      |  FROM f JOIN documents d ON f.doc_id = d.doc_id WHERE f.i < f.n
      |), hh AS (
      |  SELECT doc_id, n, h FROM f WHERE i = n
      |)
      |SELECT 'media/' || CAST(doc_id % 3 AS VARCHAR) AS kind,
      |  count(*) AS n_media,
      |  CAST(sum(n) AS BIGINT) AS total_bytes,
      |  CAST(min(64 + (h % 1024)) AS INT) AS min_w,
      |  CAST(max(64 + ((h // 1024) % 1024)) AS INT) AS max_h
      |FROM hh GROUP BY 1 ORDER BY 1""".stripMargin

  /** Frame geometry mirrored as arithmetic (see [[qMediaFrames]]). */
  val qMediaFramesSql: String =
    """WITH docs AS (
      |  SELECT doc_id, 'media/' || CAST(doc_id % 3 AS VARCHAR) AS kind,
      |    len(text) AS n, greatest(1, len(text) // 64) AS nf
      |  FROM documents
      |), frames AS (
      |  SELECT doc_id, kind, n,
      |    unnest(range(0, CAST(nf AS BIGINT), 4)) AS i
      |  FROM docs
      |)
      |SELECT kind, count(*) AS n_frames, count(DISTINCT doc_id) AS n_docs,
      |  CAST(sum(least(64, greatest(0, n - i * 64))) AS BIGINT)
      |    AS total_bytes
      |FROM frames GROUP BY kind ORDER BY kind""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> (qMediaFeatures _),
    "q_media_frames" -> (qMediaFrames _))

  val oracles: Map[String, String] = Map(
    "q_media_features" -> qMediaFeaturesSql,
    "q_media_frames" -> qMediaFramesSql)
}
