package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries over the synthesized media corpus (binary
  * payloads derived from `documents`): payload stats through the
  * binary column, and video frame fan-out. The decode stub itself is
  * covered by MultimodalSpec; these check the distributed plumbing
  * (binary handling, metadata, row fan-out) against SQL oracles.
  */
object MultimodalQueries {

  /** The images fixture as (media_id, content) — payloads only; the
    * block_sums columns are the ORACLE's input and must never reach
    * the Spark side. */
  private def imageFixture(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload_b64",
        org.apache.spark.sql.types.StringType)))
    s.read.schema(schema)
      .json(s"${IngestQueries.fixturesDir}/images.jsonl")
      .select(col("media_id"), unbase64(col("payload_b64")).as("content"))
  }

  /** The audio fixture as (media_id, content) — payloads only; the
    * cell_sums columns are the ORACLE's input and must never reach
    * the Spark side. */
  private def audioFixture(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload_b64",
        org.apache.spark.sql.types.StringType)))
    s.read.schema(schema)
      .json(s"${IngestQueries.fixturesDir}/audio.jsonl")
      .select(col("media_id"), unbase64(col("payload_b64")).as("content"))
  }

  /** Shared oracle CTE assembling the 64-bit audio hash from the
    * fixture's pattern-derived cell sums (uniform cells, so "cell
    * mean strictly above global mean" ⇔ `sum·64 > total`; bit 1 is
    * the sign bit, added as the min-Long literal). */
  private def audioHashSql: String = s"""
      clips AS (
        SELECT media_id, n_samples, cell_sums
        FROM read_json('${IngestQueries.fixturesDir}/audio.jsonl',
          format='newline_delimited',
          columns={'media_id': 'BIGINT', 'codec': 'VARCHAR',
            'n_samples': 'BIGINT', 'cell_sums': 'BIGINT[]',
            'payload_b64': 'VARCHAR'})
      ), e AS (
        SELECT media_id, cell_sums, list_sum(cell_sums) AS total,
          unnest(generate_series(1, 64)) AS i
        FROM clips WHERE cell_sums IS NOT NULL
      ), h AS (
        SELECT media_id,
          CAST(SUM(CASE WHEN cell_sums[i] * 64 > total THEN
            CASE WHEN i = 1 THEN (-9223372036854775807 - 1)
                 ELSE (CAST(1 AS BIGINT) << (64 - i)) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM e GROUP BY media_id)"""

  val all: Seq[Q] = Seq(

    // REAL audio decode → 64-bit perceptual average-hash against a
    // cross-language oracle: the fixture's WAVs are stdlib-encoded
    // 16-bit signed and 8-bit unsigned PCM with |amplitude| BLOCK
    // CONSTANT on the 64-cell time grid; each row stores per-cell
    // amplitude sums derived from the PATTERN FORMULA (in
    // round(|s|·32768) units), never from decoding the payload.
    // Spark must recover identical sums from javax.sound.sampled's
    // decoded floats. Duration invariance (media 1 vs 2: same
    // pattern, 2× the samples) and bit-depth invariance (media 3:
    // the 8-bit unsigned decode path) must hash IDENTICALLY.
    // Undecodable bytes (media 10) emit all-null, not a failure.
    Q("q181_audio_hash", Some(s"""
      WITH $audioHashSql
      SELECT clips.media_id, n_samples, h.ahash
      FROM clips LEFT JOIN h USING (media_id)
      ORDER BY media_id""")) { (s, _) =>
      Multimodal.audioHashes(audioFixture(s)).orderBy("media_id")
    },

    // Audio near-duplicate pairs over the q181 fingerprints: Spark
    // pairs via the banded Manku join (exact full recall for
    // hamming ≤ 3, never all-pairs); the oracle brute-forces every
    // pair of SQL-derived hashes, so the band join's completeness is
    // itself under test. Expected structure (pinned by the
    // generator): the duration/bit-depth re-renders at distance 0,
    // the 1/2/3-cell edits at their distances, the inverted and flat
    // patterns pair with nothing.
    Q("q182_audio_near_dup", Some(s"""
      WITH $audioHashSql
      SELECT a.media_id AS id_a, b.media_id AS id_b,
        CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
      FROM h a JOIN h b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
      ORDER BY id_a, id_b""")) { (s, _) =>
      graft.analytics.Dedup.hamming64NearDups(
          Multimodal.audioHashes(audioFixture(s)),
          "media_id", "ahash", maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    Q("q37_media_stats", Some("""
      SELECT media_id, kind,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        md5(text) AS checksum
      FROM (
        SELECT doc_id AS media_id,
          (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
          text
        FROM documents)
      ORDER BY media_id""")) { (s, dir) =>
      val media = Multimodal.synthesizeCorpus(
        Tables.load(s, dir, "documents"))
      media.select(col("media_id"), col("kind"),
          length(col("content")).as("n_bytes"),
          md5(col("content")).as("checksum"))
        .orderBy("media_id")
    },

    // Video container metadata against a cross-language oracle: the
    // fixture's MP4/Matroska payloads were SYNTHESIZED (by
    // tools/gen_media_fixture.py, a Python generator independent of
    // the Scala parser) from the metadata fields stored in the same
    // row. Spark recovers the metadata from the BYTES alone
    // (VideoContainers box/EBML walk); DuckDB recomputes it from the
    // JSON fields — duration as ticks/timescale (MP4) and
    // float32(ticks)·scale_ns/1e9 (Matroska), values chosen exactly
    // representable so both engines' IEEE arithmetic is bit-identical.
    // Unparseable payloads (garbage text, a truncated MP4) must come
    // back all-null, audio-only containers with 0×0 dims — distinct
    // outcomes a pipeline filters on.
    Q("q101_video_metadata", Some(s"""
      SELECT media_id,
        CASE WHEN kind = 'mp4' THEN 'mp4/' || doctype
             WHEN kind = 'ebml' THEN doctype
             WHEN kind = 'avi' THEN 'avi' END AS container,
        CASE WHEN kind = 'mp4'
               THEN CAST(duration_ticks AS DOUBLE) / timescale
             WHEN kind = 'ebml'
               THEN CAST(CAST(duration_ticks AS FLOAT) AS DOUBLE)
                 * timescale / 1e9
             WHEN kind = 'avi'
               THEN CAST(duration_ticks AS DOUBLE) / timescale
             END AS duration_s,
        codec,
        CAST(width AS INT) AS width,
        CAST(height AS INT) AS height,
        CAST(n_tracks AS INT) AS n_tracks
      FROM read_json('${IngestQueries.fixturesDir}/media.jsonl',
        format='newline_delimited',
        columns={'media_id': 'BIGINT', 'kind': 'VARCHAR',
          'doctype': 'VARCHAR', 'timescale': 'BIGINT',
          'duration_ticks': 'BIGINT', 'codec': 'VARCHAR',
          'width': 'INT', 'height': 'INT', 'n_tracks': 'INT',
          'payload_b64': 'VARCHAR'})
      ORDER BY media_id""")) { (s, _) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload_b64",
          org.apache.spark.sql.types.StringType)))
      val media = s.read.schema(schema)
        .json(s"${IngestQueries.fixturesDir}/media.jsonl")
        .select(col("media_id"), lit("video").as("kind"),
          unbase64(col("payload_b64")).as("content"))
      Multimodal.videoMetadata(media).orderBy("media_id")
    },

    // REAL video frame decode against a cross-language oracle: the
    // fixture's AVI payloads carry MJPEG frames hand-assembled (by
    // tools/gen_media_fixture.py) from flat DC-only 8x8 blocks with a
    // quant step of 8, which any conformant JPEG decoder reconstructs
    // EXACTLY — so the per-frame mean luma recorded in the JSON row
    // (frame_lumas) equals what javax.imageio recovers from the bytes
    // alone, bit-for-bit. The non-MJPEG AVI (media_id 11) must emit
    // no rows: its frame chunks are not JPEGs and skip, not fail.
    Q("q102_video_frames", Some(s"""
      SELECT media_id,
        CAST(unnest(range(len(frame_lumas))) AS INT) AS frame_idx,
        CAST(width AS INT) AS width,
        CAST(height AS INT) AS height,
        unnest(frame_lumas) AS mean_luma
      FROM read_json('${IngestQueries.fixturesDir}/media.jsonl',
        format='newline_delimited',
        columns={'media_id': 'BIGINT', 'kind': 'VARCHAR',
          'width': 'INT', 'height': 'INT',
          'frame_lumas': 'DOUBLE[]', 'payload_b64': 'VARCHAR'})
      WHERE frame_lumas IS NOT NULL
      ORDER BY media_id, frame_idx""")) { (s, _) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload_b64",
          org.apache.spark.sql.types.StringType)))
      val media = s.read.schema(schema)
        .json(s"${IngestQueries.fixturesDir}/media.jsonl")
        .select(col("media_id"), lit("video").as("kind"),
          unbase64(col("payload_b64")).as("content"))
      Multimodal.videoFrames(media).toDF()
        .select(col("media_id"), col("frame_idx").cast("int"),
          col("width").cast("int"), col("height").cast("int"),
          col("mean_luma"))
        .orderBy("media_id", "frame_idx")
    },

    // REAL video frame decode → per-FRAME 64-bit average-hash: the
    // q102 MJPEG toolchain composed with the q175 fingerprint. The
    // fixture stores per-frame CELL LUMA SUMS derived from the block
    // PATTERN formula (never from decoding the payload); Spark must
    // recover identical cell sums from javax.imageio's decoded
    // pixels, and DuckDB assembles each frame's hash from the stored
    // sums with pure BIGINT arithmetic (cell over global mean ⇔
    // sum·64 > total at the fixture's equal-cell geometries; bit 1
    // is the sign bit, added as the min-Long literal). Uniform
    // frames must hash to 0 (no cell STRICTLY above the mean), the
    // checkerboard and its inversion to complementary patterns; the
    // non-MJPEG AVI (media 11) emits no rows.
    Q("q257_video_frame_ahash", Some(s"""
      WITH v AS (
        SELECT media_id, frame_cell_sums
        FROM read_json('${IngestQueries.fixturesDir}/media.jsonl',
          format='newline_delimited',
          columns={'media_id': 'BIGINT', 'kind': 'VARCHAR',
            'frame_cell_sums': 'BIGINT[][]', 'payload_b64': 'VARCHAR'})
        WHERE frame_cell_sums IS NOT NULL),
      f AS (
        SELECT media_id,
          CAST(unnest(range(len(frame_cell_sums))) AS INT) AS frame_idx,
          unnest(frame_cell_sums) AS cells
        FROM v),
      e AS (
        SELECT media_id, frame_idx, cells, list_sum(cells) AS total,
          unnest(generate_series(1, 64)) AS i
        FROM f),
      h AS (
        SELECT media_id, frame_idx,
          CAST(SUM(CASE WHEN cells[i] * 64 > total THEN
            CASE WHEN i = 1 THEN (-9223372036854775807 - 1)
                 ELSE (CAST(1 AS BIGINT) << (64 - i)) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM e GROUP BY media_id, frame_idx)
      SELECT media_id, frame_idx, ahash FROM h
      ORDER BY media_id, frame_idx""")) { (s, _) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload_b64",
          org.apache.spark.sql.types.StringType)))
      val media = s.read.schema(schema)
        .json(s"${IngestQueries.fixturesDir}/media.jsonl")
        .select(col("media_id"), lit("video").as("kind"),
          unbase64(col("payload_b64")).as("content"))
      Multimodal.videoFrameAHashes(media).toDF()
        .select(col("media_id"), col("frame_idx").cast("int"),
          col("ahash"))
        .orderBy("media_id", "frame_idx")
    },

    // Video near-dup by frame-fingerprint sets — the re-encode
    // detector over the q257 hashes: media 13 is media 12 re-encoded
    // at 2× resolution, and because the aHash is resolution-invariant
    // for block-constant content the pair MUST score jaccard 1.0;
    // videos sharing only degenerate frames (uniform frames hash 0:
    // media 9 ∩ media 10) surface as the low-jaccard tail a caller
    // thresholds away. The oracle re-derives every per-video hash set
    // from the stored cell sums (decoder-independent) and
    // brute-forces the pair lattice.
    Q("q259_video_near_dup", Some(s"""
      WITH v AS (
        SELECT media_id, frame_cell_sums
        FROM read_json('${IngestQueries.fixturesDir}/media.jsonl',
          format='newline_delimited',
          columns={'media_id': 'BIGINT', 'kind': 'VARCHAR',
            'frame_cell_sums': 'BIGINT[][]', 'payload_b64': 'VARCHAR'})
        WHERE frame_cell_sums IS NOT NULL),
      f AS (
        SELECT media_id,
          CAST(unnest(range(len(frame_cell_sums))) AS INT) AS fr,
          unnest(frame_cell_sums) AS cells
        FROM v),
      e AS (
        SELECT media_id, fr, cells, list_sum(cells) AS total,
          unnest(generate_series(1, 64)) AS i
        FROM f),
      h AS (
        SELECT media_id, fr,
          CAST(SUM(CASE WHEN cells[i] * 64 > total THEN
            CASE WHEN i = 1 THEN (-9223372036854775807 - 1)
                 ELSE (CAST(1 AS BIGINT) << (64 - i)) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM e GROUP BY media_id, fr),
      hs AS (SELECT DISTINCT media_id, ahash FROM h),
      sz AS (
        SELECT media_id, COUNT(*) AS set_size FROM hs GROUP BY 1),
      p AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b,
          COUNT(*) AS inter
        FROM hs a JOIN hs b
          ON a.ahash = b.ahash AND a.media_id < b.media_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        CAST(sa.set_size AS BIGINT) AS size_a,
        CAST(sb.set_size AS BIGINT) AS size_b,
        CAST(inter AS DOUBLE)
          / CAST(sa.set_size + sb.set_size - inter AS DOUBLE)
          AS jaccard
      FROM p
      JOIN sz sa ON id_a = sa.media_id
      JOIN sz sb ON id_b = sb.media_id
      ORDER BY id_a, id_b""")) { (s, _) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload_b64",
          org.apache.spark.sql.types.StringType)))
      val media = s.read.schema(schema)
        .json(s"${IngestQueries.fixturesDir}/media.jsonl")
        .select(col("media_id"), lit("video").as("kind"),
          unbase64(col("payload_b64")).as("content"))
      Multimodal.videoNearDups(media)
        .orderBy("id_a", "id_b")
    },

    // REAL image decode → 64-bit perceptual average-hash against a
    // cross-language oracle: the fixture's PNGs are hand-rolled (and
    // one exact DC-only JPEG reused from the MJPEG toolchain) from
    // BLOCK-CONSTANT patterns on the 8×8 aHash grid; each row stores
    // the per-cell luma sums derived from the PATTERN FORMULA, never
    // from decoding the payload. Spark must recover identical sums
    // from javax.imageio's decoded pixels; DuckDB assembles the hash
    // from the stored sums with pure BIGINT arithmetic (cell mean
    // strictly above global mean ⇔ sum·64 > total at uniform cells;
    // bit 1 is the sign bit, added as the min-Long literal). The
    // same content at two resolutions AND two codecs (media 1 PNG
    // 32² vs media 7 JPEG 64²) must hash IDENTICALLY — the scale/
    // codec invariance that makes the fingerprint perceptual.
    // Undecodable bytes (media 9) emit all-null, not a failure.
    Q("q175_image_ahash", Some(s"""
      WITH imgs AS (
        SELECT media_id, width, height, block_sums
        FROM read_json('${IngestQueries.fixturesDir}/images.jsonl',
          format='newline_delimited',
          columns={'media_id': 'BIGINT', 'codec': 'VARCHAR',
            'width': 'INT', 'height': 'INT', 'n_px': 'BIGINT',
            'block_sums': 'BIGINT[]', 'payload_b64': 'VARCHAR'})
      ), e AS (
        SELECT media_id, block_sums, list_sum(block_sums) AS total,
          unnest(generate_series(1, 64)) AS i
        FROM imgs WHERE block_sums IS NOT NULL
      ), h AS (
        SELECT media_id,
          CAST(SUM(CASE WHEN block_sums[i] * 64 > total THEN
            CASE WHEN i = 1 THEN (-9223372036854775807 - 1)
                 ELSE (CAST(1 AS BIGINT) << (64 - i)) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM e GROUP BY media_id)
      SELECT imgs.media_id, width, height, h.ahash
      FROM imgs LEFT JOIN h USING (media_id)
      ORDER BY media_id""")) { (s, _) =>
      Multimodal.imageAHashes(imageFixture(s)).orderBy("media_id")
    },

    // Image near-duplicate pairs over the q175 fingerprints: Spark
    // pairs via the banded Manku join (8 blocks, 3-bad-block bucket
    // keys — EXACT full recall for hamming ≤ 3 by pigeonhole, never
    // all-pairs); the oracle brute-forces every pair of SQL-derived
    // hashes, so the band join's completeness is itself under test.
    // Expected structure (pinned by the generator): the cross-codec
    // re-render pairs at distance 0, the 1/2-block edits at 1/2, the
    // inverted and flat patterns pair with nothing.
    Q("q176_image_near_dup", Some(s"""
      WITH imgs AS (
        SELECT media_id, block_sums
        FROM read_json('${IngestQueries.fixturesDir}/images.jsonl',
          format='newline_delimited',
          columns={'media_id': 'BIGINT', 'codec': 'VARCHAR',
            'width': 'INT', 'height': 'INT', 'n_px': 'BIGINT',
            'block_sums': 'BIGINT[]', 'payload_b64': 'VARCHAR'})
      ), e AS (
        SELECT media_id, block_sums, list_sum(block_sums) AS total,
          unnest(generate_series(1, 64)) AS i
        FROM imgs WHERE block_sums IS NOT NULL
      ), h AS (
        SELECT media_id,
          CAST(SUM(CASE WHEN block_sums[i] * 64 > total THEN
            CASE WHEN i = 1 THEN (-9223372036854775807 - 1)
                 ELSE (CAST(1 AS BIGINT) << (64 - i)) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM e GROUP BY media_id)
      SELECT a.media_id AS id_a, b.media_id AS id_b,
        CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
      FROM h a JOIN h b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
      ORDER BY id_a, id_b""")) { (s, _) =>
      graft.analytics.Dedup.hamming64NearDups(
          Multimodal.imageAHashes(imageFixture(s)),
          "media_id", "ahash", maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    Q("q38_frame_sample", Some("""
      SELECT media_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx
      FROM (
        SELECT doc_id AS media_id, CAST(n_chars % 30 + 1 AS INT) AS n_frames
        FROM documents
        WHERE (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] = 'video')
      ORDER BY media_id, frame_idx""")) { (s, dir) =>
      val media = Multimodal.synthesizeCorpus(
        Tables.load(s, dir, "documents"))
      Multimodal.sampleFrames(media, stride = 10)
        .select(col("media_id"), col("frame_idx").cast("int")
          .as("frame_idx"))
        .orderBy("media_id", "frame_idx")
    }
  )
}
