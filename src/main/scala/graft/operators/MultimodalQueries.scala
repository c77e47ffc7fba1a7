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

  val all: Seq[Q] = Seq(

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
