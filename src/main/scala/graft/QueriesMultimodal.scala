package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.CdcEnvelope
import graft.operators.{Batching, Enrichment, Filters, PartitionKeys}
import graft.functions.{Dedup, Multimodal, Similarity, TextFunctions => TF}

/** Multimodal columns: binary payloads with typed metadata.
  *
  * One slice of the [[Queries]] catalog — registrations run at
  * trait initialization, in the linearization order [[Queries]]
  * declares, so the catalog order is identical to the pre-split
  * single file. */
private[graft] trait QueriesMultimodal { this: QueryDomain =>

  // ==========================================================================
  // Multimodal columns (binary payloads + typed metadata; decode stubbed)
  // ==========================================================================

  register("mm_payload_stats", Some(
    """SELECT doc_id AS asset_id,
      |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  upper(hex(CAST(substring(text, 1, 4) AS BLOB))) AS magic,
      |  (['jpeg','wav','mp4'])[CAST(doc_id % 3 AS INT) + 1] AS format,
      |  (doc_id * 31) % 60000 + 1000 AS duration_ms
      |FROM documents""".stripMargin)) { (s, dir) =>
    Multimodal.payloadStats(
      Multimodal.assetsFromDocuments(Tables.documents(s, dir)))
      .drop("content_xxh64") // no engine-portable xxhash64 in the oracle
  }

  register("mm_frame_sample", Some(
    """WITH v AS (
      |  SELECT doc_id AS asset_id, (doc_id * 31) % 60000 + 1000 AS duration_ms
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT asset_id, duration_ms,
      |  unnest(range(0, duration_ms, 5000)) AS frame_ts_ms,
      |  CAST(unnest(range(0, duration_ms, 5000)) AS DOUBLE) / 1000.0
      |    AS frame_ts_sec
      |FROM v""".stripMargin)) { (s, dir) =>
    Multimodal.frameSamplePlan(
      Multimodal.assetsFromDocuments(Tables.documents(s, dir)), everyMs = 5000)
  }
}
