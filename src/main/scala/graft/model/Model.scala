package graft.model

/** Core data model for the entity-resolution engine.
  *
  * The primary input is the `docs` table from BASELINE.json `input_hint`:
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)` —
  * the interleaved span sequence is the per-entity trajectory (reference
  * analogue: per-user time-sorted trip array, AMPI.scala:86-90).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** Gold label: which entity generated a doc (synth only / eval only). */
final case class GoldCluster(doc_id: String, entity_id: String)

/** A labeled pair evaluated AT a shared blocking key — mirrors the
  * reference's IdMap of high-confidence pairs (FilterGroundTruth.scala:15-31).
  */
final case class LabeledPair(doc_id_a: String, doc_id_b: String, block_key: Long, is_match: Boolean)

/** Blocking-stage output row. */
final case class BlockEntry(block_key: Long, doc_id: String)

/** Candidate pair after the block self-join (doc_id_a < doc_id_b). */
final case class CandidatePair(doc_id_a: String, doc_id_b: String, block_key: Long)

/** Scored pair: three evidence channels + blended score
  * (reference analogue: ol_1/ol_2 blend AMPI.scala:298-306,385-392, plus
  * the rank-decayed alignment score with Q+P+R normalization,
  * AMPI.scala:393-405).
  *
  * `media_usable` (both sides carried ≥ minMediaEvidence media tokens) and
  * `vetoed` (M7 exclusive-id conflict) record the two blend-path decisions
  * that are NOT recoverable from the channel scores alone — committed so a
  * parameter sweep (reference AMPI.scala:371-421) can re-blend the channels
  * under a different ScoreConfig without re-scoring any pair.
  */
final case class ScoredPair(
    doc_id_a: String,
    doc_id_b: String,
    block_key: Long,
    sim_text: Double,
    sim_media: Double,
    sim_align: Double,
    score: Double,
    media_usable: Boolean,
    vetoed: Boolean)

/** Final cluster assignment; cluster_id = min doc_id in the cluster. */
final case class ClusterAssignment(doc_id: String, cluster_id: String)

/** Per-partition lineage row committed with every stage snapshot
  * (reference analogue: LongAccumulator side channels,
  * APCompletion.scala:210-258, upgraded per the north rule).
  */
final case class LineageRow(
    run_id: String,
    stage: String,
    snapshot_id: Long,
    /** partition index as seen when READING the committed files back (what
      * a resumed consumer observes), not the writer task id */
    read_partition_id: Int,
    rows_out: Long,
    counters: Map[String, Long],
    committed_at: java.sql.Timestamp)
