package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.{Image, ImageCodec, MediaRow}
import graft.operators.Dedup

/** Perceptual VIDEO near-dup — the temporal modality of the dedup
  * family, completing the image (q109) / audio (q116) pair. A video's
  * fingerprint is built from its sampled frames' perceptual hashes
  * ([[Multimodal.sampleFrames]] → [[ImageHash.dHash64]]), so re-encoded,
  * re-scaled, or mildly noised copies land on near-identical frame
  * hashes — and near-duplicate detection reduces to the SAME blocked
  * Hamming machinery the other modalities use, plus one step none of
  * them need: TEMPORAL ALIGNMENT.
  *
  * Two-stage shape:
  *   1. BLOCK on the video-level temporal signature — the per-bit
  *      MAJORITY vote across the video's sampled frame hashes (bit b of
  *      the signature is set iff more than half the frames set bit b).
  *      The majority vote is what makes the signature robust: a few
  *      inserted/branded/corrupt frames cannot move it, while averaging
  *      or XOR-folding would. Signature pairs within `maxHamming` come
  *      from the pigeonhole-blocked join ([[Dedup.simHashPairsBlocked]]
  *      — never all-pairs).
  *   2. VERIFY alignment — candidate pairs join their per-frame hash
  *      sequences position-by-position (sampled order rank), and a pair
  *      survives only when at least `minAlignedFrac` of the overlapping
  *      positions are within `frameRadius` Hamming bits. This is what
  *      separates "same footage" from "same title card": two videos can
  *      share a majority signature while their timelines disagree
  *      frame-for-frame, and only the aligned pair is a near-dup.
  *
  * Scale: fingerprinting is a partition-streamed decode (one pass per
  * payload, no shuffle); the signature is one (media, bit)-keyed
  * aggregate over 16-byte rows; the blocked join sees one row per
  * video; the alignment join is equi-keyed on (pair id, rank) and
  * touches only candidate pairs' frames. Route guard at
  * `routeThreshold` videos with the corpus-dedup alternative named —
  * the image/audio family parity.
  */
object VideoHash {

  /** (media_id, frame_idx, fp) — one perceptual hash per sampled frame,
    * partition-streamed; undecodable frames drop.
    */
  def frameFingerprints(media: Dataset[MediaRow], everyN: Int,
                        codec: ImageCodec = Codecs.AutoCodec,
                        hash: Image => Long = ImageHash.dHash64
                       ): DataFrame = {
    import media.sparkSession.implicits._
    Multimodal.sampleFrames(media, everyN, codec)
      .mapPartitions(_.map(f => (f.mediaId, f.frameIdx, hash(f.image))))
      .toDF("media_id", "frame_idx", "fp")
  }

  /** Per-video temporal signature: the per-bit majority vote across the
    * video's sampled frame hashes (strict majority — a tied bit reads
    * 0). Returns (media_id, fp, n_frames). One explode to (media, bit)
    * keys and two hash aggregates; shuffle is 64 tiny rows per video.
    */
  def temporalSignature(frameFps: DataFrame): DataFrame =
    frameFps
      .select(col("media_id"), col("fp"),
        explode(expr("sequence(0, 63)")).as("b"))
      .groupBy(col("media_id"), col("b"))
      .agg(sum(expr("(fp >> b) & 1")).as("ones"), count(lit(1)).as("n"))
      .groupBy(col("media_id"))
      .agg(sum(when(col("ones") * 2 > col("n"),
          expr("CAST(1 AS BIGINT) << b")).otherwise(0L)).as("fp"),
        max(col("n")).cast("int").as("n_frames"))

  /** Temporally-verified near-duplicate video pairs: signature-blocked
    * candidates (stage 1) surviving positional alignment (stage 2).
    * Output: (id_a, id_b, hamming, n_aligned, n_pos) — hamming is the
    * SIGNATURE distance, n_pos the overlapping sampled positions
    * (min of the two frame counts), n_aligned how many of them are
    * within `frameRadius` bits; survivors satisfy
    * n_aligned >= minAlignedFrac × n_pos.
    *
    * `maxShift` > 0 adds TRIM TOLERANCE — real video dups are clipped
    * or re-cut, so the timelines align at a nonzero offset: the verify
    * tries every offset in [-maxShift, maxShift] (frame j of A against
    * frame j+offset of B), keeps each pair's best offset (highest
    * aligned fraction; ties prefer the smallest |offset|), and adds a
    * `best_shift` column. Offsets multiply the alignment join's
    * CANDIDATE rows only (2·maxShift+1 tiny (pair, rank) rows per
    * candidate pair — never corpus-scale); the default 0 keeps the
    * q144-gated exact-position semantics and schema.
    *
    * ROUTE GUARD (image/audio family parity): above `routeThreshold`
    * videos the call REFUSES — the pair LIST is the superlinear object;
    * at corpus scale use [[dedupCorpus]] (signature-level exact-code
    * collapse + distinct-code join + connected components), or raise
    * the threshold explicitly and own the cost.
    */
  def nearDuplicates(media: Dataset[MediaRow], maxHamming: Int,
                     everyN: Int = 1, frameRadius: Int = 8,
                     minAlignedFrac: Double = 0.5,
                     codec: ImageCodec = Codecs.AutoCodec,
                     hash: Image => Long = ImageHash.dHash64,
                     numBlocks: Int = -1,
                     routeThreshold: Long = 1L << 23,
                     maxShift: Int = 0): DataFrame = {
    require(minAlignedFrac > 0.0 && minAlignedFrac <= 1.0,
      s"minAlignedFrac must be in (0, 1], got $minAlignedFrac")
    require(maxShift >= 0, s"maxShift must be >= 0, got $maxShift")
    // eager localCheckpoint: the frame table feeds the signature AND
    // both sides of the alignment join — without a lineage break each
    // consumer re-runs the full decode pass; the checkpointed frame
    // rows are 20 bytes each and die with the RDD (no unpersist
    // bookkeeping — the jointDedup house pattern)
    val fps = frameFingerprints(media, everyN, codec, hash)
      .localCheckpoint(true)
    val nVideos = fps.select(col("media_id")).distinct().count()
    require(nVideos <= routeThreshold,
      s"VideoHash.nearDuplicates: corpus has $nVideos videos > " +
        s"routeThreshold=$routeThreshold. The signature pair list has " +
        "an N²-scale candidate floor (SCALE.md q109); at this scale " +
        "use VideoHash.dedupCorpus (signature-level exact-code " +
        "collapse + distinct-code join), or raise routeThreshold " +
        "explicitly to accept the pair-join cost.")
    val sig = temporalSignature(fps)
    val sigPairs = Dedup.simHashPairsBlocked(
      sig.select(col("media_id"), col("fp")), "media_id", "fp",
      maxHamming, fp = identity, numBlocks = numBlocks)
    // positional alignment: frames align by sampled ORDER (rank), so
    // differing everyN or missing leading frames still compare the
    // sequences positionally; the window is per-video (bounded input)
    val rk = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val ranked = fps.withColumn("rk", row_number().over(rk))
    val fa = ranked.select(col("media_id").as("id_a"), col("rk"),
      col("fp").as("fp_a"))
    val fb = ranked.select(col("media_id").as("id_b"), col("rk"),
      col("fp").as("fp_b"))
    if (maxShift == 0) {
      sigPairs
        .join(fa, Seq("id_a"))
        .join(fb, Seq("id_b", "rk"))
        .groupBy(col("id_a"), col("id_b"), col("hamming"))
        .agg(sum(when(expr("bit_count(fp_a ^ fp_b)") <= frameRadius, 1L)
            .otherwise(0L)).as("n_aligned"),
          count(lit(1)).as("n_pos"))
        .filter(col("n_aligned").cast("double") >=
          lit(minAlignedFrac) * col("n_pos"))
    } else {
      val offsets = (-maxShift to maxShift).toArray
      val fbs = fb.select(col("id_b").as("_idb"), col("rk").as("_rkb"),
        col("fp_b"))
      val best = sigPairs
        .withColumn("off", explode(lit(offsets)))
        .join(fa, Seq("id_a"))
        .join(fbs, col("id_b") === col("_idb") &&
          col("rk") + col("off") === col("_rkb"))
        .groupBy(col("id_a"), col("id_b"), col("hamming"), col("off"))
        .agg(sum(when(expr("bit_count(fp_a ^ fp_b)") <= frameRadius, 1L)
            .otherwise(0L)).as("n_aligned"),
          count(lit(1)).as("n_pos"))
        // best offset per pair: most ALIGNED frames first (an extreme
        // offset with a 1-frame overlap and frac 1.0 must not beat a
        // genuine 0.9-frac full-overlap alignment), then fraction, ties
        // to the smallest |offset| (then the positive one) — a
        // deterministic struct-max, no second window pass
        .groupBy(col("id_a"), col("id_b"), col("hamming"))
        .agg(max(struct(
          col("n_aligned").as("n_al"),
          (col("n_aligned").cast("double") / col("n_pos")).as("frac"),
          (-abs(col("off"))).as("negabs"),
          col("off").as("off"),
          col("n_aligned").as("n_aligned"),
          col("n_pos").as("n_pos"))).as("b"))
      best.select(col("id_a"), col("id_b"), col("hamming"),
          col("b.n_aligned").as("n_aligned"),
          col("b.n_pos").as("n_pos"),
          col("b.off").as("best_shift"))
        .filter(col("n_aligned").cast("double") >=
          lit(minAlignedFrac) * col("n_pos"))
    }
  }

  /** Corpus-scale video dedup over temporal SIGNATURES: exact-signature
    * collapse, blocked Hamming join over distinct signatures, connected
    * components — one (media_id, fp, canonical_id, kept) row per video,
    * never a pair list ([[Dedup.hammingDedupCorpus]] semantics). The
    * alignment verify is a pair-form refinement; at corpus scale the
    * majority signature alone is the standard first-pass collapse, and
    * survivors can run [[nearDuplicates]] within partitions of
    * plausible size.
    */
  def dedupCorpus(media: Dataset[MediaRow], maxHamming: Int,
                  everyN: Int = 1,
                  codec: ImageCodec = Codecs.AutoCodec,
                  hash: Image => Long = ImageHash.dHash64,
                  numBlocks: Int = -1): DataFrame =
    Dedup.hammingDedupCorpus(
      temporalSignature(frameFingerprints(media, everyN, codec, hash))
        .select(col("media_id"), col("fp")),
      "media_id", "fp", maxHamming, numBlocks)
}
