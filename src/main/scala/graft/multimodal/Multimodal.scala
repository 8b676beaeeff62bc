package graft.multimodal

import graft.Tables
import graft.ops.{Op, OpGroup}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by per-partition JVM pipelines (the Scala analog of
  * arrow-batched pandas UDFs — an iterator of rows per partition, one
  * decoder instance per partition, no per-row setup cost).
  *
  * The image/audio codecs are NOT in this container, so the decode step is
  * a clearly-marked deterministic STUB ([[StubCodec]]); everything
  * Spark-side — binary schema, partitioning, the mapPartitions batch
  * shape, frame explosion — is real, and the stub's outputs (byte length,
  * md5, mean byte, frame hashes) are exactly reproducible by the DuckDB
  * oracle, so even the JVM mapPartitions path is hash-verified.
  *
  * Scale notes: decode is an embarrassingly parallel map; `repartition`
  * by media_id before decode balances skew from variable media sizes.
  * Frame sampling multiplies rows by a constant (4) — no shuffle.
  */
object Multimodal extends OpGroup {

  /** Opaque media row: binary payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      declared_len: Long)

  /** Stub "decoded" features; every field derivable from payload bytes. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      content_md5: String, mean_byte: Double)

  case class FrameRow(media_id: Long, frame_idx: Int, frame_md5: String)

  /** STUB codec: stands in for an image/audio decoder. Deterministic pure
    * functions of the payload so tests and oracles can verify the
    * pipeline; swap for a real codec (JavaCV/ImageIO) outside this
    * container.
    */
  object StubCodec {
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"${b & 0xff}%02x").mkString

    def decode(m: MediaRow): MediaFeatures = {
      // Integer byte-sum, then one double division and a half-up round —
      // the exact operation order the DuckDB oracle performs, so the
      // double results are bit-identical.
      val sum = m.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      val mean =
        if (m.payload.isEmpty) 0d else sum.toDouble / m.payload.length
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
        md5Hex(m.payload), math.floor(mean * 10000 + 0.5) / 10000)
    }

    /** Sample `n` fixed-size frames at even byte offsets. */
    def sampleFrames(m: MediaRow, n: Int, frameLen: Int): Seq[FrameRow] =
      (0 until n).map { i =>
        val off = (i * m.payload.length) / n
        val end = math.min(off + frameLen, m.payload.length)
        FrameRow(m.media_id, i, md5Hex(m.payload.slice(off, end)))
      }

    /** Nearest-neighbor byte resample to `target` bytes (the 1-D stand-in
      * for an image resize): out(i) = payload((i * len) / target).
      */
    def resize(m: MediaRow, target: Int): ResizedMedia = {
      val n = m.payload.length
      val out =
        if (n == 0) Array.empty[Byte]
        else Array.tabulate(target)(i => m.payload((i * n) / target))
      ResizedMedia(m.media_id, m.kind, n.toLong, out.length.toLong,
        md5Hex(out))
    }
  }

  case class ResizedMedia(media_id: Long, kind: String, orig_bytes: Long,
      resized_bytes: Long, resized_md5: String)

  /** Build a binary media table from `documents` (text bytes stand in for
    * an opaque payload; ASCII corpus ⇒ bytes == characters, which is what
    * lets the SQL oracle mirror byte-level operations).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        lit("image").as("kind"),
        col("text").cast("binary").as("payload"),
        col("n_chars").as("declared_len"))
      .as[MediaRow]
  }

  /** Decode pipeline: one codec pass per partition (mapPartitions batch
    * shape — iterator in, iterator out).
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions(rows => rows.map(StubCodec.decode))
      .toDF()
  }

  private val decodeFeaturesSql =
    """SELECT doc_id AS media_id, 'image' AS kind,
      |  CAST(len(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  round(CAST(list_reduce(list_transform(range(1, len(text) + 1),
      |          i -> ascii(substring(text, i, 1))), (a, c) -> a + c) AS DOUBLE)
      |        / len(text), 4) AS mean_byte
      |FROM documents""".stripMargin

  /** Frame sampling: 4 frames of 16 bytes at even offsets (flatMap —
    * constant fan-out, no shuffle).
    */
  val numFrames = 4
  val frameLen = 16

  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .flatMap(m => StubCodec.sampleFrames(m, numFrames, frameLen))
      .toDF()
  }

  private val frameSampleSql =
    s"""SELECT doc_id AS media_id, CAST(t.i AS INT) AS frame_idx,
       |  md5(substring(text, (t.i * len(text)) // $numFrames + 1,
       |      least($frameLen, len(text) - (t.i * len(text)) // $numFrames))) AS frame_md5
       |FROM documents, range(0, $numFrames) t(i)""".stripMargin

  /** Resize pipeline: constant-size nearest-neighbor resample per row
    * (embarrassingly parallel map, no shuffle).
    */
  val resizeTarget = 64

  def resizeMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions(rows => rows.map(StubCodec.resize(_, resizeTarget)))
      .toDF()
  }

  private val resizeMediaSql =
    s"""SELECT doc_id AS media_id, 'image' AS kind,
       |  CAST(len(text) AS BIGINT) AS orig_bytes,
       |  CAST(CASE WHEN len(text) = 0 THEN 0 ELSE $resizeTarget END AS BIGINT)
       |    AS resized_bytes,
       |  md5(CASE WHEN len(text) = 0 THEN ''
       |      ELSE array_to_string(list_transform(range(0, $resizeTarget),
       |        i -> substring(text, (i * len(text)) // $resizeTarget + 1, 1)), '')
       |      END) AS resized_md5
       |FROM documents""".stripMargin

  /** Windowed audio features: payload bytes as 8-bit PCM samples, framed
    * into fixed non-overlapping windows; per-window integer sum/energy/
    * peak (all-integer outputs — no float summation order to diverge).
    * flatMap with data-dependent fan-out ≈ len/window — the audio analog
    * of frame sampling; still no shuffle, the scale cost is output size.
    */
  val audioWindow = 64

  case class AudioWindowRow(media_id: Long, kind: String, window_idx: Int,
      n_samples: Int, sum_amp: Long, sum_sq: Long, peak_amp: Int)

  object StubAudioCodec {
    def windows(m: MediaRow, w: Int): Seq[AudioWindowRow] = {
      val n = m.payload.length
      (0 until (n + w - 1) / w).map { idx =>
        val s = m.payload.slice(idx * w, math.min((idx + 1) * w, n))
          .map(b => (b & 0xff).toLong)
        AudioWindowRow(m.media_id, "audio", idx, s.length,
          s.sum, s.map(x => x * x).sum,
          if (s.isEmpty) 0 else s.max.toInt)
      }
    }
  }

  def audioEnergy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .flatMap(m => StubAudioCodec.windows(m, audioWindow))
      .toDF()
  }

  private val audioEnergySql = {
    val w = audioWindow
    val rng = s"range(t.w * $w + 1, least((t.w + 1) * $w, len(text)) + 1)"
    s"""SELECT doc_id AS media_id, 'audio' AS kind, CAST(t.w AS INT) AS window_idx,
       |  CAST(least($w, len(text) - t.w * $w) AS INT) AS n_samples,
       |  CAST(list_reduce(list_transform($rng,
       |      i -> ascii(substring(text, i, 1))), (a, c) -> a + c) AS BIGINT) AS sum_amp,
       |  CAST(list_reduce(list_transform($rng,
       |      i -> ascii(substring(text, i, 1)) * ascii(substring(text, i, 1))),
       |      (a, c) -> a + c) AS BIGINT) AS sum_sq,
       |  CAST(list_reduce(list_transform($rng,
       |      i -> ascii(substring(text, i, 1))), (a, c) -> greatest(a, c)) AS INT) AS peak_amp
       |FROM (SELECT doc_id, text,
       |        unnest(range(0, (len(text) + $w - 1) // $w)) AS w
       |      FROM documents) t""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Perceptual-hash near-dup over binary media (image dedup): average
  // hash — resample the payload to 64 bytes (the existing resize stub),
  // threshold each byte against the sample mean (integer
  // cross-multiplied: b·64 ≥ Σ, no float compare), 64 bits stored as
  // four 16-bit bands. Candidate pairs come from MULTI-INDEX HAMMING
  // (Norouzi et al.) over TWO 32-BIT super-bands with a 1-bit-flip
  // neighborhood: by pigeonhole, a pair within hamming ≤ 3 has ≤ 1
  // error in one of the 2 bands, so enumerating each row's 33-key band
  // neighborhood (the value + its 32 single-bit flips) and equi-joining
  // against exact band values is lossless at the threshold. This is the
  // SymSpell deletion-neighborhood discipline transplanted to hamming
  // space, and it is what survives scale: exact-match banding on 16-bit
  // values saturates by the birthday effect once n approaches √(2¹⁶·4)
  // (measured r8: candidate pairs grew 39× on a 10× corpus), while the
  // 33×-row enumeration buys a 2³² key space — collision-driven
  // candidates stay negligible until n ~ 10⁸ per band value. Exact
  // hamming (bit_count of per-band XORs) verifies candidates only.
  // Output is IDENTICAL to the 4×16 exact-band scheme (both candidate
  // sets contain every pair ≤ the threshold; the verify filter is the
  // same), so the DuckDB oracle keeps the simpler 4×16 formulation.
  //
  // The raw corpus has no hash-near media (measured: zero pairs ≤ 3), so
  // the table is enriched with DETERMINISTIC twins — every 20th doc gets
  // a copy with its middle byte replaced, the length-preserving
  // perturbation a re-encode would cause (measured twin distance ≤ 1) —
  // constructed identically in the oracle, exactly as piiRedact plants
  // its spans. A real deployment swaps the resample stub for a DCT
  // (pHash) or per-cell mean (blockhash) over decoded pixels; the
  // banding, verification, and plan shape are codec-independent.
  // ---------------------------------------------------------------------
  val phashMaxHamming = 3
  val twinEvery = 20
  val twinIdOffset = 1000000L

  case class MediaHash(media_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  private[graft] def aHashBands(payload: Array[Byte]): (Int, Int, Int, Int) = {
    val n = payload.length
    val out =
      if (n == 0) Array.fill(64)(0)
      else Array.tabulate(64)(i => payload((i * n) / 64) & 0xff)
    val s = out.sum // ≤ 64·255, fits comfortably in Int
    val bits = out.map(b => if (b * 64 >= s) 1 else 0)
    def band(k: Int) = (0 until 16).foldLeft(0)((a, i) => (a << 1) | bits(k * 16 + i))
    (band(0), band(1), band(2), band(3))
  }

  /** The media table plus deterministic near-dup twins. */
  private def mediaWithTwins(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    val twinText = expr(
      "concat(substring(text, 1, CAST(floor(length(text)/2) AS INT)), 'z', " +
        "substring(text, CAST(floor(length(text)/2) AS INT) + 2))")
    val twins = Tables.load(s, dir, "documents")
      .filter(col("doc_id") % twinEvery === 0)
      .select((col("doc_id") + twinIdOffset).as("media_id"),
        lit("image").as("kind"),
        twinText.cast("binary").as("payload"),
        length(twinText).cast("long").as("declared_len"))
    mediaTable(s, dir).toDF().unionByName(twins).as[MediaRow]
  }

  /** Per-media band hashes — Memo-routed (not a bare cache call) so the
    * shared artifact (the pair scan below probes it three times, and
    * mm_dedup_survivors' closure re-enters through phashNearDup) falls
    * under Memo's bounded retention instead of living until clearCache.
    */
  private def mediaHashBands(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.of(s, dir, "mediaHashBands") {
      import s.implicits._
      mediaWithTwins(s, dir).map { m =>
        val (b0, b1, b2, b3) = aHashBands(m.payload)
        MediaHash(m.media_id, b0, b1, b2, b3)
      }.toDF().cache()
    }

  def phashNearDup(s: SparkSession, dir: String): DataFrame = {
    val h = mediaHashBands(s, dir)
    val bandCols = Seq("b0", "b1", "b2", "b3")
    // two 32-bit super-bands (b0‖b1, b2‖b3) as Longs
    val wide = h.select(col("media_id"), explode(array(
      struct(lit(0).as("k"),
        (col("b0").cast("long") * 65536L + col("b1")).as("v")),
      struct(lit(1).as("k"),
        (col("b2").cast("long") * 65536L + col("b3")).as("v")))).as("band"))
      .select(col("media_id"), col("band.k").as("k"), col("band.v").as("v"))
    // probe side: the 33-key 1-bit-flip neighborhood (j = -1 keeps the
    // exact value) — explode(sequence) + shiftleft/xor stay in codegen,
    // per the no-interpreted-HOF-on-the-hot-path rule
    val probes = wide
      .select(col("media_id").as("media_a"), col("k"),
        explode(expr("sequence(-1, 31)")).as("j"), col("v"))
      .select(col("media_a"), col("k"),
        when(col("j") < 0, col("v"))
          .otherwise(expr("v ^ shiftleft(1L, j)")).as("v"))
    val cand = probes
      .join(wide.select(col("k"), col("v"), col("media_id").as("media_b")),
        Seq("k", "v"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b").distinct()
    val ham = bandCols.map(b =>
      bit_count(col(s"a.$b").bitwiseXOR(col(s"b.$b")))).reduce(_ + _)
    cand
      .join(h.as("a"), col("media_a") === col("a.media_id"))
      .join(h.as("b"), col("media_b") === col("b.media_id"))
      .select(col("media_a"), col("media_b"), ham.cast("int").as("hamming"))
      .filter(col("hamming") <= phashMaxHamming)
  }

  /** The phash pair chain up to a `pairs` CTE — shared by the pair
    * report and the survivor selection's transitive closure.
    */
  private val phashCtes = {
    val mid = "CAST(FLOOR(len(text)/2) AS INT)"
    def bandSql(k: Int) =
      s"""CAST(list_reduce(list_transform(range(${k * 16 + 1}, ${k * 16 + 17}),
         |  i -> CASE WHEN o[i] * 64 >= s THEN 1 ELSE 0 END),
         |  (a, x) -> a * 2 + x) AS INT)""".stripMargin
    s"""media AS (
       |  SELECT doc_id AS media_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $twinIdOffset,
       |         substring(text, 1, $mid) || 'z' || substring(text, $mid + 2)
       |  FROM documents WHERE doc_id % $twinEvery = 0),
       |sampled AS (
       |  SELECT media_id,
       |    list_transform(range(0, 64),
       |      i -> ascii(substring(text, CAST((i * len(text)) // 64 AS INT) + 1, 1))) AS o
       |  FROM media),
       |summed AS (
       |  SELECT media_id, o, list_reduce(o, (a, x) -> a + x) AS s FROM sampled),
       |bands AS (
       |  SELECT media_id, ${(0 until 4).map(k => s"${bandSql(k)} AS b$k").mkString(",\n    ")}
       |  FROM summed),
       |bexp AS (
       |  SELECT media_id, t.k,
       |    CASE t.k WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS v
       |  FROM bands, range(0, 4) t(k)),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
       |  FROM bexp a JOIN bexp b ON a.k = b.k AND a.v = b.v
       |    AND a.media_id < b.media_id),
       |pairs AS (
       |  SELECT media_a, media_b, hamming FROM (
       |    SELECT c.media_a, c.media_b,
       |      CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
       |         + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS INT)
       |        AS hamming
       |    FROM cand c
       |    JOIN bands x ON x.media_id = c.media_a
       |    JOIN bands y ON y.media_id = c.media_b) t
       |  WHERE hamming <= $phashMaxHamming)""".stripMargin
  }

  private val phashNearDupSql =
    s"""WITH $phashCtes
       |SELECT media_a, media_b, hamming FROM pairs""".stripMargin

  // ---------------------------------------------------------------------
  // Media near-dup survivor selection: the actionable keep set off the
  // phash pair table — transitive clustering (the same large-star/
  // small-star contraction the text dedup family uses: hash collisions
  // chain originals through shared twins, so a one-pass pair-drop rule
  // under-deletes), each cluster keeping its minimum media_id. One CC
  // fixpoint over the (tiny relative to the corpus) verified-pair
  // table plus one left join back to the media universe — the corpus
  // itself is never re-shuffled; the contraction's scale behavior is
  // the measured fixpoint ladder in ARCHITECTURE.md.
  // ---------------------------------------------------------------------
  def phashSurvivors(s: SparkSession, dir: String): DataFrame = {
    val edges = phashNearDup(s, dir)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val labels = graft.ops.DedupOps.connectedComponents(edges)
      .withColumnRenamed("doc_id", "media_id")
    mediaWithTwins(s, dir).toDF().select(col("media_id"))
      .join(labels, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster_id"), col("media_id")).as("cluster_id"))
      .withColumn("keep", col("media_id") === col("cluster_id"))
  }

  private val phashSurvivorsSql =
    s"""WITH RECURSIVE $phashCtes,
       |sym AS (SELECT media_a AS a, media_b AS b FROM pairs
       |        UNION ALL SELECT media_b AS a, media_a AS b FROM pairs),
       |reach(d, r) AS (
       |  SELECT media_id, media_id FROM media
       |  UNION
       |  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.d = s.b),
       |clusters AS (SELECT d AS media_id, MIN(r) AS cluster_id
       |             FROM reach GROUP BY d)
       |SELECT media_id, cluster_id, media_id = cluster_id AS keep
       |FROM clusters""".stripMargin

  // ---------------------------------------------------------------------
  // Scene-cut detection (video shot segmentation): per media, sample
  // [[sceneFrames]] frames, compute each frame's integer byte-energy,
  // and flag a cut wherever the inter-frame energy delta exceeds the
  // threshold — the classic histogram/energy-difference shot detector,
  // with the stub codec standing in for a real frame decoder. The
  // sequential frame-to-frame diff runs INSIDE the flatMap (all frames
  // of one media are in hand in the codec pass), so the operator is a
  // pure fan-out map: zero shuffles at any scale, unlike a per-media lag
  // window which would shuffle every frame row. Threshold 120 ≈ the top
  // ~12% of transitions on this corpus (p90 measured 127), so both
  // branches fire non-vacuously.
  // ---------------------------------------------------------------------
  case class SceneFrame(media_id: Long, frame_idx: Int, energy: Long,
      delta: Long, is_cut: Boolean)

  val sceneFrames = 8
  val sceneCutThreshold = 120L

  def sceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).flatMap { m =>
      val energies = (0 until sceneFrames).map { i =>
        val off = (i * m.payload.length) / sceneFrames
        val end = math.min(off + frameLen, m.payload.length)
        m.payload.slice(off, end).foldLeft(0L)((a, b) => a + (b & 0xff))
      }
      energies.zipWithIndex.map { case (e, i) =>
        val d = if (i == 0) 0L else e - energies(i - 1)
        SceneFrame(m.media_id, i, e, d,
          i > 0 && math.abs(d) > sceneCutThreshold)
      }
    }.toDF()
  }

  private val sceneCutsSql =
    s"""WITH fr AS (
       |  SELECT doc_id AS media_id, CAST(t.i AS INT) AS frame_idx,
       |    CAST(list_reduce(list_transform(
       |      range((t.i*len(text))//$sceneFrames + 1,
       |            (t.i*len(text))//$sceneFrames + 1
       |              + least($frameLen, len(text) - (t.i*len(text))//$sceneFrames)),
       |      j -> ascii(substring(text, j, 1))), (a, c) -> a + c) AS BIGINT)
       |      AS energy
       |  FROM documents, range(0, $sceneFrames) t(i))
       |SELECT media_id, frame_idx, energy,
       |  CAST(COALESCE(energy - lag(energy) OVER w, 0) AS BIGINT) AS delta,
       |  frame_idx > 0 AND
       |    abs(COALESCE(energy - lag(energy) OVER w, 0)) > $sceneCutThreshold
       |    AS is_cut
       |FROM fr
       |WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)""".stripMargin

  // ---------------------------------------------------------------------
  // Keyframe selection: one representative frame per SCENE — the frame a
  // vision-training sampler or thumbnail pipeline actually keeps (frames
  // within a shot are near-duplicates; sampling per scene instead of per
  // frame is the dedup-aware way to subsample video). Scenes are the
  // cut-segmentation above (scene_id = running cut count); the
  // representative is the max-energy frame, earliest index on ties.
  //
  // Scale shape: like sceneCuts, the WHOLE computation — segmentation
  // AND per-scene argmax — runs inside the codec flatMap where every
  // frame of one media is already in hand, so the operator emits one row
  // per scene with ZERO shuffles at any corpus size (a window/groupBy
  // formulation would shuffle every frame row; scenes-per-media is
  // bounded by sceneFrames, so nothing needs the cluster).
  // ---------------------------------------------------------------------
  case class KeyFrame(media_id: Long, scene_id: Int, start_idx: Int,
      end_idx: Int, n_frames: Long, rep_frame_idx: Int, rep_energy: Long)

  def keyframes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).flatMap { m =>
      val energies = (0 until sceneFrames).map { i =>
        val off = (i * m.payload.length) / sceneFrames
        val end = math.min(off + frameLen, m.payload.length)
        m.payload.slice(off, end).foldLeft(0L)((a, b) => a + (b & 0xff))
      }
      val sceneIds = energies.indices.map { i =>
        energies.indices.take(i + 1).count(j =>
          j > 0 && math.abs(energies(j) - energies(j - 1)) > sceneCutThreshold)
      }
      sceneIds.distinct.map { sc =>
        val idxs = energies.indices.filter(sceneIds(_) == sc)
        val rep = idxs.minBy(i => (-energies(i), i))
        KeyFrame(m.media_id, sc, idxs.min, idxs.max, idxs.size.toLong,
          rep, energies(rep))
      }
    }.toDF()
  }

  private val keyframesSql =
    s"""WITH fr AS (
       |  SELECT doc_id AS media_id, CAST(t.i AS INT) AS frame_idx,
       |    CAST(list_reduce(list_transform(
       |      range((t.i*len(text))//$sceneFrames + 1,
       |            (t.i*len(text))//$sceneFrames + 1
       |              + least($frameLen, len(text) - (t.i*len(text))//$sceneFrames)),
       |      j -> ascii(substring(text, j, 1))), (a, c) -> a + c) AS BIGINT)
       |      AS energy
       |  FROM documents, range(0, $sceneFrames) t(i)),
       |cutf AS (
       |  SELECT media_id, frame_idx, energy,
       |    CASE WHEN frame_idx > 0 AND
       |        abs(energy - lag(energy) OVER w) > $sceneCutThreshold
       |      THEN 1 ELSE 0 END AS cut
       |  FROM fr
       |  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
       |sc AS (
       |  SELECT media_id, frame_idx, energy,
       |    CAST(SUM(cut) OVER (PARTITION BY media_id
       |        ORDER BY frame_idx ROWS UNBOUNDED PRECEDING) AS INT)
       |      AS scene_id
       |  FROM cutf)
       |SELECT media_id, scene_id,
       |  CAST(MIN(frame_idx) AS INT) AS start_idx,
       |  CAST(MAX(frame_idx) AS INT) AS end_idx,
       |  COUNT(*) AS n_frames,
       |  CAST(MIN(CASE WHEN rn = 1 THEN frame_idx END) AS INT)
       |    AS rep_frame_idx,
       |  CAST(MIN(CASE WHEN rn = 1 THEN energy END) AS BIGINT) AS rep_energy
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY media_id, scene_id
       |    ORDER BY energy DESC, frame_idx ASC) AS rn
       |  FROM sc) r
       |GROUP BY media_id, scene_id""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("mm_keyframes", keyframes, Some(keyframesSql),
      "per-scene representative keyframe: segmentation + argmax inside the codec flatMap, zero shuffle"),
    Op("mm_scene_cuts", sceneCuts, Some(sceneCutsSql),
      "scene-cut detection: inter-frame energy deltas inside the codec flatMap, zero shuffle"),
    Op("mm_phash_neardup", phashNearDup, Some(phashNearDupSql),
      "perceptual-hash media near-dup: aHash bands + multi-index hamming self-join"),
    Op("mm_dedup_survivors", phashSurvivors, Some(phashSurvivorsSql),
      "media keep set: transitive clustering over phash pairs, min media_id survives per cluster"),
    Op("mm_decode_features", decodeFeatures, Some(decodeFeaturesSql),
      "binary media decode stub via mapPartitions, oracle-verified"),
    Op("mm_audio_energy", audioEnergy, Some(audioEnergySql),
      "windowed 8-bit PCM energy/peak features (audio stub), all-integer outputs"),
    Op("mm_frame_sample", frameSample, Some(frameSampleSql),
      "fixed-offset frame sampling over binary payloads"),
    Op("mm_resize", resizeMedia, Some(resizeMediaSql),
      "nearest-neighbor byte resample (resize stub), oracle-verified"))
}
