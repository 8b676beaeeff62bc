package graft.ops

import java.util.concurrent.ConcurrentHashMap

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the missing third leg of the ANN index family
  * (IVF cells partition the corpus, int8 shrinks vectors 4×, PQ shrinks
  * them ~32×: each 64-float vector becomes [[pqM]] 4-bit codes). At
  * 100 TB the ADC scan is the point: approximate distances come from a
  * per-query lookup table over the CODES table — the embeddings
  * themselves are never read after encoding, so the scan touches
  * m bytes per vector instead of 256, and composes with the IVF cells
  * (IVF-PQ: probe a cell, ADC-scan its codes, exact-rerank the head).
  *
  * Codebook training IS k-means — one seeded Lloyd round per subspace,
  * the same deterministic machinery as [[SimilarityOps.ivfCells]]
  * (micro-unit-quantized BIGINT centroid sums: exact in any engine and
  * any partition order; assignment via (rounded distance, code)
  * lexicographic min). Codebooks are k×subDim doubles — driver-collected
  * and re-broadcast as literals, so encoding is ONE codegen'd map over
  * the corpus with no shuffle, exactly the MLlib k-means shape.
  *
  * Distances are squared L2 composed from index-order dot-product folds
  * (d² = ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩) and rounded to 6 dp before any
  * comparison — bit-identical in the DuckDB mirror, which re-derives
  * the identical codebooks and codes in SQL.
  */
object PqOps extends OpGroup {

  val pqM = 4        // subspaces
  val pqSubDim = 16  // dims per subspace (4 × 16 = 64)
  val pqK = 16       // codes per subspace (4 bits)
  val pqQueryCount = 5
  val pqTopK = 10

  private def emb(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  private def subCol(j: Int): Column =
    slice(col("embedding"), j * pqSubDim + 1, pqSubDim)

  /** Index-order left fold — mirrors the oracle's `list_reduce` and the
    * codegen'd [[graft.expressions.DotProduct]] exactly.
    */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0d; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Nearest-code column for subspace `j`: 16 (rounded d², code) structs,
    * `least` takes the lexicographic min — distance first, then smallest
    * code, matching the oracle's ROW_NUMBER (d ASC, code ASC).
    */
  private def assignCol(j: Int, cb: Seq[(Int, Array[Double])]): Column = {
    val sv = subCol(j)
    val self = graft.functions.TextFns.dotProduct(sv, sv)
    val choices = cb.map { case (code, v) =>
      struct(
        round(self - lit(2d) * graft.functions.TextFns.dotProduct(
          sv, typedLit(v.toSeq)) + lit(dotD(v, v)), 6).as("d"),
        lit(code).as("code"))
    }
    least(choices: _*).getField("code")
  }

  /** Trained codebook per subspace: seeds = subvectors of vec_id 0..15,
    * one Lloyd round (assign all, recompute means). Every seed assigns
    * at least itself (d² = 0), so no cell is ever empty. Memoized per
    * (session, dir) alongside the codes frame.
    */
  private val cbStore =
    new ConcurrentHashMap[String, Seq[Seq[(Int, Array[Double])]]]()

  private def codebook(s: SparkSession,
      dir: String): Seq[Seq[(Int, Array[Double])]] = {
    val key = s"${System.identityHashCode(s)}|$dir"
    val hit = cbStore.get(key)
    if (hit != null) return hit
    val seedRows = emb(s, dir).filter(col("vec_id") < pqK)
      .select(col("vec_id"), col("embedding")).collect()
    val cb0: Seq[Seq[(Int, Array[Double])]] = (0 until pqM).map { j =>
      seedRows.map { r =>
        val e = r.getSeq[Float](1)
        r.getLong(0).toInt ->
          Array.tabulate(pqSubDim)(i => e(j * pqSubDim + i).toDouble)
      }.sortBy(_._1).toSeq
    }
    // one Lloyd round: assign with the seed codebook, then per-(j, code,
    // pos) means over micro-quantized BIGINTs (exact integer sums —
    // partition-order-free, engine-free)
    val assigned = (0 until pqM).foldLeft(emb(s, dir)) { (df, j) =>
      df.withColumn(s"c$j", assignCol(j, cb0(j)))
    }
    val meanRows = assigned
      .select(explode(array((0 until pqM).map(j =>
        struct(lit(j).as("j"), col(s"c$j").as("code"),
          subCol(j).as("sv"))): _*)).as("e"))
      .select(col("e.j").as("j"), col("e.code").as("code"),
        posexplode(col("e.sv")))
      .select(col("j"), col("code"), col("pos"),
        round(col("col").cast("double") * 1000000).cast("long").as("q"))
      .groupBy(col("j"), col("code"), col("pos"))
      .agg(round(sum(col("q")).cast("double") / (count(lit(1)) * 1000000.0),
        6).as("c"))
      .collect()
    val cb1: Seq[Seq[(Int, Array[Double])]] = (0 until pqM).map { j =>
      meanRows.filter(_.getInt(0) == j).groupBy(_.getInt(1)).map {
        case (code, rs) =>
          val arr = new Array[Double](pqSubDim)
          rs.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
          code -> arr
      }.toSeq.sortBy(_._1)
    }
    cbStore.putIfAbsent(key, cb1)
    cb1
  }

  /** Codes table: vec_id + one 4-bit code per subspace — the ~32×
    * compressed index the ADC scan reads instead of the embeddings.
    */
  def pqCodes(s: SparkSession, dir: String): DataFrame =
    Memo.of(s, dir, "pqCodes") {
      val cb = codebook(s, dir)
      emb(s, dir).select(
        col("vec_id") +:
          (0 until pqM).map(j => assignCol(j, cb(j)).as(s"c$j")): _*)
        .cache()
    }

  // ------------------------------ oracle SQL ---------------------------

  private def dotSqlN(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(range(1, ${n + 1}), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, v) -> acc + v)"

  private def d2Sql(a: String, b: String): String = {
    def d(x: String, y: String) = dotSqlN(x, y, pqSubDim)
    s"round(${d(a, a)} - 2 * ${d(a, b)} + ${d(b, b)}, 6)"
  }

  /** CTE chain deriving the identical codebook + codes in DuckDB:
    * subvectors → seed codebook → assign → quantized means → re-assign.
    */
  private lazy val pqCtes =
    s"""sv AS (
       |  SELECT vec_id, t.j,
       |         list_slice(embedding, t.j * $pqSubDim + 1,
       |                    t.j * $pqSubDim + $pqSubDim) AS sv
       |  FROM embeddings, range(0, $pqM) t(j)),
       |seed AS (SELECT j, CAST(vec_id AS INT) AS code, sv AS cv
       |         FROM sv WHERE vec_id < $pqK),
       |a1 AS (
       |  SELECT vec_id, j, code FROM (
       |    SELECT s.vec_id, s.j, d.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
       |        ${d2Sql("s.sv", "d.cv")} ASC, d.code ASC) AS rn
       |    FROM sv s JOIN seed d ON d.j = s.j) t
       |  WHERE rn = 1),
       |qv AS (
       |  SELECT a.j, a.code, t.i,
       |         CAST(round(CAST(s.sv[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS q
       |  FROM a1 a JOIN sv s ON s.vec_id = a.vec_id AND s.j = a.j,
       |       range(1, ${pqSubDim + 1}) t(i)),
       |cbm AS (
       |  SELECT j, code, i,
       |         round(CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS c
       |  FROM qv GROUP BY j, code, i),
       |cbl AS (SELECT j, code, list(c ORDER BY i) AS cv
       |        FROM cbm GROUP BY j, code),
       |a2 AS (
       |  SELECT vec_id, j, code FROM (
       |    SELECT s.vec_id, s.j, d.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
       |        ${d2Sql("s.sv", "d.cv")} ASC, d.code ASC) AS rn
       |    FROM sv s JOIN cbl d ON d.j = s.j) t
       |  WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id,
       |${(0 until pqM).map(j =>
        s"    CAST(MAX(CASE WHEN j = $j THEN code END) AS INT) AS c$j")
        .mkString(",\n")}
       |  FROM a2 GROUP BY vec_id)""".stripMargin

  private lazy val pqCodesSql =
    s"""WITH $pqCtes
       |SELECT vec_id, ${(0 until pqM).map(j => s"c$j").mkString(", ")}
       |FROM codes""".stripMargin

  // ---------------------------------------------------------------------
  // ADC top-k: per query, a 4×16 lookup table of rounded subspace d²
  // (query subvector vs codebook entry), computed ON THE DRIVER with the
  // same index-order folds; the scan is then one codegen'd map over the
  // CODES table — approx d² = sum of 4 table lookups — with a per-query
  // rank. No embedding column is read; no shuffle before the rank. The
  // production composition is IVF-PQ (restrict the scan to probed
  // cells) + exact rerank of the head, both demonstrated by the
  // neighbouring ivf/cosine ops.
  // ---------------------------------------------------------------------
  /** Un-truncated ADC scan: every (query, vector) approximate d² from
    * codebook lookups only. The deeper-head candidate generation for
    * exact rerank reads this (see the recall spec); [[pqTopk]] is its
    * top-k head.
    */
  def adcScores(s: SparkSession, dir: String): DataFrame = {
    val cb = codebook(s, dir)
    val codes = pqCodes(s, dir)
    val qRows = emb(s, dir).filter(col("vec_id") < pqQueryCount)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
    qRows.map { r =>
      val qid = r.getLong(0)
      val e = r.getSeq[Float](1)
      val approx = (0 until pqM).map { j =>
        val qs = Array.tabulate(pqSubDim)(i => e(j * pqSubDim + i).toDouble)
        val lut = cb(j).sortBy(_._1).map { case (_, v) =>
          BigDecimal(dotD(qs, qs) - 2 * dotD(qs, v) + dotD(v, v))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        element_at(typedLit(lut), col(s"c$j") + 1)
      }.reduce(_ + _)
      codes.filter(col("vec_id") =!= qid)
        .select(lit(qid).as("q_id"), col("vec_id"),
          round(approx, 6).as("approx_d2"))
    }.reduce(_ unionByName _)
  }

  def pqTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_d2").asc, col("vec_id").asc)
    adcScores(s, dir)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= pqTopK)
  }

  private lazy val pqTopkSql =
    s"""WITH $pqCtes,
       |lut AS (
       |  SELECT qs.vec_id AS q_id, qs.j, d.code,
       |         ${d2Sql("qs.sv", "d.cv")} AS ld
       |  FROM sv qs JOIN cbl d ON d.j = qs.j
       |  WHERE qs.vec_id < $pqQueryCount),
       |adc AS (
       |  SELECT l0.q_id, c.vec_id,
       |         round(l0.ld + l1.ld + l2.ld + l3.ld, 6) AS approx_d2
       |  FROM codes c
       |  JOIN lut l0 ON l0.j = 0 AND l0.code = c.c0
       |  JOIN lut l1 ON l1.j = 1 AND l1.code = c.c1 AND l1.q_id = l0.q_id
       |  JOIN lut l2 ON l2.j = 2 AND l2.code = c.c2 AND l2.q_id = l0.q_id
       |  JOIN lut l3 ON l3.j = 3 AND l3.code = c.c3 AND l3.q_id = l0.q_id
       |  WHERE c.vec_id <> l0.q_id)
       |SELECT q_id, vec_id, approx_d2, rank FROM (
       |  SELECT q_id, vec_id, approx_d2,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY approx_d2 ASC, vec_id ASC) AS INT) AS rank
       |  FROM adc) t
       |WHERE rank <= $pqTopK""".stripMargin

  // ---------------------------------------------------------------------
  // IVF-PQ: the production ANN composition — the IVF coarse quantizer
  // restricts WHICH vectors are scored (the query's probed cells), PQ's
  // ADC decides HOW cheaply (4 LUT lookups per candidate, embeddings
  // never read). Here the cell restriction is a semi-join of the ADC
  // scan against the (query, cell-mate) candidate table; a deployment
  // co-partitions the CODES table by cell so the probe prunes partitions
  // at the scan (the s_partitioned_layout lever) and per-query cost is
  // O(probed-cells · cell-size) lookups — independent of corpus size at
  // k ≈ √N cells. Rank ties break on vec_id; both index artifacts
  // (cells, codes) are the bench's one-time builds.
  // ---------------------------------------------------------------------
  def ivfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val cells = graft.ops.SimilarityOps.ivfCells(s, dir)
    val q = cells.filter(col("vec_id") < pqQueryCount)
      .select(col("vec_id").as("q_id"), col("cell"))
    val cand = cells.select(col("cell"), col("vec_id"))
      .join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_d2").asc, col("vec_id").asc)
    adcScores(s, dir).join(cand, Seq("q_id", "vec_id"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= pqTopK)
  }

  private lazy val ivfPqTopkSql =
    s"""WITH ${graft.ops.SimilarityOps.ivfCellsCtesForCompose},
       |$pqCtes,
       |lut AS (
       |  SELECT qs.vec_id AS q_id, qs.j, d.code,
       |         ${d2Sql("qs.sv", "d.cv")} AS ld
       |  FROM sv qs JOIN cbl d ON d.j = qs.j
       |  WHERE qs.vec_id < $pqQueryCount),
       |cand AS (
       |  SELECT DISTINCT qc.vec_id AS q_id, c.vec_id
       |  FROM cells qc JOIN cells c ON c.cell = qc.cell
       |  WHERE qc.vec_id < $pqQueryCount AND c.vec_id <> qc.vec_id),
       |adc AS (
       |  SELECT l0.q_id, c.vec_id,
       |         round(l0.ld + l1.ld + l2.ld + l3.ld, 6) AS approx_d2
       |  FROM codes c
       |  JOIN lut l0 ON l0.j = 0 AND l0.code = c.c0
       |  JOIN lut l1 ON l1.j = 1 AND l1.code = c.c1 AND l1.q_id = l0.q_id
       |  JOIN lut l2 ON l2.j = 2 AND l2.code = c.c2 AND l2.q_id = l0.q_id
       |  JOIN lut l3 ON l3.j = 3 AND l3.code = c.c3 AND l3.q_id = l0.q_id
       |  JOIN cand x ON x.q_id = l0.q_id AND x.vec_id = c.vec_id)
       |SELECT q_id, vec_id, approx_d2, rank FROM (
       |  SELECT q_id, vec_id, approx_d2,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY approx_d2 ASC, vec_id ASC) AS INT) AS rank
       |  FROM adc) t
       |WHERE rank <= $pqTopK""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("sim_pq_codes", pqCodes, Some(pqCodesSql),
      "product-quantization encoding: 4x16-code codebook (seeded Lloyd round), ~32x index compression"),
    Op("sim_pq_topk", pqTopk, Some(pqTopkSql),
      "PQ ADC top-k: per-query LUT over the codes table, embeddings never re-read"),
    Op("sim_ivfpq_topk", ivfPqTopk, Some(ivfPqTopkSql),
      "IVF-PQ retrieval: ADC scan restricted to the query's probed k-means cells"))
}
