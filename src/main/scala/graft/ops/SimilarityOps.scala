package graft.ops

import graft.Tables
import graft.functions.TextFns.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * Scale design (100 TB): brute-force top-k broadcasts the query vector
  * and computes one codegen'd map stage + a k-row reduction (TakeOrdered)
  * — no shuffle of the corpus. The IVF variant restricts candidate pairs
  * to a coarse partition (here the `label` column as the posting list);
  * the LSH variant (random-hyperplane signatures, see
  * [[lshSignatures]]) buckets vectors so only bucket-mates are compared.
  * Cosines are computed in double with a deterministic fold and rounded
  * to 6 decimals before any ranking so Spark/DuckDB ties agree.
  */
object SimilarityOps extends OpGroup {

  private def emb(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  // ---------------------------------------------------------------------
  // Brute-force cosine top-k for one query vector (vec_id = 0).
  // ---------------------------------------------------------------------
  val topK = 10

  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val sim = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 6).as("sim"))
    val w = Window.orderBy(col("sim").desc, col("vec_id").asc)
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("vec_id"), col("sim"), col("rank"))
  }

  private val dotSql =
    "list_reduce(list_transform(range(1, 65), i -> " +
      "CAST(%A%[i] AS DOUBLE) * CAST(%B%[i] AS DOUBLE)), (acc, v) -> acc + v)"

  private def cosSql(a: String, b: String): String = {
    def d(x: String, y: String) = dotSql.replace("%A%", x).replace("%B%", y)
    s"(${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)})))"
  }

  private val cosineTopKSql =
    s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |sims AS (
       |  SELECT e.vec_id, round(${cosSql("e.embedding", "q.q_emb")}, 6) AS sim
       |  FROM embeddings e, q WHERE e.vec_id <> 0)
       |SELECT vec_id, sim,
       |  CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
       |FROM sims ORDER BY sim DESC, vec_id ASC LIMIT $topK""".stripMargin

  // ---------------------------------------------------------------------
  // IVF-style near-duplicate scan: compare only within the coarse
  // partition (label = posting list), emit pairs above threshold.
  // ---------------------------------------------------------------------
  val nearDupThreshold = 0.35

  def ivfNearDup(s: SparkSession, dir: String): DataFrame = {
    // Norms precomputed per vector (N of them), not per pair (N²/2k).
    val e = emb(s, dir).select(col("label"), col("vec_id"), col("embedding"),
      graft.functions.TextFns.l2norm(col("embedding")).as("nrm"))
    val a = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(graft.functions.TextFns.dotProduct(col("emb_a"), col("emb_b"))
          / (col("nrm_a") * col("nrm_b")), 6).as("sim"))
      .filter(col("sim") >= nearDupThreshold)
  }

  private val ivfNearDupSql =
    s"""SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= $nearDupThreshold""".stripMargin

  // ---------------------------------------------------------------------
  // LSH bucketing: random-hyperplane signatures. Hyperplane j's
  // component i is ±1 by an md5-derived coin so both engines could
  // reproduce it; bucket = bit string of sign(h_j · v).
  // ---------------------------------------------------------------------
  val lshBits = 8

  def lshSignatures(s: SparkSession, dir: String): DataFrame = {
    // hyperplane sign for (bit j, dim i): md5("j|i") first hex >= '8'
    val bits = (0 until lshBits).map { j =>
      val proj = graft.functions.TextFns.dotProduct(col("embedding"),
        typedLit((0 until 64).map(i => hyperplane(j, i))))
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }
    emb(s, dir).select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  private[ops] def hyperplane(j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j|$i".getBytes("UTF-8"))
    if ((hex(0) & 0x80) != 0) 1.0 else -1.0
  }

  private val lshSignaturesSql = {
    val bits = (0 until lshBits).map { j =>
      val terms = (0 until 64).map { i =>
        val sign = if (hyperplane(j, i) > 0) "+" else "-"
        s"$sign CAST(embedding[${i + 1}] AS DOUBLE)"
      }.mkString(" ")
      s"CASE WHEN ($terms) > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
    s"SELECT vec_id, $bits AS bucket FROM embeddings"
  }

  override val ops: Seq[Op] = Seq(
    Op("sim_cosine_topk", cosineTopK, Some(cosineTopKSql),
      "brute-force cosine top-k vs query vector (baseline)"),
    Op("sim_ivf_neardup", ivfNearDup, Some(ivfNearDupSql),
      "IVF-partitioned (label posting list) near-dup pair scan"),
    Op("sim_lsh_buckets", lshSignatures, Some(lshSignaturesSql),
      "random-hyperplane LSH signatures for ANN bucketing"))
}
