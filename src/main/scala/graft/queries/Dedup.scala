package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deduplication operators over `documents` — the core of any
  * training-data pipeline at 100 TB. Four methods, one shared shingle
  * definition, all pure Catalyst expressions (no UDFs → whole-stage
  * codegen end-to-end):
  *
  *   - exact (content-hash groupBy)                      → d01
  *   - n-gram Jaccard, all-pairs via shingle equi-join   → d02
  *   - MinHash + LSH banding (the scale path for d02)    → d03
  *   - SimHash bit-vote signatures                       → d04
  *
  * The reference could express only d01's shape (group by a key the
  * mapper computes, `/root/reference/docs.rst:141-159`); the rest are
  * new capability built on the same partition/shuffle primitives the
  * MapReduce layer uses (SURVEY §2.3, BASELINE.json north star).
  */
object Dedup {

  /** Word 3-gram shingle set per document, as an in-row array — no
    * shuffle to build; 1-based element_at per Spark array semantics.
    */
  private def shingles(text: Column): Column = {
    val t = filter(split(lower(text), "\\s+"), x => x =!= "")
    array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
      concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
  }

  /** Exact dedup: md5 content hash → canonical (minimum) doc_id + copy
    * count. One partial-aggable shuffle on the hash; at 100 TB this is
    * the always-first, always-cheap pass.
    */
  def d01ExactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** All-pairs n-gram Jaccard ≥ 0.5 via shingle equi-join.
    *
    * Scale analysis: the join fans out per repeated shingle (~1.3 M
    * rows at sf0.1 — fine), but at 100 TB frequent shingles explode
    * quadratically; d03 (MinHash+LSH) is the production path and this
    * operator is its exactness oracle. Jaccard stays a raw long/long
    * division — bit-exact across engines.
    */
  def d02JaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Shared MinHash machinery: 32 permutations h_i(x) = (x*(2i+3) +
    * (7919*i^2+13)) mod p over a polynomial base hash of the shingle
    * string. Everything is a fold over in-row arrays — the signature
    * costs zero shuffles.
    */
  private val P = 1000000007L
  private def polyHash(sc: Column): Column =
    aggregate(split(sc, ""), lit(7L), (acc, ch) => (acc * 31 + ascii(ch)) % P)

  private def minhashSig(sh: Column): Column = {
    // base-hash each shingle once, then all 32 perms over the longs
    val hs = transform(sh, s => polyHash(s))
    transform(sequence(lit(0), lit(31)), i =>
      array_min(transform(hs, h =>
        (h * (i * 2 + 3) + (i * i * 7919L + 13L)) % P)))
  }

  /** MinHash + LSH near-dup detection — d02's answer at 100 TB cost:
    * 16 bands × 2 rows from a 32-perm signature; docs sharing any band
    * bucket become candidates (shuffle is |docs|×16 tiny band keys, not
    * |shingle| fan-out); candidates are then verified with EXACT
    * Jaccard via array_intersect on the two shingle sets. Output — and
    * oracle — identical to d02: with the planted dup separation
    * (nothing between j=0.2 and 0.8 in this corpus) the banding's miss
    * probability at j≥0.8 is (1-j²)¹⁶ ≤ 1e-7.
    */
  def d03MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSig(col("sh")))
    val bands = docs.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(15)), b =>
        struct(b.as("band"),
          element_at(col("sig"), b * 2 + 1).as("v0"),
          element_at(col("sig"), b * 2 + 2).as("v1")))).as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band"), col("bk.v0"), col("bk.v1"))
    val a = bands.as("a"); val b = bands.as("b")
    val cands = a.join(b,
      col("a.band") === col("b.band") && col("a.v0") === col("b.v0") &&
        col("a.v1") === col("b.v1") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard", col("common") /
        (size(col("sha")) + size(col("shb")) - col("common")).cast("long"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash: 32-bit signature by per-bit voting over token hashes
    * (every occurrence votes, weight 1). Two small shuffles: (doc, bit)
    * vote sums, then per-doc bit assembly. Near-dup = small Hamming
    * distance; the signature itself is the oracle-checked output.
    */
  def d04Simhash(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"), x => x =!= "")).as("tok"))
      .withColumn("h", polyHash(col("tok")))
    val votes = toks
      .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("bit"), col("h"))
      .selectExpr("doc_id", "bit",
        "CASE WHEN shiftright(h, bit) & 1 = 1 THEN 1 ELSE -1 END AS vote")
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("v"))
    votes
      .selectExpr("doc_id",
        "CASE WHEN v > 0 THEN CAST(shiftleft(1L, bit) AS BIGINT) ELSE 0L END AS contrib")
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("simhash"))
  }

  /** Embedding near-dup pairs: exact double-precision cosine over all
    * pairs ≥ 0.5. Brute force is the verification tier; the LSH-bucketed
    * scale path is graft.queries.Similarity.s02. (This corpus plants no
    * >0.6-cosine pairs — threshold 0.5 keeps the result non-trivial.)
    */
  def d05EmbeddingPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val dot = (x: Column, y: Column) =>
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, z) => acc + z)
    val norm = (x: Column) => sqrt(aggregate(transform(x, p => p * p), lit(0.0), (acc, z) => acc + z))
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", dot(col("a.v"), col("b.v")) / (norm(col("a.v")) * norm(col("b.v"))))
      .filter(col("cosine") >= 0.5)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_exact_dedup" -> d01ExactDedup,
    "d02_jaccard_pairs" -> d02JaccardPairs,
    "d03_minhash_lsh" -> d03MinhashLsh,
    "d04_simhash" -> d04Simhash,
    "d05_embedding_pairs" -> d05EmbeddingPairs)

  private val shingleSql =
    """SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
       FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
             FROM documents)"""

  private val jaccardSql =
    s"""WITH sh AS ($shingleSql),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, common / (sa.n + sb.n - common) AS jaccard
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE common / (sa.n + sb.n - common) >= 0.5"""

  val oracles: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id,
         count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "d02_jaccard_pairs" -> jaccardSql,
    // d03 is the LSH path to the same answer — same oracle by design.
    "d03_minhash_lsh" -> jaccardSql,
    "d04_simhash" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS tok
           FROM documents),
         th AS (
           SELECT doc_id, list_reduce(list_prepend(7::BIGINT,
             list_transform(regexp_split_to_array(tok, ''), ch -> ascii(ch)::BIGINT)),
             (acc, ch) -> (acc * 31 + ch) % 1000000007) AS h
           FROM tok),
         votes AS (
           SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM th, unnest(range(0, 32)) AS u(bit)
           GROUP BY 1, 2)
         SELECT doc_id,
           sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
         FROM votes GROUP BY 1""",
    "d05_embedding_pairs" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         SELECT vec_a, vec_b, cosine FROM (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
             / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.v, x -> x * x)), (acc, x) -> acc + x))
              * sqrt(list_reduce(list_prepend(0.0, list_transform(b.v, x -> x * x)), (acc, x) -> acc + x))) AS cosine
           FROM e a JOIN e b ON a.vec_id < b.vec_id) t
         WHERE cosine >= 0.5""")
}
