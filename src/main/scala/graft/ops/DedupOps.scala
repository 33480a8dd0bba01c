package graft.ops

import graft.functions.CrossHash._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Scale design: every variant is candidate-generation-by-blocking — the
  * only joins are equi-joins on a small blocking key (content hash, LSH
  * band bucket, SimHash band), so the shuffle is keyed and bounded and no
  * O(n²) comparison ever materializes. The pairwise verification step runs
  * only within candidate buckets.
  */
object DedupOps {

  /** Exact dedup by full content: keep the lowest-id doc per distinct text.
    * At 100 TB, group on a content digest rather than the raw text so the
    * shuffle carries ~16 bytes per row instead of the document body.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Per-document word-`n`-gram shingle set + MinHash signature + LSH band
    * buckets: the shared prefix of the near-dup variants.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rowsPerBand = k / bands
    val sig = docs
      .withColumn("_shingles", array_distinct(shingles(tokens(col(textCol)), n)))
      .withColumn("minhash", minHash(col("_shingles"), k))
    // Band key: fold the band's rows into one bucket id (exact arithmetic).
    val withBands = sig.withColumn("bands",
      transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(
          slice(col("minhash"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          b.cast("long"),
          (acc, v) => (acc * lit(31L) + v) % lit(P))))
    withBands.select(col(idCol), col("_shingles").as("shingles"),
      col("minhash"), col("bands"))
  }

  /** MinHash-LSH near-duplicate pairs: candidates share ≥1 band bucket;
    * verified with exact Jaccard over shingle sets ≥ `threshold`.
    */
  def minhashLsh(docs: DataFrame, threshold: Double, n: Int = 3, k: Int = 8,
                 bands: Int = 4, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val sig = minhashSignatures(docs, n, k, bands, idCol, textCol)
    val exploded = sig
      .select(col(idCol), col("shingles"),
        posexplode(col("bands")).as(Seq("band_idx", "bucket")))
    val cands = exploded.as("a").join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        col("a.shingles").as("s1"), col("b.shingles").as("s2"))
      .dropDuplicates("id1", "id2")
    cands
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("uni", size(array_union(col("s1"), col("s2"))))
      .filter(col("uni") > 0)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter"), col("uni"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram Jaccard over candidate pairs that share at least
    * `minShared` shingles (inverted-index blocking — no cross join).
    */
  def ngramJaccard(docs: DataFrame, threshold: Double, n: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(shingles(tokens(col(textCol)), n)).as("sh"))
    val inv = sh.select(col(idCol), col("sh"), explode(col("sh")).as("g"))
    val pairCounts = inv.as("a").join(inv.as("b"),
        col("a.g") === col("b.g") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .agg(count(lit(1)).as("inter"),
        first(col("a.sh")).as("s1"), first(col("b.sh")).as("s2"))
    pairCounts
      .withColumn("uni", size(col("s1")) + size(col("s2")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter").cast("int").as("inter"),
        col("uni").cast("int").as("uni"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-document 32-bit SimHash fingerprints. */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    docs.select(col(idCol), simHash(tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using
    * band blocking: the 32-bit fingerprint is cut into `bands` slices;
    * by pigeonhole any pair within maxHamming (< bands) shares ≥1 exact
    * slice, so candidate generation is an equi-join on (band, slice).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 7, bands: Int = 8,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(bands > maxHamming, "bands must exceed maxHamming for exact recall")
    val bits = 32 / bands
    val sig = simhashSignatures(docs, idCol, textCol)
    val sliced = sig.select(col(idCol), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        pmod(shiftrighthelper(col("simhash"), b, bits), lit(1L << bits))))
        .as(Seq("band_idx", "slice")))
    val cands = sliced.as("a").join(sliced.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.slice") === col("b.slice") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .dropDuplicates("id1", "id2")
    cands
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming").cast("int").as("hamming"))
  }

  // simhash is non-negative (32-bit in a long), so plain division is an
  // arithmetic right shift — portable to the oracle as h // 2^s.
  private def shiftrighthelper(h: org.apache.spark.sql.Column, band: org.apache.spark.sql.Column,
                               bits: Int) = {
    val p = element_at(lit(POW2), (band * bits).cast("int") + lit(1))
    ((h - pmod(h, p)) / p).cast("long")
  }

  /** Embedding near-duplicates: cosine ≥ threshold within blocking key
    * `blockCol` (e.g. a coarse cluster/label or LSH bucket) — the blocked
    * form of brute-force pair generation.
    */
  def embeddingNearDup(embs: DataFrame, threshold: Double,
                       blockCol: String = "label", idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val e = embs.select(col(idCol), col(blockCol), col(vecCol))
    e.as("a").join(e.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        round(col("cos"), 6).as("cos"))
  }
}
