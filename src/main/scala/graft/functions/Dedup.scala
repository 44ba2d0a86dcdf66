package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions._

/** Deduplication primitives for document corpora at 100 TB scale.
  *
  * Design notes (scale-first):
  *  - Exact dedup shuffles an 8-byte fingerprint, never the document body.
  *  - MinHash/LSH candidate generation is a self-join on *band buckets*
  *    (signature slices), so the shuffle key space is tiny and the
  *    quadratic blow-up is confined to per-bucket groups. Skewed buckets
  *    (boilerplate shingles) are handled upstream by AQE skew-join.
  *  - All hashing is Spark-native `xxhash64` (codegen'd, seed-stable), so
  *    signatures are reproducible across runs and cluster sizes.
  *
  * Reference capability: go-sif/sif has no dedup operators — users would
  * hand-roll them in `Map`/`Reduce` closures (reference
  * operations/transform/reduce.go:94-110). Here they are first-class.
  */
object Dedup {

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the document's shingle set. Approximates the Jaccard
    * permutation-min construction with xxhash64(shingle, seed_i).
    * Backed by the native [[graft.plans.MinHashSignature]] expression —
    * one pass over the shingles per row.
    */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column =
    graft.plans.HashExpressions.minhashSignature(
      wordShingles(text, shingleN), numHashes)

  /** LSH band keys from a minhash signature: hash of each `rowsPerBand`-wide
    * slice, tagged with the band index. Two documents share a band key ⇒
    * candidate pair. bands = numHashes / rowsPerBand.
    */
  def lshBandKeys(signature: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val bands = numHashes / rowsPerBand
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(concat_ws("_",
          (0 until rowsPerBand).map(r =>
            element_at(signature, b * rowsPerBand + r + 1)): _*)).as("bucket"))
    }: _*)
  }

  /** Estimated Jaccard similarity from two equal-length minhash signatures:
    * fraction of agreeing components.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / size(sigA).cast("double")

  /** SimHash (64-bit): per bit, sum +1/−1 votes of each token-hash's bit,
    * then take the sign. Near-duplicate docs land within small Hamming
    * distance. Backed by the native [[graft.plans.SimHash64]] expression.
    */
  def simhash(text: Column): Column =
    graft.plans.HashExpressions.simhash64(tokens(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDist64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard similarity pairs above `minJaccard`, via an
    * inverted-index self-join on shingles. Output: (id_a, id_b, jaccard)
    * with id_a < id_b.
    *
    * Scale path: the explode keeps only (id, shingle) — bytes proportional
    * to text — and the join groups by shingle, so common-shingle skew is
    * the only hazard (mitigate with stopword-shingle filtering / AQE).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, minJaccard: Double): DataFrame = {
    val grams = df.select(
      col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleN)).as("gram"))
    val sizes = grams.groupBy("id").agg(count("*").as("sz"))
    val inter = grams.as("a").join(grams.as("b"), "gram")
      .where(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count("*").as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard ≥
    * `minEstJaccard`. Output: (id_a, id_b, est_jaccard), id_a < id_b.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, numHashes: Int = 32,
                          rowsPerBand: Int = 4,
                          minEstJaccard: Double = 0.5): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleN, numHashes).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(lshBandKeys(col("sig"), numHashes, rowsPerBand)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        estJaccard(col("a.sig"), col("b.sig")).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= minEstJaccard)
  }
}
