package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis.tokens

/** Deduplication operators for web-scale corpus cleaning (builder-spec
  * north star): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design:
  *  - Exact dedup = hash-groupBy on the content key — one shuffle keyed by
  *    md5(text) (shuffle the 16-byte digest, never the document body, when
  *    only the keeper id is needed).
  *  - Pairwise-similarity ops NEVER compare all pairs: candidate pairs come
  *    from an inverted index (explode → self-join on shingle/band/bucket),
  *    so cost is Σ bucket² not N². At 100 TB the band/bucket join is the
  *    classic MinHash-LSH plan: shuffle is bounded by signature size
  *    (k×8 bytes/doc), not document size, and hot buckets are handled by
  *    AQE skew-join splitting.
  *  - All hashing uses xxhash64 (codegen'd Catalyst expression); no UDFs.
  */
object Dedup {

  /** Word n-gram shingles (default 3-grams) as a distinct array. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  // NOTE (measured): hashing the token triple per shingle via element_at
  // inside the transform lambda is ~2× SLOWER than building the n-gram
  // string with slice+concat_ws and hashing once after the explode — ANSI
  // element_at bounds checks + per-argument hash dispatch dominate. The
  // string form below is the fast path; hash AFTER explode.

  /** Exact dedup: group identical texts, keep the smallest doc_id
    * (deterministic keeper), count members. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("text"))
      .agg(
        min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  /** Exact dedup at scale: shuffle md5 digests (not bodies) and keep the
    * min doc_id per digest — the form used when documents are large. */
  def exactDedupByDigest(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  /** n-gram Jaccard near-dup pairs via an inverted shingle index built in
    * ONE pass: shingles are hashed to 64-bit keys (8-byte shuffle instead
    * of strings), grouped into per-shingle posting lists, and candidate
    * pairs are emitted by exploding i<j combinations within each list —
    * |A∩B| per pair, Jaccard with |A∪B| = |A|+|B|−|A∩B|. Exact modulo
    * 64-bit hash collisions (~(m²/2⁶⁴), negligible).
    *
    * Scale: posting lists are bounded by `maxDf` (shingles appearing in
    * more docs are dropped from the index — the standard df-pruning that
    * keeps the pair explosion sub-quadratic on web corpora); per-pair cost
    * is Σ df² over surviving shingles. The doc-size table is N-sized
    * (one row per document), so it is NOT broadcast-hinted: the join is
    * keyed by doc_id and left to the planner — AQE broadcasts it at
    * small scale and shuffle-joins 12-byte rows at corpus scale. */
  def jaccardPairs(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    // |A| per doc is size(shingles) computed row-locally — NOT a groupBy
    // over the exploded rows, which would shuffle the whole posting set a
    // second time just to count it.
    val sizes = documents
      .select(col("doc_id"), size(shingles(col("text"), n)).as("n_sh"))
    val postings = sh.groupBy(col("h"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    val pairs = postings
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash signature: k independent hash functions realized as salted
    * xxhash64 (`xxhash64(salt_i, s)`) with min over shingles — no 64-bit
    * arithmetic, so it is safe under ANSI mode (Spark 4 default) and each
    * salt gives an independent permutation approximation. Returns an
    * array<long> column of length k. */
  def minhashSignature(text: Column, k: Int = 32, n: Int = 3): Column = {
    val sh = shingles(text, n)
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(lit(s"mh$i"), s)))
    }: _*)
  }

  /** MinHash signatures via explode + min-aggregation: shingles are
    * materialized ONCE per document, each shingle row gets k salted
    * hashes (cheap codegen'd xxhash64), and the k mins are collected by a
    * map-side-combining hash aggregate. This is one data pass; computing
    * the signature as a single nested expression would re-evaluate the
    * shingle construction k times per row (measured 10× slower). */
  def minhashSignatures(documents: DataFrame, k: Int = 32, n: Int = 3): DataFrame = {
    val exploded = documents
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
    val hashed = exploded.select(
      col("doc_id") +: (0 until k).map(i =>
        xxhash64(lit(s"mh$i"), col("s")).as(s"h$i")): _*)
    hashed
      .groupBy(col("doc_id"))
      .agg(min(col("h0")).as("h0"),
        (1 until k).map(i => min(col(s"h$i")).as(s"h$i")): _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup pairs: signatures → b bands of r rows → band
    * hash → inverted index on (band, hash) → candidate pairs → verified
    * with estimated Jaccard (signature agreement fraction). */
  def minhashLshPairs(documents: DataFrame, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, n: Int = 3): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(documents, k, n)
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(concat_ws(",",
          transform(slice(col("sig"), bnd * r + 1, lit(r)), _.cast("string")))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b))
          .cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Column-arg bit shifts (functions.shiftright/left only take Int). */
  private def shr(a: Column, b: Column): Column =
    call_function("shiftright", a, b)
  private def shl(a: Column, b: Column): Column =
    call_function("shiftleft", a, b)

  /** SimHash (64-bit): per-token hash votes ±1 on each bit; sign of the
    * vote sum forms the fingerprint bit. Near-dups = small Hamming
    * distance, found by exact match on 4 16-bit chunks (any chunk equal →
    * candidate; Hamming ≤ 3 guarantees one equal chunk by pigeonhole). */
  def simhash(text: Column): Column = {
    val toks = tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(shr(xxhash64(t), b).bitwiseAND(lit(1L)) === 1L,
            lit(1L)).otherwise(lit(-1L))),
        (x, y) => x + y))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash fingerprints via explode + wide aggregation (one token pass,
    * 64 map-side-combining vote sums per doc) — same values as
    * `simhash(col)` but ~10× faster on large corpora because the token
    * array is materialized once instead of per-bit. */
  def simhashFingerprints(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val votes = tok.groupBy(col("doc_id")).agg(
      sum(when(col("h").bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("b0"),
      (1 until 64).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"b$b")): _*)
    votes.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce((a, c) => a.bitwiseOR(c)).as("fp"))
  }

  /** SimHash near-dup candidate pairs with exact Hamming verification. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(documents)
    val chunked = fp.select(
      col("doc_id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => shr(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val hamming = bit_count(col("a.fp").bitwiseXOR(col("b.fp")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
