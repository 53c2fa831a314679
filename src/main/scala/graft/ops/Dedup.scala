package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash(+LSH), SimHash. All built from
  * codegen'd built-in functions (md5 / array ops / hash-joins) — no
  * Scala UDFs — so every op stays inside whole-stage codegen and the
  * expensive steps (pair generation) are plain shuffles Catalyst can
  * plan. Determinism: md5 hex strings are the hash domain, so results
  * are identical across JVMs, partitionings, and external oracles.
  */
object Dedup {

  /** Tokenize via the SQL-portable simple split (lowercase, split on
    * non-alphanumeric runs, drop empties) — the shared spec between the
    * Spark ops and the DuckDB oracles (see Tokenizer.simpleTerms). */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Exact duplicate groups by content hash. Scales: one hash-shuffle,
    * map-side combinable. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** Distinct word n-gram shingles per doc: (id, shingle). Uniqueness
    * of (id, shingle) is a PER-DOCUMENT property (ids are a primary
    * key), so the dedup is `array_distinct` on the doc-local shingle
    * array BEFORE the explode — a narrow codegen'd expression — not a
    * global `.distinct()`, which shuffled the entire exploded shingle
    * stream once per consumer (jaccard evaluates this subtree three
    * times; guide §2.4: remove shuffles outright). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = tokensCol(col(textCol))
    Par.widen(df).where(size(toks) >= n)
      .select(col(idCol).as("id"),
        explode(array_distinct(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))).as("shingle"))
  }

  /** Pairwise n-gram Jaccard similarity >= minJ. Candidate pairs come
    * from the shingle-inverted self-join (only docs sharing >=1 shingle
    * meet) — the scalable alternative to an O(N^2) cross join.
    *
    * `maxShingleDf` caps the self-join blowup: a ubiquitous shingle in M
    * docs alone produces O(M²) candidate pairs, so shingles with df >
    * cap are dropped as non-discriminative (standard practice; they
    * carry ~no Jaccard signal). With the cap above the corpus' max
    * shingle df the result is EXACT Jaccard (the oracle setting); when
    * binding, similarity is Jaccard over the capped shingle sets (sizes
    * computed after the drop, so it stays a true Jaccard of reduced
    * sets). For aggressive dedup at scale prefer [[minhashLshPairs]]. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, minJ: Double,
                   maxShingleDf: Long = 100000L): DataFrame = {
    // the self-join runs on a 60-bit md5-derived key, not the shingle
    // string: 8-byte join/shuffle keys instead of ~n·8-byte strings.
    // Hashing happens AFTER the string-level distinct (a collision would
    // merge two shingles — mirrored bit-for-bit by the oracle, which
    // hashes the same way, so results stay exactly comparable; P(any
    // collision) ~ m²/2^61, negligible at any per-corpus vocabulary)
    val sh0 = shingles(df, idCol, textCol, n)
      .select(col("id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10)
          .cast("long").as("shingle"))
    // NO cache: the three consumers (sizes + both join sides) recompute
    // the codegen'd shingle scan — at 10^12 docs caching this would
    // thrash the block manager (same reasoning as the index build's
    // re-scan policy), and measured at test scale recompute is faster
    // than the columnar cache round-trip
    val sh = if (maxShingleDf == Long.MaxValue) sh0 else {
      val hot = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
        .where(col("sdf") > maxShingleDf)
        .select(col("shingle"))
      sh0.join(hot, Seq("shingle"), "left_anti")
    }
    // plan-shape note (measured, plans/r06): the self-join's two sides
    // already share ONE exchange via ReuseExchange (identical subtrees),
    // and `sizes` prunes to an id-only shuffle with map-side partial
    // counts — an explicit repartition("shingle") was tried and REVERTED:
    // it added an exchange without enabling any further reuse (sizes'
    // exchange is keyed and pruned differently, so it can never share)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val a = sh.withColumnRenamed("id", "a")
    val b = sh.withColumnRenamed("id", "b")
    val inter = a.join(b, Seq("shingle"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa"), Seq("a"))
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb"), Seq("b"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .withColumn("jacc", round(col("inter") / col("uni"), 6))
      .where(col("jacc") >= minJ)
      .select(col("a"), col("b"), col("inter"), col("uni"), col("jacc"))
  }

  /** MinHash signatures (MinHash per Broder '97): ONE md5 per shingle,
    * split into two 40-bit halves h1/h2, then the Kirsch-Mitzenmacher
    * composite family h_j = h1 + j·h2 — 64 hash functions for the price
    * of one digest (the md5-per-(j,shingle) variant was the dominant
    * cost of the minhash/LSH queries). 40-bit halves keep
    * h1 + 63·h2 < 2^46, so the arithmetic is overflow-free in both
    * Spark and the DuckDB oracle.
    *
    * ZERO shuffles: a signature is a per-DOCUMENT property, so the
    * minima are doc-local array expressions over the doc's shingle
    * array (one md5 per distinct shingle, then `numHashes` array-min
    * passes) — the previous explode → groupBy(id) shape paid a full
    * exchange of the shingle stream for an aggregation whose grouping
    * key was the row it started from (guide §2.4). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val toks = tokensCol(col(textCol))
    val shArr = array_distinct(transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    val halves = transform(shArr, s => struct(
      conv(substring(md5(s), 1, 10), 16, 10).cast("long").as("h1"),
      conv(substring(md5(s), 11, 10), 16, 10).cast("long").as("h2")))
    val mhs = (0 until numHashes).map(j =>
      array_min(transform(col("_hh"),
        x => x.getField("h1") + lit(j.toLong) * x.getField("h2"))).as(s"mh$j"))
    Par.widen(df).where(size(toks) >= n)
      .select(col(idCol).as("id"), halves.as("_hh"))
      .select(col("id") +: mhs: _*)
  }

  /** LSH candidate pairs: band hash = md5(concat of r consecutive
    * minhashes); docs sharing any band bucket are candidates
    * (banding per Leskovec/Rajaraman/Ullman MMDS ch.3). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, bands: Int, rows: Int): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, n, bands * rows)
    val bandCols = (0 until bands).map { bnd =>
      val parts = (0 until rows).map(r => col(s"mh${bnd * rows + r}"))
      struct(lit(bnd).as("band"), md5(concat_ws("|", parts: _*)).as("bh"))
    }
    val buckets = sig.select(col("id"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val l = buckets.withColumnRenamed("id", "a")
    val r = buckets.withColumnRenamed("id", "b")
    l.join(r, Seq("band", "bh"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** 16-bit SimHash: bit j votes by md5(term) hex digit j (high nibble
    * bit), weighted by term frequency (Charikar '02, reduced width so
    * the external oracle stays expressible). */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ZERO shuffles: the tf-weighted vote Σ_terms tf·(±1) equals the
    // per-occurrence vote Σ_occurrences (±1) — an associative integer
    // sum over the doc's OWN token array, so each bit's vote is a
    // doc-local aggregate() expression (the md5 array materializes
    // once per doc). The original shape paid two exchanges of the
    // token stream for a per-document property (guide §2.4).
    val hArr = transform(tokensCol(col(textCol)), t => md5(t))
    val bitSums = (0 until 16).map { j =>
      aggregate(col("_h"), lit(0L), (acc, h) =>
        acc + when(substring(h, j + 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), lit(1L))
          .otherwise(lit(-1L))).as(s"s$j")
    }
    val withSums = Par.widen(df)
      // token-less docs produced no grouped row before: same exclusion
      .where(size(tokensCol(col(textCol))) >= 1)
      .select(col(idCol).as("id"), hArr.as("_h"))
      .select(col("id") +: bitSums: _*)
    val sim = (0 until 16).map(j =>
      when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    withSums.select(col("id"), sim.as("simhash"))
  }

  /** Production 64-bit SimHash (Charikar '02 at full fingerprint
    * width — the precision [[simhash16]], which stays 16-bit only to
    * remain oracle-expressible, lacks for near-dup detection at
    * Hamming ≤ 3). Bit j votes by bit j of the term's 64-bit md5-derived
    * hash (two 32-bit `conv` halves — each fits a long exactly),
    * tf-weighted. Same single map-side-combinable aggregation shape;
    * an independent fingerprint, not a widening of simhash16. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // zero-shuffle doc-local shape, same reasoning as [[simhash16]]
    val halves = transform(tokensCol(col(textCol)), t => struct(
      conv(substring(md5(t), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(t), 9, 8), 16, 10).cast("long").as("h2")))
    val bitSums = (0 until 64).map { j =>
      val half: Column => Column =
        x => if (j < 32) x.getField("h1") else x.getField("h2")
      aggregate(col("_hh"), lit(0L), (acc, x) =>
        acc + when(shiftrightunsigned(half(x), j % 32)
          .bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))).as(s"s$j")
    }
    val withSums = Par.widen(df)
      // token-less docs produced no grouped row before: same exclusion
      .where(size(tokensCol(col(textCol))) >= 1)
      .select(col(idCol).as("id"), halves.as("_hh"))
      .select(col("id") +: bitSums: _*)
    val sim = (0 until 64).map(j =>
      when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    withSums.select(col("id"), sim.as("simhash64"))
  }

  /** Hamming distance between two 64-bit fingerprints as a codegen'd
    * Column (bit_count of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
