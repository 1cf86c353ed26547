package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column builders for the training-data-pipeline operators.
  *
  * Everything here composes codegen'd Spark built-ins (higher-order array
  * functions, xxhash64, bit ops) — no Scala UDFs — so the expressions stay
  * inside WholeStageCodegen and distribute trivially: each builder is a pure
  * per-row expression with no shuffle of its own.
  */
package object functions {

  /** Engine-independent decimal rounding: floor(x·10^k + 0.5)/10^k.
    * Spark's `round` rounds the shortest decimal rendering of the double
    * (HALF_UP on Double.toString) while DuckDB rounds the binary value, so
    * the two disagree on .xx5 boundaries. This formulation is pure IEEE
    * double arithmetic — identical in any engine — which keeps oracle
    * hashes stable. Mirror in SQL as floor(x * 1eK + 0.5) / 1eK.
    */
  def stableRound(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * p + 0.5) / p
  }

  /** Whitespace-ish tokenizer: lowercased word tokens. Backed by the native
    * one-pass [[TokensExpr]] — the `filter(split(lower(…)))` formulation is
    * interpreted (higher-order functions are CodegenFallback) and was the
    * measured scan-side workload of the text gates. [[tokensColumns]] keeps
    * the builtin formulation as the parity reference.
    */
  def tokens(text: Column): Column = TextExprs.tokensNative(text)

  /** The builtin-composed reference formulation of [[tokens]] (tested
    * value-identical in TextExprsSpec).
    */
  def tokensColumns(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0)

  /** BPE-ish token count: words, numbers, and punctuation runs each count.
    * Backed by the native one-pass [[BpeishCountExpr]]; the regex
    * formulation stays as [[bpeishTokenCountColumns]], the parity
    * reference (CountExprsSpec).
    */
  def bpeishTokenCount(text: Column): Column = CountExprs.bpeishCount(text)

  /** The regex reference formulation of [[bpeishTokenCount]]. */
  def bpeishTokenCountColumns(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Token n-gram shingles (as strings) of the given size. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) <= n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** 64-bit hash of each shingle (xxhash64, fixed Spark seed 42). */
  def shingleHashes(sh: Column): Column =
    array_distinct(transform(sh, s => xxhash64(s)))

  private val MersennePrime = (1L << 61) - 1

  /** Deterministic per-index affine coefficients for minhash permutations. */
  private[functions] def coeff(tag: String, i: Int): Long = {
    // splitmix64 over a stable seed — deterministic across JVMs/executors.
    var z = (tag.hashCode.toLong << 32) | i.toLong
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val r = (z ^ (z >>> 31)) & MersennePrime
    if (r == 0) 1L else r
  }

  /** MinHash signature (array<long> of length k) over a set of 64-bit
    * shingle hashes: sig_i = min over h of ((a_i*h + b_i) mod p).
    */
  def minhashSignature(hashes: Column, k: Int): Column = {
    val sigs = (0 until k).map { i =>
      val a = coeff("minhash-a", i)
      val b = coeff("minhash-b", i)
      array_min(transform(hashes, h => pmod(h * a + b, lit(MersennePrime))))
    }
    array(sigs: _*)
  }

  /** LSH band keys: hash each row-group of the signature → array of
    * (bandIndex, bandHash) structs, ready to explode + groupBy.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(array_join(
          transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string")),
          "_")).as("bucket"))
    }
    array(keys: _*)
  }

  /** 64-bit SimHash over tokens: per bit j, sum ±1 of xxhash64(token) bit j;
    * bit set iff sum > 0. Returned as LongType.
    */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    // shiftright/shiftleft builtins take Int, not Column — call the SQL
    // functions directly so the shift amount can be the lambda variable.
    val bitSums = transform(sequence(lit(0), lit(63)), j =>
      aggregate(hashes, lit(0),
        (acc, h) =>
          acc + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)), (s, j) =>
        when(s > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two arrays. Backed by the native one-pass
    * [[JaccardSimExpr]] — the builtin formulation re-hashes both inputs
    * twice (array_intersect AND array_union each build their sets) and
    * materializes both result arrays just for their lengths, inside the
    * minhash/ngram verification inner loops. [[jaccardColumns]] keeps the
    * builtin formulation as the parity reference (JaccardExprSpec).
    */
  def jaccard(a: Column, b: Column): Column =
    JaccardSimExpr.jaccardNative(a, b)

  /** The builtin-composed reference formulation of [[jaccard]] (tested
    * value-identical in JaccardExprSpec for non-null inputs; on a NULL
    * ARRAY it yields 1.0 through `size(null) = -1` on both numerator and
    * denominator — the native expression yields null there, the
    * oracle-faithful value; no query path feeds a null array).
    */
  def jaccardColumns(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Dot product of two equal-length numeric arrays (sequential fold — the
    * same accumulation order DuckDB's list functions use).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Unit-normalize a vector (null-safe: zero vectors stay zero). Native
    * one-pass expression — always returns array<double>.
    */
  def l2normalize(a: Column): Column = VectorExprs.l2normalizeNative(a)

  /** The builtin-composed reference formulation of [[l2normalize]]
    * (parity-tested in GraftExtensionsSpec). Interpreted evaluation
    * recomputes the norm per element — O(dim²); kept as the independent
    * oracle for the native expression, not for production paths.
    */
  def l2normalizeColumns(a: Column): Column = {
    val n = l2norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Element-wise mean of an array of equal-length vectors (mean pooling
    * token embeddings into a document embedding).
    */
  def meanPool(vs: Column): Column =
    transform(
      aggregate(vs, transform(element_at(vs, 1), _ => lit(0.0)),
        (acc, v) => zip_with(acc, v, _ + _)),
      x => x / size(vs))

  /** Cosine similarity over array<double> columns. Zero-norm inputs yield
    * 0.0 (not NaN): a zero vector is "similar to nothing", and a NaN here
    * would otherwise rank FIRST under Spark's `sim DESC` ordering and in
    * [[graft.functions.TopKPairsAgg]].
    *
    * Backed by the native one-pass [[CosineExpr]] — the higher-order-
    * function formulation is CodegenFallback and interprets a deep tree
    * per evaluation, which dominates the quadratic near-dup joins.
    * [[cosineColumns]] keeps that formulation as the parity reference.
    */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosineNative(a, b)

  /** The builtin-composed reference formulation of [[cosine]] (tested
    * value-identical; kept for VectorExprsSpec and as documentation of
    * the exact semantics the native expression implements).
    */
  def cosineColumns(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Polynomial rolling hash over tokens (document fingerprint).
    * fp = sum tok_i_hash * B^i mod p — order-sensitive, unlike minhash.
    */
  def rollingHash(toks: Column): Column =
    aggregate(toks, struct(lit(0L).as("h"), lit(1L).as("pw")),
      (acc, t) => struct(
        pmod(acc.getField("h") + xxhash64(t) * acc.getField("pw"), lit(MersennePrime)).as("h"),
        pmod(acc.getField("pw") * 1000003L, lit(MersennePrime)).as("pw")),
      acc => acc.getField("h"))

  /** Deterministic ±1 sign matrix for one LSH hyperplane (splitmix64 over
    * (table, plane, dim) — same on every JVM, no broadcast needed).
    */
  def planeSigns(table: Int, plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { i =>
      var z = (table.toLong << 40) ^ (plane.toLong << 20) ^ i.toLong ^ 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 1L) 1.0 else -1.0
    }

  /** Bucket id of `v` among sorted distinct `bounds` (= #bounds strictly
    * below v) — a native binary search ([[SearchSortedExpr]]): O(log n) per
    * row with fixed codegen size, where the composed indicator-sum is O(n)
    * and falls out of whole-stage codegen at cluster-scale bucket counts.
    */
  def searchSorted(v: Column, bounds: Array[Double]): Column =
    SearchSortedExpr.searchSortedNative(v, bounds)

  /** Partial-merge exact top-k: the k best (id, sim) pairs per group as an
    * array of structs, best-first by (sim desc, id asc). See
    * [[TopKPairsAgg]] — the map side reduces to one k-entry heap per group
    * per partition, so the shuffle is bounded by groups × partitions × k
    * instead of the full pair count.
    */
  def topkPairs(sim: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TopKPairsAgg(Bridge.expression(sim), Bridge.expression(id),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())
  }

  /** [[topkPairs]] with a PLAN-computed bound: `k` is a column (same value
    * on every row of a group — e.g. a corpus-fraction shortlist size
    * cross-joined from a 1-row stats frame), so sizing the shortlist needs
    * no driver-side `count()` job before the plan is built.
    */
  def topkPairsDyn(sim: Column, id: Column, k: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TopKPairsAgg(Bridge.expression(sim), Bridge.expression(id),
      Bridge.expression(k)).toAggregateExpression())
  }

  /** Random-hyperplane signature for cosine LSH: `planes` ±1 hyperplanes
    * materialized as literal sign vectors (computed once on the driver —
    * NOT per row), packed into a LongType bit-sig. `table` seeds
    * independent hash tables for multi-table LSH.
    */
  def hyperplaneSignature(vec: Column, planes: Int, table: Int = 0,
      dims: Int = 64): Column = {
    require(planes <= 64)
    val bits = (0 until planes).map { p =>
      val dotp = aggregate(
        zip_with(vec, typedlit(planeSigns(table, p, dims).toSeq), (x, s) => x * s),
        lit(0.0), (acc, v) => acc + v)
      when(dotp > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
