package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-count sketching (HyperLogLog, Flajolet et al. 2007) with a
  * fully deterministic, engine-portable contract — the 100 TB primitive for
  * "how many distinct tokens/shingles/urls per source" without paying a
  * per-key distinct shuffle of the items themselves.
  *
  * Portability is the design constraint (the driver gate hash-compares
  * against DuckDB): the item hash is the first 15 hex chars of md5 (a
  * 60-bit integer both engines extract identically), the register rank is
  * computed via `length(bin(x))` (both engines print binary without leading
  * zeros), and the harmonic-sum denominator is held as an EXACT integer in
  * units of 2^-(remBits+1) (every term a power of two; Σ ≤ 2^61 fits a
  * long for every p). The only float op is the final single division by a
  * shared double literal — one correctly-rounded IEEE op on identical
  * inputs, so engines cannot disagree; the integer columns gate the sketch
  * itself regardless.
  *
  * Scale shape: exchange 1 groups (key, register) with map-side combine —
  * at most m = 2^p rows per key per map task survive the partial
  * aggregate, however many billions of items a key has; exchange 2 rolls
  * m register rows per key into one. The items themselves never shuffle
  * (the hash/register/rank projection is map-side), which is the entire
  * point versus `countDistinct`'s full item exchange.
  *
  * Estimator contract: `est_distinct` is the RAW HLL estimate
  * α_m · m² / Σ 2^-M_j — accurate (σ ≈ 1.04/√m) once n ≳ 2.5·m. In the
  * small-range regime (n ≪ m) raw HLL reads ~0.72·m regardless of n; there
  * the emitted `n_hit` (occupied registers) is itself the linear-counting
  * signal (n_hit ≈ n − n²/2m — callers wanting small-range estimates use
  * m·ln(m/(m−n_hit)), kept out of the engine contract because `ln` is not
  * bit-portable across libm implementations). Pick p so the expected
  * cardinality clears 2.5·2^p, exactly as in production HLL use.
  */
object Sketches {

  /** α_m per the HLL paper: 0.673/0.697/0.709 for m = 16/32/64, the
    * asymptotic formula above.
    */
  def alpha(p: Int): Double = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / (1L << p).toDouble)
  }

  /** The shared numerator constant α_m · m² · 2^(remBits+1); interpolated
    * as the SAME double literal into the Spark plan and the DuckDB oracle.
    */
  def estConstant(p: Int): Double = {
    val m = (1L << p).toDouble
    alpha(p) * m * m * math.pow(2.0, (60 - p) + 1)
  }

  /** HLL sketch of `count(distinct item)` per `key` over an (key, item)
    * DataFrame. Emits one row per key:
    * (key, n_hit, max_rank, sum_terms, est_distinct) — the first four are
    * exact integers (the gate), est_distinct the raw-HLL derived column.
    */
  def hllDistinct(items: DataFrame, key: String, item: String,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 14, "p in [4, 14]")
    val remBits = 60 - p
    val m = 1L << p
    val scaleBit = remBits + 1 // rank ∈ [1, remBits+1]; empty register = 0
    val h = conv(substring(md5(col(item).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val rem = h % lit(1L << remBits)
    val rank = when(rem === 0L, lit(scaleBit))
      .otherwise(lit(scaleBit) - length(bin(rem)))
    val regs = items.select(col(key).as("k"),
      shiftright(h, remBits).as("reg"), rank.cast("int").as("rk"))
    val regMax = regs.groupBy(col("k"), col("reg"))
      .agg(max(col("rk")).as("mx"))
    val rolled = regMax.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_hit"),
        max(col("mx")).cast("long").as("max_rank"),
        sum(expr(s"shiftleft(cast(1 as bigint), $scaleBit - mx)"))
          .cast("long").as("s_hit"))
    val sumTerms = col("s_hit") +
      (lit(m) - col("n_hit")) * lit(1L << scaleBit)
    rolled.select(col("k").as(key), col("n_hit"), col("max_rank"),
      sumTerms.cast("long").as("sum_terms"),
      floor(lit(estConstant(p)) / sumTerms.cast("double")).cast("long")
        .as("est_distinct"))
  }

  /** Per-source distinct word-`n`-gram estimate over a (source, text)
    * corpus — the "how much unique content does this source actually
    * contribute" curation signal. Shingle construction is the in-row
    * window pattern (transform+slice off the token array, map-side
    * explode); the shingle strings feed [[hllDistinct]] and die before any
    * exchange.
    */
  def hllShingleDistinct(docs: DataFrame, n: Int = 3, p: Int = 6): DataFrame = {
    require(n >= 1, "n >= 1")
    val base = docs.select(col("source"),
        TextOps.splitToks(col("text")).as("toks"))
      .where(length(trim(col("text"))) > 0 && size(col("toks")) >= n)
    val items = base.select(col("source"), explode(
      transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("item"))
    hllDistinct(items, "source", "item", p)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) point queries with the
    * same engine-portable discipline as the HLL above: row hash i of an
    * item is the first 8 md5 hex chars of `i || '|' || item` taken mod `w`
    * — both engines extract it identically, and every register is an exact
    * long, so the sketch (and therefore the estimate) is bit-equal
    * anywhere.
    *
    * Scale shape: the register table is the d·w-bounded result of ONE
    * map-side-combined aggregate over the (row, col) projection of the
    * token stream — per map task at most d·w partial rows survive no
    * matter how many trillions of tokens flow through, the exact reason a
    * sketch beats `groupBy(token)` when the token space (urls, shingles,
    * n-grams) is too large to aggregate exactly. Estimates for the query
    * set then come from `min` over the d broadcast-joined register rows.
    *
    * `cmsTokenCounts` answers point queries for `queries` tokens over the
    * corpus token stream: (tok, cms_est). One-sided error: cms_est ≥ true
    * count always; P[overshoot > ε·N] ≤ (1/2)^d at w = e/ε.
    */
  def cmsTokenCounts(docs: DataFrame, queries: Seq[String], d: Int = 4,
                     w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 1, "d, w >= 1")
    val toks = docs.select(explode(TextOps.toksOrEmpty(col("text"))).as("tok"))
    // (row, col) projection: d register hits per token occurrence, in-row
    val hits = toks.select(explode(transform(
      sequence(lit(0), lit(d - 1)),
      i => struct(i.as("r"),
        (conv(substring(md5(concat(i.cast("string"), lit("|"), col("tok"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % w).as("c")))).as("h"))
      .select(col("h.r").as("r"), col("h.c").as("c"))
    val registers = hits.groupBy("r", "c").agg(count(lit(1)).as("reg"))

    // point queries: d lookups per query token, min over rows
    val qdf = docs.sparkSession.createDataFrame(
      queries.map(Tuple1(_))).toDF("tok")
    val qhits = qdf.select(col("tok"), explode(transform(
      sequence(lit(0), lit(d - 1)),
      i => struct(i.as("r"),
        (conv(substring(md5(concat(i.cast("string"), lit("|"), col("tok"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % w).as("c")))).as("h"))
      .select(col("tok"), col("h.r").as("r"), col("h.c").as("c"))
    qhits.join(registers, Seq("r", "c"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("reg"), lit(0L))).as("cms_est"))
  }
}
