package graft.ops

/** Cross-engine integer keys derived from md5 — SQL fragments shared
  * VERBATIM by the Spark plan and the DuckDB oracle, so both engines
  * compute bit-identical BIGINTs from the same hex digits.
  *
  * md5, not xxhash64, is the house convention for anything an oracle
  * must replay ([[graft.operators.Sharding]]): every engine ships md5
  * with identical lowercase-hex output, while 64-bit non-crypto hashes
  * are engine-internal. The hex→integer step is spelled as an
  * `instr`-polynomial rather than `conv()`/`from_hex()` because those
  * differ or don't exist across engines, whereas `instr`/`substr`
  * behave identically (1-based, 0 on miss) in both.
  */
object Md5Key {

  /** Hash space of [[hex15ToLong]]: 16^15 = 2^60. */
  val Space: Long = 1L << 60

  /** SQL turning a column holding `width` lowercase hex chars into its
    * BIGINT value in [0, 16^width) — horner-free unrolled polynomial
    * of exact integer multiply-adds. Each power is CAST to BIGINT: the
    * small ones parse as INT literals and digit·16^7 already overflows
    * int32 (ANSI Spark throws); an `L` suffix would fix Spark but
    * DuckDB doesn't parse it. width ≤ 15 keeps the maximum value at
    * 2^60−1, 3 bits inside int64. */
  def hexToLong(c: String, width: Int): String = hexToLongAt(c, 1, width)

  /** Like [[hexToLong]] but reading `width` hex chars starting at the
    * 1-based `offset` of `c` — the SINGLE-DIGEST convention (r18): one
    * md5 yields 32 hex chars, i.e. several disjoint independent
    * slices, so a d-hash sketch build (count-min rows, Bloom
    * positions) costs ONE digest per input row instead of d, with
    * each hash function reading its own slice. Slice independence is
    * md5's avalanche property — the same reason seed-keyed digests
    * were independent. Oracles replay the same offsets, so the gates
    * hold cross-engine exactly as before. */
  def hexToLongAt(c: String, offset: Int, width: Int): String = {
    require(width >= 1 && width <= 15, s"width must be in [1,15], got $width")
    require(offset >= 1 && offset + width - 1 <= 32,
      s"slice [$offset, ${offset + width - 1}] must sit inside the 32 hex chars of an md5 digest")
    (0 until width).map { i =>
      val pow = BigInt(16).pow(width - 1 - i)
      s"(instr('0123456789abcdef', substr($c, ${offset + i}, 1)) - 1) " +
        s"* CAST($pow AS BIGINT)"
    }.mkString("(", "\n + ", ")")
  }

  /** The full-width key: 15 hex chars → [0, 2^60). */
  def hex15ToLong(c: String): String = hexToLong(c, 15)

  /** Spark-ENGINE form of [[hexToLongAt]]: the identical value via
    * the codegen'd `conv(hex, 16, 10)` built-in instead of the
    * unrolled instr polynomial. The polynomial exists because `conv`
    * is not portable SQL (DuckDB lacks it), but the ENGINE side never
    * needed portability — the hash gate compares VALUES, and the
    * polynomial's per-digit substr+instr tree measured ~2.6× the cost
    * of one conv on the q147 probe (r18), multiplying at width 15
    * (15 instr+substr calls vs one conv). DuckDB oracles keep
    * [[hexToLongAt]]; conv == polynomial on lowercase hex is pinned
    * by fuzz in Round18Spec (exact BIGINT < 2^60 on both paths). */
  def hexToLongSparkAt(c: String, offset: Int, width: Int): String = {
    require(width >= 1 && width <= 15, s"width must be in [1,15], got $width")
    require(offset >= 1 && offset + width - 1 <= 32,
      s"slice [$offset, ${offset + width - 1}] must sit inside the 32 hex chars of an md5 digest")
    s"cast(conv(substr($c, $offset, $width), 16, 10) as bigint)"
  }

  /** [[hexToLong]]'s engine-side twin (prefix slice). */
  def hexToLongSpark(c: String, width: Int): String =
    hexToLongSparkAt(c, 1, width)

  /** [[hex15ToLong]]'s engine-side twin. */
  def hex15ToLongSpark(c: String): String = hexToLongSparkAt(c, 1, 15)
}
