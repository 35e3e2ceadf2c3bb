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
  def hexToLong(c: String, width: Int): String = {
    require(width >= 1 && width <= 15, s"width must be in [1,15], got $width")
    (0 until width).map { i =>
      val pow = BigInt(16).pow(width - 1 - i)
      s"(instr('0123456789abcdef', substr($c, ${i + 1}, 1)) - 1) " +
        s"* CAST($pow AS BIGINT)"
    }.mkString("(", "\n + ", ")")
  }

  /** The full-width key: 15 hex chars → [0, 2^60). */
  def hex15ToLong(c: String): String = hexToLong(c, 15)
}
