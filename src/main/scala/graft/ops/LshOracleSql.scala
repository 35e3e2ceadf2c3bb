package graft.ops

/** DuckDB replay of the LSH signature arithmetic — the generator that
  * promoted q35/q36 from rows-only rows to full cross-engine hash
  * gates (the r15 verdict's task 6).
  *
  * The engine's near-dup signatures are integer hashes chosen for
  * codegen speed, not SQL friendliness: FNV-1a over UTF-8 word bytes
  * + a splitmix64 finalizer ([[graft.functions.ShingleHashes]]), the
  * splitmix64-mixed MinHash family ([[graft.functions.MinHashSigs]]),
  * the splitmix band fold ([[graft.functions.Mix64Fold]]), and the
  * bit-majority SimHash ([[graft.functions.SimHash64]]). All of it is
  * wrapping 64-bit arithmetic, which DuckDB CAN express — with two
  * tricks this generator encapsulates:
  *
  *  - wrapping multiply: DuckDB integer ops THROW on overflow (no
  *    wraparound anywhere), and even INT128 overflows for two ~2^64
  *    factors — so `a*C mod 2^64` splits the constant: `a*C = a*Clo +
  *    (a*Chi mod 2^32)·2^32 (mod 2^64)`, every intermediate < 2^96;
  *  - UTF-8 bytes: `hex(encode(word))` + per-pair `strpos` arithmetic
  *    gives exact byte access (no ASCII assumption).
  *
  * Each avalanche stage is emitted as its own chained CTE so no
  * subexpression is textually duplicated more than once; the q35
  * oracle lands at ~10 KB of generated SQL — mechanical, and derived
  * from the SAME constants the native expressions use (drift between
  * engine and oracle is a one-line constant diff, and
  * `Round16Spec` pins engine output == replay output on a live
  * fixture through the actual operators). */
object LshOracleSql {

  private val M64 = "18446744073709551616"
  private val Gold = java.lang.Long.parseUnsignedLong("9E3779B97F4A7C15", 16)
  private val C1 = java.lang.Long.parseUnsignedLong("BF58476D1CE4E5B9", 16)
  private val C2 = java.lang.Long.parseUnsignedLong("94D049BB133111EB", 16)
  private val FnvOffset = java.lang.Long.parseUnsignedLong("CBF29CE484222325", 16)
  private val FnvPrime = 0x100000001B3L
  private val JStep = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)

  private def uns(v: Long): String =
    java.lang.Long.toUnsignedString(v)

  /** `(e * c) mod 2^64` with every intermediate inside INT128. */
  private def modMul(e: String, c: Long): String = {
    val hi = c >>> 32
    val lo = c & 0xFFFFFFFFL
    s"(((($e)::HUGEINT * $lo) % $M64 + " +
      s"(((($e)::HUGEINT * $hi) % 4294967296) * 4294967296)) % $M64)::UBIGINT"
  }

  /** splitmix64 avalanche of column-expr `z` as three chained stages
    * (prefix_a, prefix_b, prefix). */
  private def avaStages(z: String, pfx: String): Seq[(String, String)] = Seq(
    (s"${pfx}_a", modMul(s"xor($z, $z >> 30)", C1)),
    (s"${pfx}_b", modMul(s"xor(${pfx}_a, ${pfx}_a >> 27)", C2)),
    (pfx, s"xor(${pfx}_b, ${pfx}_b >> 31)"))

  /** mix(z) = avalanche((z + GOLD) mod 2^64). */
  private def mixStages(z: String, pfx: String): Seq[(String, String)] =
    avaStages(s"((($z)::HUGEINT + ${uns(Gold)}) % $M64)::UBIGINT", pfx)

  /** Chain stages into one-CTE-per-stage SQL; returns (ctes, lastName). */
  private def chain(baseCte: String, nm: String,
                    stages: Seq[(String, String)]): (Seq[(String, String)], String) = {
    var prev = baseCte
    val out = stages.zipWithIndex.map { case ((col, e), i) =>
      val name = s"${nm}s$i"
      val cte = (name, s"SELECT *, $e AS $col FROM $prev")
      prev = name
      cte
    }
    (out, prev)
  }

  /** CTEs from the raw table through per-doc DISTINCT shingle hashes
    * (`shd(doc_id, sh)`) — the shared front of both replays; exactly
    * [[graft.functions.ShingleHashes]].compute. */
  private def shingleCtes(k: Int, table: String): Seq[(String, String)] = {
    val base = Seq(
      ("wsl", s"SELECT doc_id, string_split(text, ' ') AS ws FROM $table"),
      ("wrd", "SELECT doc_id, unnest(ws) AS word, " +
        "unnest(range(len(ws))) AS wi FROM wsl"),
      ("fnv", s"""SELECT doc_id, wi, list_reduce(
        |      list_prepend(${uns(FnvOffset)}::UBIGINT,
        |        list_transform(range(octet_length(encode(word))), i ->
        |          ((strpos('123456789ABCDEF',
        |              substring(hex(encode(word)), (2*i+1)::INT, 1)))*16
        |           + strpos('123456789ABCDEF',
        |              substring(hex(encode(word)), (2*i+2)::INT, 1)))::UBIGINT)),
        |      (a, b) -> ${modMul("xor(a, b)", FnvPrime)}) AS z FROM wrd""".stripMargin))
    val (whSt, whLast) = chain("fnv", "fnv", avaStages("z", "wh"))
    val mid = Seq(
      ("whl", s"SELECT doc_id, list(wh ORDER BY wi) AS whl " +
        s"FROM $whLast GROUP BY doc_id"),
      ("win", s"SELECT doc_id, whl, unnest(range(len(whl) - ${k - 1})) AS j " +
        s"FROM whl WHERE len(whl) >= $k"))
    val shingleStages = (0 until k).flatMap { t =>
      val elem = s"whl[(j + ${t + 1})::INT]"
      val wrapped = s"((($elem)::HUGEINT * ${t + 1}) % $M64)::UBIGINT"
      val seed = if (t == 0) s"${uns(Gold)}::UBIGINT" else s"sh${t - 1}"
      avaStages(s"xor($seed, $wrapped)", s"sh$t")
    }
    val (shSt, shLast) = chain("win", "win", shingleStages)
    base ++ whSt ++ mid ++ shSt :+
      (("shd", s"SELECT DISTINCT doc_id, sh${k - 1} AS sh FROM $shLast"))
  }

  /** The q35 replay: MinHash sigs → splitmix band fold → LSH bucket
    * self-join → exact hashed-shingle Jaccard ≥ threshold. Mirrors
    * [[graft.operators.Dedup.minHashPairs]] parameter-for-parameter;
    * `thresholdSql` is spliced verbatim (e.g. "0.6"). */
  def minHashPairsSql(k: Int, numHashes: Int, bands: Int,
                      thresholdSql: String,
                      table: String = "documents"): String = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val jrows = (0 until numHashes)
      .map(j => s"($j, ${uns(j * JStep)}::UBIGINT)").mkString(", ")
    val pre = shingleCtes(k, table) ++ Seq(
      ("jj", s"SELECT * FROM (VALUES $jrows) AS jt(j, jc)"),
      ("mh0", "SELECT doc_id, sh, j, jc FROM shd CROSS JOIN jj"))
    val (mhSt, mhLast) = chain("mh0", "mh", mixStages("xor(sh, jc)", "mv"))
    // The engine's min is a SIGNED Long comparison (MinHashSigs.compute:
    // `v < sig(j)` with sig initialized to Long.MaxValue), but mv here
    // is UBIGINT whose min() is unsigned order. Signed order inside the
    // unsigned domain = unsigned order of (v XOR 2^63): flip the sign
    // bit, take the unsigned min, flip it back — sv then carries the
    // exact 64-bit pattern of the engine's signature, and every
    // downstream consumer (band fold, list ordering) is bitwise.
    // Pinned by Round17Spec "signed-min identity" on sign-straddling
    // hashes; a plain min(mv) diverges on any doc whose k mixed values
    // include one with the high bit set — i.e. essentially all docs.
    val sbit = s"${uns(java.lang.Long.MIN_VALUE)}::UBIGINT"
    val sig = Seq(
      ("sig", s"SELECT doc_id, j, xor(min(xor(mv, $sbit)), $sbit) AS sv " +
        s"FROM $mhLast GROUP BY doc_id, j"),
      ("sigl", "SELECT doc_id, list(sv ORDER BY j) AS sl FROM sig GROUP BY doc_id"),
      ("bb", s"SELECT * FROM (VALUES ${(0 until bands).map(b => s"($b)").mkString(", ")}) AS bt(b)"),
      ("bf0", "SELECT doc_id, b, sl FROM sigl CROSS JOIN bb"))
    val bandStages = (0 until rows).flatMap { r =>
      val elem = s"sl[(b * $rows + ${r + 1})::INT]"
      val seed = if (r == 0) "b::UBIGINT" else s"bf${r - 1}"
      mixStages(s"xor($seed, $elem)", s"bf$r")
    }
    val (bfSt, bfLast) = chain("bf0", "bf", bandStages)
    val tail = Seq(
      ("banded", s"SELECT doc_id, b AS band_id, bf${rows - 1} AS bh FROM $bfLast"),
      ("cand", """SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2
        |      FROM banded a JOIN banded b2 ON a.band_id = b2.band_id
        |        AND a.bh = b2.bh AND a.doc_id < b2.doc_id""".stripMargin),
      ("shs", "SELECT doc_id, list(sh) AS shl FROM shd GROUP BY doc_id"))
    val ctes = pre ++ mhSt ++ sig ++ bfSt ++ tail
    val jac = "len(list_intersect(x.shl, y.shl))::DOUBLE / " +
      "len(list_distinct(x.shl || y.shl))"
    s"WITH\n${ctes.map { case (n, q) => s"$n AS ($q)" }.mkString(",\n")}\n" +
      s"""SELECT d1, d2, $jac AS jaccard
         |FROM cand JOIN shs x ON x.doc_id = cand.d1
         |          JOIN shs y ON y.doc_id = cand.d2
         |WHERE $jac >= $thresholdSql""".stripMargin
  }

  /** The q36 replay: bit-majority SimHash over the shingle hashes →
    * 16-bit band buckets → Hamming ≤ maxHamming. Mirrors
    * [[graft.operators.Dedup.simHashPairs]]. */
  def simHashPairsSql(k: Int, maxHamming: Int,
                      table: String = "documents"): String = {
    val ctes = shingleCtes(k, table) ++ Seq(
      ("bits", "SELECT unnest(range(64)) AS bit"),
      ("bc", """SELECT doc_id, bit,
        |      sum(((sh >> bit::INT) & 1)::BIGINT) AS cnt, count(*) AS n
        |      FROM shd CROSS JOIN bits GROUP BY doc_id, bit""".stripMargin),
      ("sim", s"""SELECT doc_id,
        |      (sum(CASE WHEN 2*cnt >= n THEN (1::HUGEINT << bit::INT)
        |           ELSE 0 END) % $M64)::UBIGINT AS simhash
        |      FROM bc GROUP BY doc_id""".stripMargin),
      ("bb", "SELECT unnest(range(4)) AS band_id"),
      ("banded", """SELECT doc_id, simhash, band_id,
        |      ((simhash >> (band_id*16)::INT) & 65535) AS band_val
        |      FROM sim CROSS JOIN bb""".stripMargin))
    s"WITH\n${ctes.map { case (n, q) => s"$n AS ($q)" }.mkString(",\n")}\n" +
      s"""SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2,
         |  bit_count(xor(a.simhash, b2.simhash))::INT AS hamming
         |FROM banded a JOIN banded b2 ON a.band_id = b2.band_id
         |  AND a.band_val = b2.band_val AND a.doc_id < b2.doc_id
         |WHERE bit_count(xor(a.simhash, b2.simhash)) <= $maxHamming""".stripMargin
  }
}
