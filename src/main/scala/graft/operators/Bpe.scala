package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding — the loop
  * around q145's merge-pair counting (reference-adjacent: tokenizer
  * fit is a training-data job; the tokenizer must be trained on the
  * corpus mix it will tokenize, so both halves belong in the engine).
  *
  * Representation: a word is a SYMBOL STRING with every symbol
  * wrapped in U+001F unit separators — `[a,b] ⇒ ␟a␟␟b␟`. Merging the
  * pair (x,y) is then `replace(s, ␟x␟␟y␟, ␟xy␟)`: each symbol
  * boundary owns its own two separators, so left-to-right
  * non-overlapping `replace` IS the greedy BPE merge (a run `a a a a`
  * merges to `aa aa`, never the overlap-sharing `aa a a`), and —
  * decisive for the oracle gate — `replace` has identical semantics
  * in every SQL engine, so DuckDB replays training and encoding
  * verbatim, no pinning (q101's unrolled-iteration convention).
  *
  * Training is on the WORD-FREQUENCY table, not the corpus: the
  * classic Sennrich et al. (ACL 2016) formulation — pair counts
  * weight by word frequency, so a 100 TB corpus reduces to its
  * (pruned) vocabulary after ONE scan and every merge iteration
  * touches |vocab| rows. `minCount` is the scale dial: real crawls
  * have unbounded hapax tails; pruning them bounds the iteration
  * state like every production BPE trainer does. Each iteration's
  * argmax joins back as a BROADCAST 1-row aggregate (the q107/q109
  * iterative-scalar stance — no driver-side value ever enters the
  * dataflow), and the per-round eager `localCheckpoint` is the
  * [[Dedup]] connected-components convention: cut lineage, one
  * distributed job per round.
  *
  * Encoding applies the WHOLE ordered merge table in ONE in-row
  * higher-order fold — `aggregate(merges, wrap(token), (acc, m) ->
  * replace(acc, …))` — so it is a zero-shuffle map over documents
  * whatever the merge count: the merge table rides along as a
  * broadcast array, and token ids come from the deterministic
  * (symbol-ascending) dense numbering of the final symbol set. */
object Bpe {

  /** U+001F as a SQL expression — the symbol-wrap separator. Tokens
    * containing it are excluded from training (a control char inside
    * a WORD is not text; the guard keeps the encoding injective). */
  private val SepSql = "chr(31)"
  private val Sep = 31.toChar.toString

  /** `tok -> wrapped symbol string` for a token-valued SQL expr. */
  private def wrapSql(tok: String): String =
    s"array_join(transform(sequence(1, char_length($tok)), _wi -> " +
      s"concat($SepSql, substr($tok, _wi, 1), $SepSql)), '')"

  private def mergeStepSql(acc: String, l: String, r: String): String =
    s"replace($acc, concat($SepSql, $l, $SepSql, $SepSql, $r, $SepSql), " +
      s"concat($SepSql, $l, $r, $SepSql))"

  /** Word-frequency table seeded with per-character symbol strings:
    * (tok, cnt, s). One corpus scan; `minCount` prunes the hapax tail
    * that would otherwise make iteration state corpus-sized. */
  def vocabulary(docs: DataFrame, minCount: Long = 1L,
                 text: String = "text"): DataFrame =
    docs.select(explode(split(col(text), " ")).as("tok"))
      .filter(length(col("tok")) >= 1 && !col("tok").contains(Sep))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("s", expr(wrapSql("tok")))

  /** Adjacent-pair counts over a vocab frame, weighted by word count:
    * (l, r, cnt). The pair explode is in-row (q145's list-transform
    * stance) and the aggregate's key space is bounded by the live
    * symbol alphabet squared — map-side combine collapses each
    * partition to that bound. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"),
        split(expr("substr(s, 2, char_length(s) - 2)"), Sep + Sep).as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(a) - 1), _pi -> " +
          "struct(element_at(a, _pi) as l, element_at(a, _pi + 1) as r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Train `numMerges` merges: each round takes the argmax pair
    * (count desc, pair asc — a total order, so the table is
    * deterministic cross-engine) and rewrites the vocab through a
    * broadcast of that 1-row frame. Returns (merge_rank, lhs, rhs,
    * cnt) ordered by rank; stops early if the vocab runs out of
    * pairs. O(numMerges) rounds of |vocab|-row jobs — corpus size
    * enters only through the one vocabulary scan. */
  def train(docs: DataFrame, numMerges: Int, minCount: Long = 1L,
            text: String = "text"): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    var vocab = vocabulary(docs, minCount, text).localCheckpoint()
    val bests = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(1)
        .select(lit(rank).as("merge_rank"), col("l").as("lhs"),
          col("r").as("rhs"), col("cnt"))
        .localCheckpoint() // eager: 1 row, materialized once per round
      if (best.isEmpty) exhausted = true
      else {
        bests += best
        vocab = vocab
          .crossJoin(broadcast(best.select(col("lhs"), col("rhs"))))
          .withColumn("s", expr(mergeStepSql("s", "lhs", "rhs")))
          .select("tok", "cnt", "s")
        // cut the replace-chain lineage periodically (analysis cost),
        // not every round (job count): the chain between checkpoints
        // is narrow per-row work over checkpointed 1-row leaves
        if (rank % 6 == 5) vocab = vocab.localCheckpoint()
        rank += 1
      }
    }
    if (bests.isEmpty)
      vocab.sparkSession.emptyDataFrame
        .withColumn("merge_rank", lit(0))
        .withColumn("lhs", lit("")).withColumn("rhs", lit(""))
        .withColumn("cnt", lit(0L)).limit(0)
    else bests.reduce(_ union _)
  }

  /** Single-process merge training over the (bounded) word-frequency
    * table — the deployment shape for REALISTIC merge counts: the
    * distributed [[train]] loop prices each merge at one Spark job
    * round (~150 ms scheduler floor measured at sf0.1 — `ScaleProbe
    * bpe`), so a 30k–50k-merge tokenizer would spend hours on pure
    * scheduling. Every production BPE trainer (Sennrich's subword-nmt
    * onward) therefore iterates on the word-frequency table in one
    * process; the DISTRIBUTED part of the job — the corpus scan that
    * builds that table — stays on the cluster ([[vocabulary]]), and
    * the collected state is bounded by `maxVocab` (enforced loudly),
    * never by corpus size. This is a DOCUMENTED bounded collect, not
    * a dataflow collect: the result re-enters Spark as the same
    * (merge_rank, lhs, rhs, cnt) frame [[train]] returns, derived by
    * the same argmax (count desc, pair asc) and greedy left-to-right
    * non-overlapping merge semantics — spec-pinned identical.
    * Per-round work is INCREMENTAL ([[incrementalMerges]] — the
    * classic pair index: only words containing the merged pair are
    * touched, with a lazy-deletion heap for the argmax), measured
    * ~130× the full-recount engine at 30k merges (`ScaleProbe
    * bpe-local`); the recount engine stays as the equivalence
    * reference ([[recountMerges]], spec-pinned identical). */
  def trainLocal(docs: DataFrame, numMerges: Int, minCount: Long = 1L,
                 text: String = "text", maxVocab: Int = 2000000): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    val rows = vocabulary(docs, minCount, text)
      .select(col("tok"), col("cnt")).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"trainLocal: vocabulary exceeds maxVocab=$maxVocab — raise minCount " +
        "(hapax pruning) or the cap, or use the distributed train()")
    // split by CODEPOINTS, not UTF-16 code units — Spark's substr
    // (the distributed seed split) counts codepoints, so a char-level
    // Java split would shear surrogate pairs and diverge on non-BMP
    // text
    def codepoints(s: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    val words = rows.map(r => (codepoints(r.getString(0)), r.getLong(1)))
    val merges = incrementalMerges(words, numMerges)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.map(m => org.apache.spark.sql.Row(m._1, m._2, m._3, m._4)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("merge_rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("lhs",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("rhs",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** UTF-8 BYTE-order comparison — Spark's string ordering, not
    * Java's UTF-16 compareTo (they disagree between BMP chars above
    * U+E000 and supplementary codepoints). The tiebreak of both local
    * engines. */
  private def utf8Less(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Greedy left-to-right NON-OVERLAPPING application of one merge to
    * one symbol array — the separator-wrapped replace() semantics: a
    * merged pair's output never re-pairs with the following symbol in
    * the same round. Returns the input array unchanged (same
    * reference) when the pair does not occur. */
  private def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var changed = false
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2; changed = true
      } else { out += syms(i); i += 1 }
    }
    if (changed) out.toArray else syms
  }

  /** REFERENCE engine: full pair recount + linear argmax per round —
    * O(merges · Σ|word symbols|), the shape the published algorithm
    * states (Sennrich et al., ACL 2016 §3.2's baseline). Kept as the
    * equivalence oracle for [[incrementalMerges]] (spec-pinned equal
    * merge tables); not on any production path. Operates on a private
    * copy of `words0`. */
  private[graft] def recountMerges(words0: Array[(Array[String], Long)],
                                   numMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = words0.map { case (s, c) => (s, c) } // rows replaced, arrays shared
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // argmax: count desc, then (l, r) asc — train()'s total order
        var best: ((String, String), Long) = null
        counts.foreach { case (k, c) =>
          if (best == null) best = (k, c)
          else {
            val ((bl, br), bc) = best
            if (c > bc || (c == bc && (utf8Less(k._1, bl) ||
              (k._1 == bl && utf8Less(k._2, br))))) best = (k, c)
          }
        }
        val ((l, r), c) = best
        merges += ((rank, l, r, c))
        var w = 0
        while (w < words.length) {
          val merged = applyMerge(words(w)._1, l, r)
          if (merged ne words(w)._1) words(w) = (merged, words(w)._2)
          w += 1
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** PRODUCTION engine: the classic incremental pair index. State is
    * (live pair counts, pair → word-index occurrence sets, a
    * lazy-deletion max-heap of (pair, count) snapshots ordered by the
    * same total order as the recount argmax — count desc, pair asc in
    * UTF-8 byte order). Per round only the words CONTAINING the merged
    * pair are touched: each subtracts all its current pair counts,
    * applies the merge, and re-adds — which makes the live counts
    * equal BY CONSTRUCTION to what a full recount would produce, so
    * the two engines cannot diverge on any input (spec-pinned on
    * adversarial tie/overlap vocabularies and on the fixture).
    * Heap entries are validated against the live count on pop and
    * discarded when stale; every count change pushes a fresh snapshot.
    * Cost per round is O(Σ|affected word symbols| · log pairs) instead
    * of O(Σ|ALL word symbols|) — measured 131× at 30k merges on a 60k
    * word vocabulary: 535.6 s recount → 4.1 s (`ScaleProbe bpe-local`,
    * ARCHITECTURE.md §headroom). */
  private[graft] def incrementalMerges(words0: Array[(Array[String], Long)],
                                       numMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = words0.map { case (s, c) => (s, c) } // rows replaced, arrays shared
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occ = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    // max-heap: count desc, then pair ASC (a smaller pair is "greater")
    val ord = new Ordering[((String, String), Long)] {
      def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(x._2, y._2)
        if (c != 0) c
        else if (x._1._1 != y._1._1) { if (utf8Less(y._1._1, x._1._1)) -1 else 1 }
        else if (x._1._2 == y._1._2) 0
        else { if (utf8Less(y._1._2, x._1._2)) -1 else 1 }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty(ord)
    def add(p: (String, String), cnt: Long, w: Int): Unit = {
      val nc = counts.getOrElse(p, 0L) + cnt
      counts(p) = nc
      heap.enqueue((p, nc))
      occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += w
    }
    def sub(p: (String, String), cnt: Long, w: Int): Unit = {
      val nc = counts(p) - cnt
      if (nc == 0L) counts.remove(p)
      else { counts(p) = nc; heap.enqueue((p, nc)) }
      occ(p) -= w
    }
    for (w <- words.indices) {
      val (syms, cnt) = words(w)
      var i = 0
      while (i + 1 < syms.length) {
        add((syms(i), syms(i + 1)), cnt, w)
        i += 1
      }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // pop until a snapshot matches its live count (stale entries are
      // superseded — every change pushed a fresher one)
      var top: ((String, String), Long) = null
      while (top == null && heap.nonEmpty) {
        val cand = heap.dequeue()
        if (counts.getOrElse(cand._1, 0L) == cand._2) top = cand
      }
      if (top == null) exhausted = true
      else {
        val ((l, r), c) = top
        merges += ((rank, l, r, c))
        // the snapshot ordering guarantees this is the argmax; only
        // words currently containing (l, r) can change
        val affected = occ.getOrElse((l, r), scala.collection.mutable.Set.empty)
          .toArray
        affected.foreach { w =>
          val (syms, cnt) = words(w)
          var i = 0
          while (i + 1 < syms.length) { sub((syms(i), syms(i + 1)), cnt, w); i += 1 }
          val merged = applyMerge(syms, l, r)
          words(w) = (merged, cnt)
          i = 0
          while (i + 1 < merged.length) { add((merged(i), merged(i + 1)), cnt, w); i += 1 }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Documents + merge table → per-doc encoded token stats and the
    * encoded symbol stream: (…docs cols…, n_tokens_ws, n_tokens_bpe,
    * bpe_syms array<string>). The whole merge table is applied in one
    * in-row fold per token occurrence — zero shuffles over the
    * corpus; the merge table is a broadcast array ordered by rank. */
  def encode(docs: DataFrame, merges: DataFrame,
             text: String = "text"): DataFrame = {
    val marr = merges.agg(
      expr("array_sort(collect_list(struct(merge_rank, lhs, rhs)))")
        .as("marr"))
    docs
      .crossJoin(broadcast(marr))
      .withColumn("_toks",
        expr(s"filter(split($text, ' '), _t -> char_length(_t) >= 1 " +
          s"and instr(_t, $SepSql) = 0)"))
      .withColumn("_enc", expr(
        "transform(_toks, _t -> aggregate(marr, " + wrapSql("_t") +
          ", (_acc, _m) -> " + mergeStepSql("_acc", "_m.lhs", "_m.rhs") + "))"))
      .withColumn("bpe_syms", expr(
        "flatten(transform(_enc, _e -> " +
          "split(substr(_e, 2, char_length(_e) - 2), " +
          s"concat($SepSql, $SepSql))))"))
      .withColumn("n_tokens_ws", size(col("_toks")).cast("long"))
      .withColumn("n_tokens_bpe", size(col("bpe_syms")).cast("long"))
      .drop("marr", "_toks", "_enc")
  }

  /** Encode a DISTINCT-token dictionary: (tok, syms array<string>) —
    * the fold runs once per vocabulary entry instead of once per
    * token occurrence, which is how a tokenizer actually deploys
    * (the merge fold is O(|vocab|·numMerges); documents then consume
    * the dictionary by broadcast hash join, an O(1) probe per token —
    * and the gap over the per-occurrence [[encode]] fold grows with
    * the corpus/vocab ratio; see [[encodeStats]] for the measured
    * q170 numbers). */
  def encodeVocab(tokens: DataFrame, merges: DataFrame): DataFrame = {
    val marr = merges.agg(
      expr("array_sort(collect_list(struct(merge_rank, lhs, rhs)))")
        .as("marr"))
    tokens.select("tok").distinct()
      .filter(length(col("tok")) >= 1 && !col("tok").contains(Sep))
      .crossJoin(broadcast(marr))
      .withColumn("_e", expr(
        "aggregate(marr, " + wrapSql("tok") +
          ", (_acc, _m) -> " + mergeStepSql("_acc", "_m.lhs", "_m.rhs") + ")"))
      .select(col("tok"), expr(
        "split(substr(_e, 2, char_length(_e) - 2), " +
          s"concat($SepSql, $SepSql))").as("syms"))
  }

  /** Deploy-shape per-doc encode stats — [[encodeVocab]]'s dictionary
    * fold + two broadcast joins, producing exactly q170's output
    * columns: (idCol, n_tokens_ws, n_tokens_bpe, id_sum), with
    * token-free docs kept at 0 (left join from the docs frame).
    *
    * This is the path a tokenizer runs in production: the 16-merge
    * fold executes once per DISTINCT token (|vocab| rows), symbol ids
    * come from the dictionary's own symbol set (the same set
    * [[symbolIds]] derives from the encoded corpus, because the
    * dictionary is built from the corpus' distinct tokens), and each
    * token OCCURRENCE costs one broadcast-map probe of the per-token
    * (n_syms, id_sum) stats — so corpus size buys scan + one partial
    * aggregate, never fold work. Scale dial: the broadcast is
    * |vocab|-sized; [[vocabulary]]'s `minCount` is what bounds |vocab|
    * on a real crawl (the [[train]] scaladoc's hapax argument). OOV
    * tokens (possible when the dictionary was trained elsewhere or
    * minCount pruned) fall back to the per-occurrence [[encode]] fold —
    * here the inner join simply has no OOV because the dictionary is
    * derived from the same docs frame.
    *
    * Measured at sf0.1 (32 cores, merges memoized by q169 running
    * first — the shipped bench configuration): per-occurrence
    * [[encode]] fold 34.6 s (BENCH_r11 q170) → this path 0.5 s — the
    * fold work drops from every token occurrence to the corpus'
    * distinct tokens. */
  def encodeStats(docs: DataFrame, merges: DataFrame,
                  text: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol), explode(split(col(text), " ")).as("tok"))
      .filter(length(col("tok")) >= 1 && !col("tok").contains(Sep))
    val dict = encodeVocab(toks, merges)
    // the same deterministic symbol-ascending dense numbering as
    // symbolIds — over the dictionary (alphabet+merges bounded), so
    // the window's single-partition frame is aggregate-bounded
    val ids = dict.select(explode(col("syms")).as("sym")).distinct()
      .withColumn("sym_id",
        (row_number().over(Window.orderBy(col("sym").asc)) - 1).cast("long"))
    val idMap = ids.agg(map_from_arrays(
      collect_list(col("sym")), collect_list(col("sym_id"))).as("_dict"))
    val tokStats = dict
      .crossJoin(broadcast(idMap))
      .select(col("tok"),
        size(col("syms")).cast("long").as("_n_syms"),
        expr("aggregate(syms, 0L, (_a, _s) -> _a + _dict[_s])").as("_tok_id_sum"))
    val perDoc = toks
      .join(broadcast(tokStats), Seq("tok"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens_ws"),
        sum(col("_n_syms")).as("n_tokens_bpe"),
        sum(col("_tok_id_sum")).as("id_sum"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens_ws", "n_tokens_bpe", "id_sum"))
  }

  /** Deterministic id table for an encoded corpus: every distinct
    * final symbol, densely numbered in symbol-ascending order —
    * (sym, sym_id). The symbol set is bounded by |alphabet| +
    * numMerges, so the numbering window runs over an
    * aggregate-bounded frame. */
  def symbolIds(encoded: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    encoded
      .select(explode(col("bpe_syms")).as("sym"))
      .groupBy("sym").agg(count(lit(1)).as("n_uses"))
      .withColumn("sym_id",
        (row_number().over(Window.orderBy(col("sym").asc)) - 1).cast("long"))
  }

  /** Encoded docs → (…, bpe_ids array<bigint>): the token-id stream a
    * packing/budgeting stage (q38/q71) consumes. Broadcast dictionary
    * join per symbol — the id table is alphabet+merges sized. */
  def encodeIds(encoded: DataFrame, ids: DataFrame): DataFrame = {
    val dict = ids.agg(map_from_arrays(
      collect_list(col("sym")), collect_list(col("sym_id"))).as("_dict"))
    encoded
      .crossJoin(broadcast(dict))
      .withColumn("bpe_ids",
        expr("transform(bpe_syms, _s -> _dict[_s])"))
      .drop("_dict")
  }
}
