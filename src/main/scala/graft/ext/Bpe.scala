package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Byte-pair-encoding tokenizer induction and application — the vocab-
  * building step of every modern LLM data pipeline (Sennrich et al.
  * 2016, arXiv:1508.07909; the GPT-2/RoBERTa tokenizer family). Two
  * operators:
  *
  *  - `train`: learn a merge table from a corpus. The distributed
  *    shape follows the original algorithm's observation that BPE
  *    statistics live on the WORD-FREQUENCY table, not the corpus: one
  *    corpus-sized aggregation builds (word, freq), and every merge
  *    round after that is a pair-count aggregation + rewrite over the
  *    Heaps-law-bounded vocabulary (≈10⁷ rows for a 100 TB English
  *    corpus — thousands of times smaller than the corpus itself).
  *    Each round ships exactly ONE row (the argmax pair) to the
  *    driver; the vocab table never leaves the cluster. Rounds are
  *    persisted and lineage-cut every `checkpointEvery` merges (the
  *    connectedComponents doctrine — without it round r's plan nests r
  *    UDF applications deep).
  *
  *  - `tokenCounts`: apply a learned merge table (rank-priority,
  *    lowest-rank pair first — the exact GPT-2 `bpe()` loop) to a
  *    corpus and report per-document subword counts. The merge table
  *    broadcasts (a vocab of merges is KBs); application is a narrow
  *    map — zero shuffles beyond the final per-doc agg.
  *
  * No SQL-expressible oracle exists for either: training is a
  * sequential chain of data-dependent argmax decisions (each merge
  * changes the pair statistics the next round aggregates — a recursive
  * CTE cannot re-aggregate per level), and application replays that
  * chain per word. Both are therefore rows-only driver checks, with
  * the classic-literature golden cases (the {low, lower, newest,
  * widest} corpus of the BPE paper) and determinism/fixpoint contracts
  * pinned in BpeSpec — and every count they emit is an exact integer,
  * so the golden cases pin bit-exact output.
  *
  * Word pre-tokenization: whitespace split + the `</w>` end-of-word
  * terminal symbol of the original paper, so merges can learn word-
  * final units ("est</w>") distinct from word-internal ones ("est").
  */
object Bpe {

  /** Rewrite one word's symbol sequence, merging every non-overlapping
    * adjacent (a, b) left-to-right — the single-merge-round kernel. */
  private[graft] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private val mergeOnceUdf = udf { (syms: Seq[String], a: String, b: String) =>
    mergeOnce(syms, a, b)
  }

  /** GPT-2-style application: repeatedly merge the present pair with
    * the LOWEST rank until no ranked pair remains. Returns the subword
    * count (the statistic q140 reports; the tokens themselves are an
    * intermediate). */
  private[graft] def applyMerges(syms: Seq[String],
      ranks: Map[(String, String), Int]): Seq[String] = {
    var cur = syms
    var done = false
    while (!done && cur.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < cur.length - 1) {
        val r = ranks.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else cur = mergeOnce(cur, cur(bi), cur(bi + 1))
    }
    cur
  }

  /** Split a word into BPE start symbols: chars + `</w>` terminal.
    * (Spark's split(_, "") keeps a trailing empty element — Java split
    * with limit −1 — so empties are filtered; the Scala-side kernel's
    * String.split("") drops them already.) */
  private def toSymbols(word: org.apache.spark.sql.Column) =
    concat(filter(split(word, ""), x => length(x) > 0), array(lit("</w>")))

  /** Unsigned UTF-8 byte comparison — EXACTLY Spark's string ordering
    * (UTF8String.binaryCompare). The local merge loop's tie-break must
    * reproduce the distributed `orderBy(cnt DESC, a, b)` bit-for-bit,
    * and Java String.compareTo orders by UTF-16 code unit, which
    * diverges from UTF-8 byte order for supplementary code points. */
  private[graft] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** LOCAL merge loop over a collected word-frequency table — the r19
    * fast path of [[trainWithVocab]]. BPE's decision state is the
    * Heaps-law-bounded vocabulary, not the corpus (the original
    * algorithm of Sennrich et al. 2016 trains entirely in memory from
    * word counts; the corpus-sized work is ONLY the word-frequency
    * aggregation, which stays distributed). Running the 40 sequential
    * argmax rounds on the driver removes 40 driver⇄cluster job round
    * trips that dominated wall-clock at every fixture scale (the
    * distributed loop is declared driver-round-bound in its own
    * scaladoc). Pair statistics update by DELTA: a merge of (a, b)
    * only changes the pair counts of words containing (a, b)
    * adjacently, so each round rescans the vocab for adjacency (cheap
    * string equality) but re-counts only affected words.
    *
    * Bit-identical contract with the distributed loop, proven by
    * BpeSpec's equivalence golden: counts are exact Longs summed in
    * any order; argmax tie-break is (count DESC, left, right) with
    * [[utf8Compare]] = Spark's string order; the rewrite is the same
    * [[mergeOnce]] kernel; minCount exhaustion matches. */
  private[graft] def trainLocalLoop(
      vocab0: Array[(Array[String], Long)], nMerges: Int, minCount: Long):
      (Seq[(Int, String, String, String, Long)], Array[(Array[String], Long)]) = {
    import scala.collection.mutable
    var cur = vocab0
    val counts = mutable.HashMap.empty[(String, String), Long]
    def addWord(syms: Array[String], f: Long, sign: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val c = counts.getOrElse(k, 0L) + sign * f
        if (c == 0L) counts.remove(k) else counts.update(k, c)
        i += 1
      }
    }
    cur.foreach { case (s, f) => addWord(s, f, 1L) }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      var ba: String = null; var bb: String = null; var bc = Long.MinValue
      counts.foreach { case ((a, b), c) =>
        if (c > bc || (c == bc && {
          val ca = utf8Compare(a, ba)
          ca < 0 || (ca == 0 && utf8Compare(b, bb) < 0)
        })) { ba = a; bb = b; bc = c }
      }
      if (ba == null || bc < minCount) exhausted = true
      else {
        merges += ((rank, ba, bb, ba + bb, bc))
        cur = cur.map { case (syms, f) =>
          // delta update: only words with an adjacent (ba, bb) change
          var hit = false
          var i = 0
          while (!hit && i < syms.length - 1) {
            if (syms(i) == ba && syms(i + 1) == bb) hit = true
            i += 1
          }
          if (!hit) (syms, f)
          else {
            addWord(syms, f, -1L)
            val next = mergeOnce(syms.toSeq, ba, bb).toArray
            addWord(next, f, 1L)
            (next, f)
          }
        }
        rank += 1
      }
    }
    (merges.toSeq, cur)
  }

  /** Vocabulary-row cap under which [[trainWithVocab]] collects the
    * word-frequency table and runs the merge loop on the driver. A
    * 1 M-row vocab is ~tens of MB — the documented bounded-collect
    * class (the LM model build, the PQ sample); past the cap the
    * distributed loop runs unchanged (the 100 TB posture: Heaps-law
    * vocabularies ≈ 10⁷ rows stay on the cluster unless the operator
    * is explicitly told the driver can hold them). */
  private[graft] def localVocabCap: Long =
    sys.props.get("graft.bpe.localCap")
      .orElse(sys.env.get("SPARK_GRAFT_BPE_LOCAL_CAP"))
      .map(_.toLong).getOrElse(1000000L)

  /** Train `nMerges` BPE merges over `textCol`. Returns the merge
    * table: (rank, left, right, merged, pair_count), rank 1 = first
    * merge learned. Stops early when no pair reaches `minCount`.
    * Tie-break: count DESC, then (left, right) lexicographic — fully
    * deterministic for a fixed corpus. */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
      textCol: String = "text", checkpointEvery: Int = 8): DataFrame = {
    val (merges, vocab, _) = trainWithVocab(docs, nMerges, minCount,
      textCol, checkpointEvery)
    vocab.unpersist()
    merges
  }

  /** [[train]] plus the FINAL rewritten vocabulary (syms, freq) — left
    * persisted for the caller to consume and unpersist. q281 needs it
    * for the symbol-conservation invariant (every merge operation
    * removes exactly one symbol from the weighted vocab, so
    * S_final = S0 − merges_performed); the public `train` discards
    * it. Same loop, one source of truth. Third element (r19): the
    * INITIAL weighted symbol count Σ freq·|syms₀| when the local path
    * already holds the vocab in memory (free there; None on the
    * distributed path, where the caller recomputes it — q281's
    * corpus-scan fallback). */
  private[graft] def trainWithVocab(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L, textCol: String = "text",
      checkpointEvery: Int = 8): (DataFrame, DataFrame, Option[Long]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(toSymbols(col("word")).as("syms"), col("freq"))
      .persist()
    val nVocab = vocab.count()
    // r19 fast path: the merge rounds are a SEQUENTIAL chain of argmax
    // decisions over the vocabulary — when that bounded frame fits the
    // driver (localVocabCap), 40 cluster round-trips buy nothing. One
    // collect, the identical loop locally, results bit-equal by
    // BpeSpec's equivalence golden. The corpus-sized word count above
    // stays distributed either way.
    if (nVocab <= localVocabCap) {
      val rows = vocab.collect().map(r =>
        (r.getSeq[String](0).toArray, r.getLong(1)))
      vocab.unpersist()
      val (merges, finalVocab) = trainLocalLoop(rows, nMerges, minCount)
      val mergesDf = merges.toDF("rank", "left", "right", "merged", "pair_count")
        .select(col("rank").cast("long").as("rank"), col("left"),
          col("right"), col("merged"), col("pair_count"))
      val vocabDf = finalVocab.toSeq.map { case (s, f) => (s.toSeq, f) }
        .toDF("syms", "freq").persist()
      val s0 = rows.foldLeft(0L) { case (a, (s, f)) => a + f * s.length }
      return (mergesDf, vocabDf, Some(s0))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = vocab
        .select(posexplode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as(Seq("p", "pair")),
          col("freq"))
        .groupBy(col("pair.a").as("a"), col("pair.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getAs[Long]("cnt") < minCount) exhausted = true
      else {
        val (a, b, cnt) = (best.head.getAs[String]("a"),
          best.head.getAs[String]("b"), best.head.getAs[Long]("cnt"))
        merges += ((rank, a, b, a + b, cnt))
        val next = vocab.withColumn("syms",
          mergeOnceUdf(col("syms"), lit(a), lit(b)))
        // lineage-cut eagerly every `checkpointEvery` rounds; between
        // cuts, plain persist WITHOUT a materializing count — the next
        // round's argmax action materializes it, and a cache miss
        // re-applies at most `checkpointEvery` cheap vocab-sized UDF
        // maps above the last checkpoint. Halves the per-round job
        // count (measured: the 40-merge train is driver-round-bound,
        // not compute-bound).
        val cached =
          if (rank % checkpointEvery == 0) next.localCheckpoint(true)
          else next.persist()
        vocab.unpersist()
        vocab = cached
        rank += 1
      }
    }
    (merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("merged"), col("pair_count")),
      vocab, None)
  }

  /** Apply a merge table to a corpus: per-doc word count, subword
    * count, and chars-per-subword compression (one IEEE divide of
    * exact integers, round(6)). `mergeTable` must carry (rank, left,
    * right); it is collected and broadcast — merges are KBs. */
  def tokenCounts(docs: DataFrame, mergeTable: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val ranks = mergeTable.select("left", "right", "rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")) ->
        r.getAs[Long]("rank").toInt).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val countUdf = udf { (word: String) =>
      applyMerges(word.split("").toSeq :+ "</w>", bc.value).length
    }
    // r19: the merge replay is O(len²·merges) per WORD VALUE, so run it
    // once per DISTINCT word (the Heaps-bounded dimension — the same
    // frame BPE trains on) and join the per-word subword count back to
    // the occurrence stream, instead of replaying per OCCURRENCE. The
    // distinct+join shuffle a vocabulary-sized frame; identical values
    // per occurrence, so per-doc sums are unchanged.
    val words = docs.select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val wordSubs = words.select("word").distinct()
      .withColumn("n_sub", countUdf(col("word")))
    words.join(wordSubs, Seq("word"))
      .withColumn("n_chars", length(col("word")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").as("n_subwords"),
        sum("n_chars").as("n_word_chars"))
      .withColumn("chars_per_subword",
        round(col("n_word_chars").cast("double") / col("n_subwords"), 6))
  }

  /** Q139 — BPE training over the documents corpus: 40 merges,
    * minCount 2 (rows-only driver check; golden contracts in BpeSpec). */
  def q139(s: SparkSession, d: String): DataFrame =
    train(Tables.documents(s, d), nMerges = 40).orderBy("rank")

  /** Q140 — subword statistics of the corpus under its own q139
    * tokenizer (rows-only driver check; golden contracts in BpeSpec). */
  def q140(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    tokenCounts(docs, train(docs, nMerges = 40)).orderBy("doc_id")
  }

  /** Q276 — BPE application's CONSERVATION CONTRACT under the ORACLE
    * gate (r17 derived-invariant tier): the merge sequence and the
    * subword counts stay rows-only (sequential argmax chain), but two
    * projections are strictly checkable per doc: the exact word/char
    * totals (DuckDB recomputes both), plus the booleans `bounds_ok`
    * (each word tokenizes to between 1 and chars+1 subwords, so
    * n_words ≤ n_subwords ≤ n_word_chars + n_words) and `reconstructs`
    * (the concatenated subwords of EVERY word equal word + "</w>" —
    * the character stream survives any merge table byte-for-byte). A
    * merge application that drops, duplicates, or reorders symbols now
    * fails the HASH gate, not just BpeSpec's goldens. */
  def q276(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ranks = train(docs, nMerges = 40).select("left", "right", "rank")
      .collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")) ->
        r.getAs[Long]("rank").toInt).toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val statUdf = udf { (word: String) =>
      val subs = applyMerges(word.split("").toSeq :+ "</w>", bc.value)
      (subs.length.toLong,
        if (subs.mkString("") == word + "</w>") 1L else 0L)
    }
    // r19: replay per DISTINCT word, join back (tokenCounts' rationale —
    // per-word values identical, per-doc aggregates unchanged).
    val words = docs.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val wordStats = words.select("word").distinct()
      .withColumn("st", statUdf(col("word")))
    words.join(wordStats, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_word_chars"),
        sum(col("st._1")).as("n_subwords"),
        min(col("st._2")).as("rec_min"))
      .select(col("doc_id"), col("n_words"), col("n_word_chars"),
        (col("n_words") <= col("n_subwords") &&
          col("n_subwords") <= col("n_word_chars") + col("n_words"))
          .as("bounds_ok"),
        (col("rec_min") === 1L).as("reconstructs"))
      .orderBy("doc_id")
  }

  /** Q281 — BPE TRAINING's projections under the ORACLE gate (r18;
    * closes the q139 row of the derived-invariant tier). The merge
    * SEQUENCE stays rows-only (a chain of data-dependent argmax
    * decisions no recursive CTE can replay), but four projections are
    * strict arithmetic:
    *  - round 1 is FULLY replayable: before any merge the symbols are
    *    chars + `</w>`, so DuckDB recomputes the exact argmax pair
    *    (`first_left`/`first_right`/`first_count`) with the same
    *    count-DESC, (left, right)-lexicographic tie-break;
    *  - `s0_symbols` = Σ freq·(len(word)+1), the initial weighted
    *    symbol count — exact on both engines;
    *  - `n_merges` — the fixture corpus sustains the full 40 rounds at
    *    every SF (minCount 2 never exhausts);
    *  - `closure_ok`: every merge's left/right is a base symbol (one
    *    char or `</w>`) or the product of an EARLIER merge — the
    *    merge table is self-contained, rank order is causal;
    *  - `conservation_ok`: each merge OPERATION removes exactly one
    *    symbol, and a round counting c adjacent occurrences performs
    *    between ⌈c/2⌉ (fully overlapping run) and c (disjoint) merges,
    *    so Σcnt/2 ≤ S0 − S_final ≤ Σcnt on the final vocabulary —
    *    a rewrite that drops or duplicates symbols flips it.
    * One summary row; the 40-row merge table is KBs (driver-side
    * closure check is bounded by construction). Heavy class: re-runs
    * the q139 training loop, like q276 — isolated-bench discipline. */
  def q281(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (mergeDf, finalVocab, s0Opt) = trainWithVocab(docs, nMerges = 40)
    val merges = mergeDf.collect().map(r => (r.getAs[Long]("rank"),
      r.getAs[String]("left"), r.getAs[String]("right"),
      r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    require(merges.nonEmpty,
      "q281: zero merges learned — empty corpus or minCount exhausted at round 1")
    val sFinal = finalVocab
      .agg(sum(col("freq") * size(col("syms"))).cast("long")).head.getLong(0)
    finalVocab.unpersist()
    // S0 = Σ_occurrences (len(word)+1) = Σ_vocab freq·|syms₀| — the
    // local train path hands it over for free; the distributed path
    // recomputes it with the original corpus scan.
    val s0 = s0Opt.getOrElse(docs
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .agg(sum(length(col("word")) + lit(1)).cast("long")).head.getLong(0))
    var built = Set.empty[String]
    val closureOk = merges.forall { case (_, l, r, m, _) =>
      val ok = Seq(l, r).forall(x =>
        x.length == 1 || x == "</w>" || built.contains(x))
      built += m; ok
    } && merges.map(_._1).toSeq == (1L to merges.length).toSeq
    val sumCnt = merges.map(_._5).sum
    val removed = s0 - sFinal
    val conservationOk = removed * 2L >= sumCnt && removed <= sumCnt
    val (fl, fr, fc) = (merges.head._2, merges.head._3, merges.head._5)
    val sess = s
    import sess.implicits._
    Seq((merges.length.toLong, fl, fr, fc, s0, closureOk, conservationOk))
      .toDF("n_merges", "first_left", "first_right", "first_count",
        "s0_symbols", "closure_ok", "conservation_ok")
  }
}
